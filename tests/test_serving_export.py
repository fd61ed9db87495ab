"""Serving-artifact export/load (``models/serving.py``).

Covers: self-contained round-trip (weights baked, no model code at load),
batch-polymorphic export, the versioned artifact header, error contracts,
and sharded export re-bound onto a fresh mesh — the deployment-side
counterpart of the checkpoint restore-on-resize tests."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accvlab_tpu.models.centernet import CenterNetDetector
from accvlab_tpu.models.serving import (
    LoadedInference,
    export_inference,
    freeze_params,
    load_inference,
    read_artifact_info,
    save_inference,
)


@pytest.fixture(scope="module")
def small_model():
    model = CenterNetDetector(num_classes=4, width=8)
    images = np.zeros((2, 32, 32, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), images)
    return model, params


def _images(batch, seed=1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, 32, 32, 3)).astype(np.float32)


def test_roundtrip_matches_apply(tmp_path, small_model):
    model, params = small_model
    path = str(tmp_path / "centernet.accvserve")
    info = save_inference(path, model.apply, params, _images(2))
    assert os.path.exists(path)
    assert not any(".tmp." in f for f in os.listdir(tmp_path))

    serve = load_inference(path)
    x = _images(2, seed=3)
    got = serve(x)
    want = model.apply(params, x)
    assert set(got.keys()) == set(want.keys())
    for k in want:
        # the backbone computes in bfloat16: export-time lowering and a
        # fresh trace may fuse differently, both legal bf16 results
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=2e-2, atol=2e-2
        )
    assert info["accvlab_tpu_version"]
    assert serve.info["fn_name"]


def test_artifact_is_self_contained_no_model_code(tmp_path, small_model):
    """A fresh interpreter that never imports flax or the model class can
    serve the artifact — the deployment contract."""
    model, params = small_model
    path = str(tmp_path / "art.accvserve")
    save_inference(path, model.apply, params, _images(2))
    x = _images(2, seed=9)
    xpath = str(tmp_path / "x.npy")
    np.save(xpath, x)
    code = (
        "import sys; sys.modules['flax'] = None\n"  # importing flax now fails
        "import numpy as np\n"
        "from accvlab_tpu.models.serving import load_inference\n"
        f"serve = load_inference({path!r})\n"
        f"out = serve(np.load({xpath!r}))\n"
        "print('heatmap', np.asarray(out['heatmap']).shape)\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "heatmap (2, 8, 8, 4)" in r.stdout


def test_batch_polymorphic_serves_any_batch(small_model):
    model, params = small_model
    art = export_inference(
        freeze_params(model.apply, params), (_images(2),), batch_polymorphic=True
    )
    info = read_artifact_info(art)
    assert info["batch_polymorphic"] is True
    assert any("b," in a or "b}" in a or "b" in a for a in info["in_avals"])
    serve = load_inference(art)
    for batch in (1, 2, 5):
        out = serve(_images(batch, seed=batch))
        assert np.asarray(out["heatmap"]).shape == (batch, 8, 8, 4)
    # numerics match the direct apply at an unseen batch size (bf16 tol)
    x = _images(3, seed=42)
    np.testing.assert_allclose(
        np.asarray(serve(x)["heatmap"]),
        np.asarray(model.apply(params, x)["heatmap"]),
        rtol=2e-2,
        atol=2e-2,
    )


def test_float32_fn_roundtrips_exactly(tmp_path):
    """A pure-f32 function round-trips bit-exactly (no bf16 in play)."""
    def fn(w, x):
        return {"y": jnp.tanh(x @ w)}

    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    x = rng.standard_normal((4, 16)).astype(np.float32)
    path = str(tmp_path / "f32.accvserve")
    save_inference(path, lambda p, a: fn(p, a), w, x)
    serve = load_inference(path)
    np.testing.assert_array_equal(
        np.asarray(serve(x)["y"]), np.asarray(jax.jit(fn)(w, x)["y"])
    )


def test_multi_platform_artifact(small_model):
    """One artifact lowered for BOTH tpu and cpu serves on whichever backend
    the serving host has — export does not need a TPU attached (XLA
    cross-platform lowering)."""
    model, params = small_model
    art = export_inference(
        freeze_params(model.apply, params), (_images(2),), platforms=("tpu", "cpu")
    )
    info = read_artifact_info(art)
    assert info["platforms"] == ["tpu", "cpu"]
    out = load_inference(art)(_images(2))
    assert np.asarray(out["heatmap"]).shape == (2, 8, 8, 4)


def test_batch_polymorphic_rejects_scalar_leaves(small_model):
    model, params = small_model
    with pytest.raises(ValueError, match="leading batch dimension"):
        export_inference(
            freeze_params(model.apply, params),
            (np.float32(1.0),),
            batch_polymorphic=True,
        )


def test_header_audit_and_error_contracts(tmp_path, small_model):
    model, params = small_model
    art = export_inference(freeze_params(model.apply, params), (_images(2),))
    info = read_artifact_info(art)
    assert info["format_version"] == 1
    assert info["nr_devices"] == 1
    assert info["platforms"]
    assert len(info["in_avals"]) == 1 and len(info["out_avals"]) == 3

    with pytest.raises(ValueError, match="bad magic"):
        read_artifact_info(b"ORBAX-CHECKPOINT" + art)
    with pytest.raises(ValueError, match="truncated"):
        read_artifact_info(art[: len(art) - 8])
    # cut inside the 8 length bytes right after the magic: still the
    # documented ValueError, not a raw struct.error
    with pytest.raises(ValueError, match="truncated"):
        read_artifact_info(art[:18])

    import json as _json
    import struct as _struct

    from accvlab_tpu.models import serving as S

    hj = _json.dumps({"format_version": 99}).encode()
    newer = S._MAGIC + _struct.pack("<II", len(hj), 0) + hj
    with pytest.raises(ValueError, match="newer"):
        read_artifact_info(newer)


def test_mesh_and_shardings_must_pair(small_model):
    model, params = small_model
    with pytest.raises(ValueError, match="together"):
        export_inference(
            freeze_params(model.apply, params), (_images(2),), in_shardings="x"
        )


def test_sharded_export_rebinds_to_fresh_mesh(small_model):
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    model, params = small_model

    mesh = Mesh(mesh_utils.create_device_mesh((8,)), axis_names=("data",))
    sharding = NamedSharding(mesh, P("data"))
    art = export_inference(
        freeze_params(model.apply, params),
        (_images(8),),
        mesh=mesh,
        in_shardings=(sharding,),
    )
    info = read_artifact_info(art)
    assert info["nr_devices"] == 8

    # loading without a mesh is an explicit error
    with pytest.raises(ValueError, match="pass mesh="):
        load_inference(art)

    # a wrong-SIZE mesh fails fast with a clear error, not at call time
    mesh4 = Mesh(
        mesh_utils.create_device_mesh((4,), devices=jax.devices()[:4]),
        axis_names=("data",),
    )
    with pytest.raises(ValueError, match="same-size mesh"):
        load_inference(art, mesh=mesh4)

    # a FRESH mesh over a different device permutation serves the artifact
    mesh2 = Mesh(
        mesh_utils.create_device_mesh((8,), devices=jax.devices()[::-1]),
        axis_names=("data",),
    )
    imgs = _images(8, seed=5)
    got2 = np.asarray(
        load_inference(art, mesh=mesh2)(
            jax.device_put(imgs, NamedSharding(mesh2, P("data")))
        )["heatmap"]
    )
    got1 = np.asarray(
        load_inference(art, mesh=mesh)(jax.device_put(imgs, sharding))["heatmap"]
    )
    # mesh re-binding is exact: the same program on a permuted device set
    np.testing.assert_array_equal(got2, got1)
    # vs the unsharded apply only bf16-close (per-shard conv shapes compile
    # to different bf16 roundings than the full batch)
    want = np.asarray(model.apply(params, imgs)["heatmap"])
    np.testing.assert_allclose(got2, want, rtol=5e-2, atol=5e-2)


def test_polymorphic_sharded_combination_rejected(small_model):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    model, params = small_model
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("data",))
    with pytest.raises(ValueError, match="batch_polymorphic sharded"):
        export_inference(
            freeze_params(model.apply, params),
            (_images(2),),
            batch_polymorphic=True,
            mesh=mesh,
            in_shardings=(NamedSharding(mesh, P("data")),),
        )


def test_export_fuzz_random_trees(tmp_path):
    """Property fuzz: random nested input/output pytrees, mixed dtypes —
    export/load must preserve structure and be exact for f32/int paths."""
    rng = np.random.default_rng(0)
    for case in range(6):
        in_shapes = [
            tuple(int(d) for d in rng.integers(1, 7, size=rng.integers(1, 4)))
            for _ in range(int(rng.integers(1, 4)))
        ]
        w = rng.standard_normal((5, 3)).astype(np.float32)

        def fn(*args):
            outs = {}
            for i, a in enumerate(args):
                x = jnp.asarray(a, jnp.float32).reshape(-1)
                pad = (-x.size) % 5
                x = jnp.pad(x, (0, pad)).reshape(-1, 5)
                outs[f"o{i}"] = {"y": jnp.tanh(x @ w), "n": jnp.int32(x.shape[0])}
            return outs, tuple(jnp.sum(jnp.asarray(a)) for a in args)

        args = tuple(
            rng.standard_normal(s).astype(np.float32)
            if i % 2 == 0
            else rng.integers(-9, 9, s).astype(np.int32)
            for i, s in enumerate(in_shapes)
        )
        art = export_inference(jax.jit(fn), args)
        serve = load_inference(art)
        got = serve(*args)
        want = jax.jit(fn)(*args)
        gl, gt = jax.tree_util.tree_flatten(got)
        wl, wt = jax.tree_util.tree_flatten(want)
        assert gt == wt, f"case {case}: tree structure changed"
        for g, wv in zip(gl, wl):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))
