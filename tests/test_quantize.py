"""Weight-only int8 quantization (``models/quantize.py``) and its
composition with serving export."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accvlab_tpu.models.centernet import CenterNetDetector
from accvlab_tpu.models.quantize import (
    QuantizedTensor,
    dequantize_params,
    freeze_params_quantized,
    params_nbytes,
    quantize_params,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = CenterNetDetector(num_classes=4, width=16)
    x = np.zeros((2, 32, 32, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def _images(batch, seed=1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, 32, 32, 3)).astype(np.float32)


def test_structure_and_selection(model_and_params):
    _, params = model_and_params
    qp = quantize_params(params)
    flat = jax.tree_util.tree_leaves_with_path(
        qp, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )
    kinds = {}
    for path, leaf in flat:
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        kinds[names] = isinstance(leaf, QuantizedTensor)
    # all big conv kernels quantized; biases never
    assert any(k.endswith("kernel") and v for k, v in kinds.items())
    assert all(not v for k, v in kinds.items() if k.endswith("bias"))
    # quantized leaves are int8 with per-output-channel scales
    for _, leaf in flat:
        if isinstance(leaf, QuantizedTensor):
            assert jnp.asarray(leaf.q).dtype == jnp.int8
            assert leaf.scale.shape[-1] == leaf.q.shape[-1]


def test_dequantize_error_bound(model_and_params):
    _, params = model_and_params
    qp = quantize_params(params)
    deq = dequantize_params(qp)
    for orig, rec in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(deq)
    ):
        o = np.asarray(orig, np.float32)
        r = np.asarray(rec, np.float32)
        assert o.shape == r.shape
        if o.ndim >= 2 and o.size >= 1024:
            # per-channel symmetric int8: error <= scale/2 = amax/254
            amax = np.abs(o).max(axis=tuple(range(o.ndim - 1)), keepdims=True)
            assert (np.abs(o - r) <= amax / 254 + 1e-7).all()
        else:
            np.testing.assert_array_equal(o, r)


def test_model_output_close_to_full_precision(model_and_params):
    model, params = model_and_params
    x = _images(2)
    want = np.asarray(model.apply(params, x)["heatmap"])
    got = np.asarray(
        jax.jit(freeze_params_quantized(model.apply, quantize_params(params)))(x)[
            "heatmap"
        ]
    )
    # weight-only per-channel int8 on a bf16 backbone: small relative error
    denom = max(1e-3, float(np.abs(want).max()))
    assert np.abs(got - want).max() / denom < 0.12
    # and far from degenerate: strong correlation with the fp output
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.99


def test_bytes_shrink_about_4x(model_and_params):
    _, params = model_and_params
    qp = quantize_params(params)
    full = params_nbytes(params)
    quant = params_nbytes(qp)
    assert quant < full / 3  # conv-dominated tree: close to 4x


def test_quantized_tree_flows_through_jit(model_and_params):
    _, params = model_and_params
    qp = quantize_params(params)

    @jax.jit
    def norm(qp):
        deq = dequantize_params(qp, jnp.float32)
        return sum(jnp.sum(l * l) for l in jax.tree_util.tree_leaves(deq))

    assert float(norm(qp)) > 0


def test_idempotent_requantization(model_and_params):
    """quantize_params over an already-quantized tree is a no-op: the int8
    leaves AND their float32 scale children must come back untouched (the
    scale is itself a (1,..,1,C) float leaf that would otherwise match the
    selection rule)."""
    _, params = model_and_params
    qp = quantize_params(params, min_size=64)
    qp2 = quantize_params(qp, min_size=64)
    l1 = jax.tree_util.tree_leaves(qp, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    l2 = jax.tree_util.tree_leaves(qp2, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        assert type(a) is type(b)
        if isinstance(a, QuantizedTensor):
            np.testing.assert_array_equal(np.asarray(a.q), np.asarray(b.q))
            np.testing.assert_array_equal(np.asarray(a.scale), np.asarray(b.scale))
            assert not isinstance(b.scale, QuantizedTensor)


def test_quantize_accepts_numpy_leaves(model_and_params):
    """Host-side numpy params (the checkpoint-restore path) quantize
    without being device-transferred first."""
    _, params = model_and_params
    np_params = jax.tree_util.tree_map(lambda l: np.asarray(l), params)
    qp = quantize_params(np_params)
    assert any(
        isinstance(l, QuantizedTensor)
        for l in jax.tree_util.tree_leaves(qp, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    )


def test_predicate_and_min_size(model_and_params):
    _, params = model_and_params
    nothing = quantize_params(params, min_size=1 << 30)
    assert not any(
        isinstance(l, QuantizedTensor)
        for l in jax.tree_util.tree_leaves(
            nothing, is_leaf=lambda x: isinstance(x, QuantizedTensor)
        )
    )
    everything2d = quantize_params(params, predicate=lambda l: getattr(l, "ndim", 0) >= 2)
    assert any(
        isinstance(l, QuantizedTensor)
        for l in jax.tree_util.tree_leaves(
            everything2d, is_leaf=lambda x: isinstance(x, QuantizedTensor)
        )
    )


def test_composes_with_serving_export(tmp_path, model_and_params):
    from accvlab_tpu.models.serving import load_inference, save_inference

    model, params = model_and_params
    x = _images(2)
    p_full = str(tmp_path / "full.accvserve")
    p_q = str(tmp_path / "int8.accvserve")
    save_inference(p_full, model.apply, params, x)
    # quantized: dequant traced in, int8 consts baked
    import os

    from accvlab_tpu.models.serving import export_inference

    art = export_inference(
        freeze_params_quantized(model.apply, quantize_params(params)), (x,)
    )
    with open(p_q, "wb") as f:
        f.write(art)
    full_sz, q_sz = os.path.getsize(p_full), os.path.getsize(p_q)
    assert q_sz < full_sz / 2.5, (full_sz, q_sz)

    got = np.asarray(load_inference(p_q)(x)["heatmap"])
    want = np.asarray(model.apply(params, x)["heatmap"])
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.99


# --------------------------------------------------------------------------- #
# int4 (nibble-packed, grouped scales)
# --------------------------------------------------------------------------- #


def np_int4_oracle(w, gs):
    """Scalar numpy mirror of the int4 quantize+dequantize round trip."""
    shape = w.shape
    c = shape[-1]
    w2 = w.reshape(-1, c).astype(np.float32)
    rows = w2.shape[0]
    gs = gs or rows
    n_groups = -(-rows // gs)
    if (n_groups * gs) % 2:
        n_groups += 1
    rows_p = n_groups * gs
    wp = np.zeros((rows_p, c), np.float32)
    wp[:rows] = w2
    wg = wp.reshape(n_groups, gs, c)
    amax = np.abs(wg).max(axis=1, keepdims=True)
    scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(wg / scale), -7, 7).astype(np.int8)
    dq = (q.astype(np.float32) * scale).reshape(rows_p, c)[:rows]
    return dq.reshape(shape), scale


@pytest.mark.parametrize("shape,gs", [
    ((64, 16), None),
    ((64, 16), 16),
    ((128, 8), 64),
    ((5, 3), 3),      # within-group padding (2 groups x 3 rows = even)
    ((9, 4), 3),      # odd n_groups*gs -> EXTRA all-padding group
    ((7, 4), None),   # odd rows, single group
    ((3, 3, 8, 12), 8),  # conv kernel: rows = 3*3*8
])
def test_int4_matches_numpy_oracle(shape, gs):
    from accvlab_tpu.models.quantize import _quantize_leaf_int4

    rng = np.random.default_rng(hash(shape) % 2**31)
    w = rng.normal(scale=0.2, size=shape).astype(np.float32)
    qt = _quantize_leaf_int4(w, gs)
    assert qt.bits == 4 and qt.shape == shape
    assert qt.q.dtype == jnp.uint8
    want, scale = np_int4_oracle(w, gs)
    np.testing.assert_array_equal(np.asarray(qt.dequantize()), want)
    # error bound: half a quantization step per group-channel
    rows = int(np.prod(shape[:-1]))
    eff_gs = gs or rows
    step = np.repeat(scale, eff_gs, axis=1).reshape(-1, shape[-1])[:rows]
    err = np.abs(np.asarray(qt.dequantize()).reshape(rows, -1) - w.reshape(rows, -1))
    assert (err <= step / 2 + 1e-7).all()


def test_int4_bytes_shrink_about_8x():
    w = np.random.default_rng(0).normal(size=(256, 256)).astype(np.float32)
    qp = quantize_params({"w": w}, bits=4, group_size=64)
    nb = params_nbytes(qp)
    # packed nibbles: 256*256/2 bytes + (256/64)*256*4 scale bytes
    assert nb == 256 * 256 // 2 + (256 // 64) * 256 * 4
    assert w.nbytes / nb > 7.0


def test_int4_group_scales_beat_per_channel_on_heterogeneous_rows():
    rng = np.random.default_rng(1)
    # first rows tiny, last rows huge: one per-channel scale drowns the
    # small rows; 32-row groups keep them resolvable
    w = np.concatenate(
        [rng.normal(scale=0.01, size=(96, 32)), rng.normal(scale=10.0, size=(32, 32))]
    ).astype(np.float32)
    from accvlab_tpu.models.quantize import _quantize_leaf_int4

    err_flat = np.abs(np.asarray(_quantize_leaf_int4(w, None).dequantize()) - w)
    err_grp = np.abs(np.asarray(_quantize_leaf_int4(w, 32).dequantize()) - w)
    assert err_grp[:96].mean() < 0.15 * err_flat[:96].mean()


def test_int4_through_jit_and_export(tmp_path):
    from accvlab_tpu.models.serving import export_inference, load_inference

    rng = np.random.default_rng(2)
    w = rng.normal(scale=0.1, size=(64, 48)).astype(np.float32)
    qp = quantize_params({"k": w}, bits=4, group_size=16)

    def apply_fn(p, x):
        return x @ p["k"]

    fn = freeze_params_quantized(apply_fn, qp)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    art = export_inference(fn, (x,))
    got = np.asarray(load_inference(art)(x))
    want = x @ np.asarray(dequantize_params(qp)["k"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # and the artifact carries packed bytes, not floats
    assert len(art) < w.nbytes  # 12 KB of f32 vs ~6 KB packed + program


def test_int4_validation():
    with pytest.raises(ValueError, match="bits"):
        quantize_params({}, bits=2)
    with pytest.raises(ValueError, match="group_size"):
        quantize_params({}, bits=8, group_size=64)
    with pytest.raises(ValueError, match="group_size"):
        from accvlab_tpu.models.quantize import _quantize_leaf_int4

        _quantize_leaf_int4(np.ones((8, 8), np.float32), 0)


def test_quantized_params_checkpoint_roundtrip(tmp_path):
    """Quantized trees are ordinary pytrees to orbax: int4 leaves persist
    and restore with their aux (bits/shape/groups) intact — ship-sized
    checkpoints, not dequantized blow-ups."""
    from accvlab_tpu.models.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from accvlab_tpu.models.quantize import QuantizedTensor

    w = np.random.default_rng(3).normal(size=(64, 32)).astype(np.float32)
    qp = quantize_params({"w": w}, bits=4, group_size=16)
    save_checkpoint(str(tmp_path), 1, qp, None, {"quantized": True})
    restored, _, meta = restore_checkpoint(
        latest_checkpoint(str(tmp_path)), {"params": qp, "opt_state": None}
    )
    rq = restored["w"]
    assert isinstance(rq, QuantizedTensor)
    assert rq.bits == 4 and rq.shape == (64, 32) and rq.group_size == 16
    np.testing.assert_array_equal(np.asarray(rq.q), np.asarray(qp["w"].q))
    np.testing.assert_array_equal(
        np.asarray(rq.dequantize()), np.asarray(qp["w"].dequantize())
    )
    assert meta["pipeline"]["quantized"] is True
