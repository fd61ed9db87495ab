"""Flagship model + mesh/sharding tests (runs on the virtual 8-device CPU
mesh; the driver's dryrun_multichip exercises the same path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_make_mesh_shapes():
    from accvlab_tpu.parallel import make_mesh

    mesh = make_mesh(model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    mesh1 = make_mesh()
    assert mesh1.devices.shape == (8, 1)


def test_shard_batch_places_on_mesh():
    from jax.sharding import PartitionSpec as P

    from accvlab_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh()
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


def test_host_shard_info():
    from accvlab_tpu.parallel import host_shard_info

    shard_id, num_shards = host_shard_info()
    assert shard_id == 0 and num_shards == 1


def test_centernet_forward_and_train_step():
    from accvlab_tpu.models.centernet import (
        CenterNetDetector,
        make_example_batch,
        make_train_step,
    )

    model = CenterNetDetector(num_classes=8, width=16)
    batch = make_example_batch(batch_size=2, hw=(32, 32), num_classes=8)
    init_fn, train_step = make_train_step(model)
    params, opt_state = init_fn(jax.random.PRNGKey(0), batch["images"])
    step = jax.jit(train_step)
    p1, o1, m1 = step(params, opt_state, batch)
    p2, o2, m2 = step(p1, o1, batch)
    assert np.isfinite(float(m1["loss"]))
    assert float(m2["loss"]) < float(m1["loss"]) * 1.5  # training is sane
    # params actually changed
    leaf0 = jax.tree_util.tree_leaves(params)[0]
    leaf1 = jax.tree_util.tree_leaves(p1)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out["heatmap"].shape[0] == 2
    ge.dryrun_multichip(8)


def test_dryrun_multichip_generalizes_to_16_devices():
    """The sharding family must not be pinned to the 8-device shape the
    driver checks: all five stanzas (dp x tp, dp x sp x tp, ep, pp,
    composed dp x pp x tp) compile AND execute on a 16-device mesh too.
    Subprocess: the suite's own process is pinned to 8 virtual devices."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # keep the suite's opt-level-0 (conftest): replacing XLA_FLAGS wholesale
    # silently re-enabled full optimization here, making this the slowest
    # test in the suite (74 s -> ~35 s)
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=16 "
        "--xla_backend_optimization_level=0"
    )
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""})
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {repo!r});"
         "import __graft_entry__ as g; g.dryrun_multichip(16)"],
        env=env, capture_output=True, text=True, timeout=480,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "composed dp x pp x tp: mesh 4x2x2" in out.stdout, out.stdout


def test_centernet_loss_masks_padded_objects():
    from accvlab_tpu.models.centernet import CenterNetDetector, centernet_loss
    from accvlab_tpu.ragged import RaggedBatch

    b, hf, wf, c = 1, 8, 8, 4
    outputs = {
        "heatmap": jnp.zeros((b, hf, wf, c)),
        "offset": jnp.ones((b, hf, wf, 2)),
        "size": jnp.ones((b, hf, wf, 2)),
    }
    mk = lambda x, n: RaggedBatch(jnp.asarray(x), sample_sizes=jnp.asarray([n]))
    # only 1 valid object; padded entries hold garbage that must not leak
    targets = {
        "heatmap": jnp.zeros((b, hf, wf, c)),
        "centers": mk(np.array([[[1, 1], [7, 7]]], np.int32), 1),
        "offsets": mk(np.array([[[1.0, 1.0], [999.0, 999.0]]], np.float32), 1),
        "sizes": mk(np.array([[[1.0, 1.0], [999.0, 999.0]]], np.float32), 1),
    }
    losses = centernet_loss(outputs, targets)
    assert float(losses["offset_loss"]) == pytest.approx(0.0, abs=1e-5)


def test_petr_forward_and_train_step():
    from accvlab_tpu.models.petr import (
        PETRDetector,
        make_petr_example_batch,
        make_petr_train_step,
    )

    model = PETRDetector(num_queries=32, num_classes=6, dim=32, num_layers=2)
    batch = make_petr_example_batch(batch_size=2, num_classes=6)
    init_fn, train_step = make_petr_train_step(model)
    params, opt_state = init_fn(jax.random.PRNGKey(0), batch["images"])
    out = model.apply(params, batch["images"])
    assert out["boxes3d"].shape == (2, 32, 7)
    step = jax.jit(train_step)
    p1, o1, m1 = step(params, opt_state, batch)
    assert np.isfinite(float(m1["loss"]))
    p2, o2, m2 = step(p1, o1, batch)
    assert np.isfinite(float(m2["loss"]))


def test_checkpoint_save_restore(tmp_path):
    from accvlab_tpu.models.centernet import (
        CenterNetDetector,
        make_example_batch,
        make_train_step,
    )
    from accvlab_tpu.models.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    model = CenterNetDetector(num_classes=4, width=8)
    batch = make_example_batch(batch_size=2, hw=(32, 32), num_classes=4)
    init_fn, train_step = make_train_step(model)
    params, opt_state = init_fn(jax.random.PRNGKey(0), batch["images"])
    p1, o1, _ = jax.jit(train_step)(params, opt_state, batch)

    path = save_checkpoint(
        str(tmp_path), 1, p1, o1, {"seed": 0, "epoch": 0, "iteration": 1}
    )
    assert latest_checkpoint(str(tmp_path)) == path
    rp, ro, meta = restore_checkpoint(path, {"params": p1, "opt_state": o1,
                                             "meta": {"step": 0, "pipeline": {}}})
    assert meta["step"] == 1
    l0 = jax.tree_util.tree_leaves(p1)[0]
    r0 = jax.tree_util.tree_leaves(rp)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(r0))


def test_centernet_decode_detections():
    """Serving decode: planted peaks come back as exact ragged detections;
    fixed shapes under jit; empty images yield size-0 samples."""
    import jax

    from accvlab_tpu.models import decode_detections

    B, Hf, Wf, C = 2, 16, 24, 5
    heat = np.full((B, Hf, Wf, C), -8.0, np.float32)
    for b, y, x, c, l in [(0, 4, 6, 2, 6.0), (0, 10, 20, 0, 4.0), (1, 8, 12, 3, 5.0)]:
        heat[b, y, x, c] = l
    off = np.zeros((B, Hf, Wf, 2), np.float32)
    off[0, 4, 6] = [0.5, 0.25]
    sz = np.full((B, Hf, Wf, 2), 2.0, np.float32)

    dec = jax.jit(lambda o: decode_detections(o, max_detections=10, score_threshold=0.5))
    out = dec(
        {"heatmap": jnp.asarray(heat), "offset": jnp.asarray(off), "size": jnp.asarray(sz)}
    )
    assert list(np.asarray(out["boxes"].sample_sizes)) == [2, 1]
    np.testing.assert_allclose(
        np.asarray(out["boxes"].tensor)[0, 0], [22.0, 13.0, 30.0, 21.0], atol=1e-4
    )
    assert int(np.asarray(out["classes"].tensor)[0, 0]) == 2
    assert float(np.asarray(out["scores"].tensor)[0, 0]) > 0.99

    empty = dec(
        {
            "heatmap": jnp.full((B, Hf, Wf, C), -8.0, jnp.float32),
            "offset": jnp.asarray(off),
            "size": jnp.asarray(sz),
        }
    )
    assert list(np.asarray(empty["boxes"].sample_sizes)) == [0, 0]
    assert empty["boxes"].tensor.shape == (B, 10, 4)


def test_petr_decode_detections_3d():
    """3-D serving decode: existence-gated queries come back as ragged
    detections; fixed shapes under jit."""
    import jax

    from accvlab_tpu.models import decode_detections_3d

    B, Q, C = 2, 32, 6
    rng = np.random.default_rng(0)
    logits = np.zeros((B, Q, C), np.float32)
    exist = np.full((B, Q), -6.0, np.float32)
    boxes = rng.normal(size=(B, Q, 7)).astype(np.float32)
    for b, qi, ci in [(0, 3, 2), (0, 10, 4), (1, 7, 1)]:
        exist[b, qi] = 6.0
        logits[b, qi, ci] = 8.0

    dec = jax.jit(lambda o: decode_detections_3d(o, max_detections=8, score_threshold=0.3))
    out = dec(
        {
            "boxes3d": jnp.asarray(boxes),
            "logits": jnp.asarray(logits),
            "existence": jnp.asarray(exist),
        }
    )
    assert list(np.asarray(out["boxes3d"].sample_sizes)) == [2, 1]
    assert set(np.asarray(out["classes"].tensor)[0][:2].tolist()) == {2, 4}
    np.testing.assert_allclose(
        np.asarray(out["boxes3d"].tensor)[1][0], boxes[1, 7], rtol=1e-6
    )
    empty = dec(
        {
            "boxes3d": jnp.asarray(boxes),
            "logits": jnp.asarray(logits),
            "existence": jnp.asarray(exist * 0 - 6.0),
        }
    )
    assert list(np.asarray(empty["boxes3d"].sample_sizes)) == [0, 0]


def test_detection_serving_example():
    """Checkpoint save/restore -> fused forward+decode serving program."""
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))
    import detection_serving as ex

    ms = ex.main(batch_size=2, hw=(64, 96), num_classes=4)
    assert ms > 0


def test_make_mesh_nd():
    import jax

    from accvlab_tpu.parallel import make_mesh_nd

    mesh = make_mesh_nd((2, 2, 2), ("data", "seq", "model"))
    assert mesh.axis_names == ("data", "seq", "model")
    assert mesh.devices.shape == (2, 2, 2)
    # a sharded computation over all three axes compiles and runs
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.arange(2 * 4 * 8, dtype=jnp.float32).reshape(2, 4, 8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq", "model")))
    with mesh:
        y = jax.jit(lambda a: (a * 2).sum())(xs)
    assert float(y) == float(x.sum() * 2)


def test_streaming_petr_memory_propagation():
    """StreamPETR temporal propagation: fixed-size query memory carries
    across frames, conditions the next frame's predictions, and the jitted
    step compiles once."""
    import jax

    from accvlab_tpu.models import PETRDetector, make_streaming_petr_train_step
    from accvlab_tpu.models.petr import make_petr_example_batch, propagate_queries

    model = PETRDetector(num_classes=6, dim=32, num_queries=16, num_layers=2, num_memory=8)
    init_fn, step = make_streaming_petr_train_step(model)
    step = jax.jit(step)
    batch = make_petr_example_batch(batch_size=2, num_cams=2, hw=(16, 16), num_classes=6)
    params, opt_state, memory = init_fn(jax.random.PRNGKey(0), batch["images"])
    assert memory.shape == (2, 8, 32)

    for _ in range(3):
        params, opt_state, memory, metrics = step(params, opt_state, batch, memory)
        assert np.isfinite(float(metrics["loss"]))
    assert float(jnp.linalg.norm(memory)) > 0

    out_mem = model.apply(params, batch["images"], memory)
    out_zero = model.apply(params, batch["images"], jnp.zeros_like(memory))
    assert float(jnp.abs(out_mem["boxes3d"] - out_zero["boxes3d"]).max()) > 1e-6
    assert propagate_queries(out_mem, 8).shape == (2, 8, 32)


def test_checkpoint_resume_training_continuity(tmp_path):
    """Train -> checkpoint -> restore in a fresh state -> continue: the
    restored run must produce EXACTLY the same loss trajectory as the
    uninterrupted one (deterministic resume, SURVEY §5.4)."""
    import jax

    from accvlab_tpu.models import CenterNetDetector, make_train_step
    from accvlab_tpu.models.centernet import make_example_batch
    from accvlab_tpu.models.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    model = CenterNetDetector(num_classes=4, width=8)
    init_fn, train_step = make_train_step(model)
    train_step = jax.jit(train_step)
    batch = make_example_batch(batch_size=2, hw=(32, 32), num_classes=4)
    params, opt_state = init_fn(jax.random.PRNGKey(0), batch["images"])

    # run 2 steps, checkpoint, then 2 more -> reference trajectory
    for _ in range(2):
        params, opt_state, _ = train_step(params, opt_state, batch)
    save_checkpoint(str(tmp_path), step=2, params=params, opt_state=opt_state,
                    pipeline_state={"seed": 0, "epoch": 0, "iteration": 2})
    ref_losses = []
    p, o = params, opt_state
    for _ in range(2):
        p, o, m = train_step(p, o, batch)
        ref_losses.append(float(m["loss"]))

    # fresh process-equivalent: re-init then restore
    params2, opt2 = init_fn(jax.random.PRNGKey(99), batch["images"])
    path = latest_checkpoint(str(tmp_path))
    params2, opt2, meta = restore_checkpoint(
        path, {"params": params2, "opt_state": opt2}
    )
    assert meta["pipeline"]["iteration"] == 2
    resumed = []
    for _ in range(2):
        params2, opt2, m = train_step(params2, opt2, batch)
        resumed.append(float(m["loss"]))
    assert resumed == ref_losses  # bit-identical continuation


def test_petr_remat_equivalence():
    """remat=True (jax.checkpoint per decoder layer) is a pure memory/compute
    trade: identical param tree, bit-identical forward, identical loss."""
    import jax

    from accvlab_tpu.models import PETRDetector, make_petr_train_step
    from accvlab_tpu.models.petr import make_petr_example_batch

    batch = make_petr_example_batch(batch_size=2, num_cams=2, hw=(16, 16), num_classes=6)
    m0 = PETRDetector(num_classes=6, dim=32, num_queries=16, num_layers=2, remat=False)
    m1 = PETRDetector(num_classes=6, dim=32, num_queries=16, num_layers=2, remat=True)
    p0 = m0.init(jax.random.PRNGKey(0), batch["images"])
    p1 = m1.init(jax.random.PRNGKey(0), batch["images"])
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    o0, o1 = m0.apply(p0, batch["images"]), m1.apply(p0, batch["images"])
    assert float(jnp.abs(o0["boxes3d"] - o1["boxes3d"]).max()) == 0.0
    losses = []
    for m in (m0, m1):
        init_fn, step = make_petr_train_step(m)
        _, opt = init_fn(jax.random.PRNGKey(1), batch["images"])
        _, _, metrics = jax.jit(step)(p0, opt, batch)
        losses.append(float(metrics["loss"]))
    assert losses[0] == losses[1]


def test_moe_expert_parallel_matches_single_device():
    """SwitchFFN with the expert dim sharded over a mesh axis produces the
    same loss/updates as the unsharded run (GSPMD psum combine == local
    sum), and the dry-run stanza's sharding specs compile and execute."""
    import jax
    import numpy as np
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from accvlab_tpu.models.moe import (
        MoEClassifier,
        make_moe_example_batch,
        make_moe_shardings,
        make_moe_train_step,
    )

    model = MoEClassifier(num_experts=8, dim=16, num_classes=5)
    batch = make_moe_example_batch(batch_size=4, tokens=8, in_dim=12, num_classes=5)
    init_fn, train_step = make_moe_train_step(model)
    params = init_fn(jax.random.PRNGKey(0), batch["tokens"])

    # reference: plain single-device step
    _, ref_metrics = jax.jit(train_step)(params, batch)

    mesh = Mesh(mesh_utils.create_device_mesh((2, 4)), axis_names=("data", "expert"))
    params_sh, batch_sh = make_moe_shardings(mesh, params, batch)
    with mesh:
        p = jax.device_put(params, params_sh)
        b = jax.device_put(batch, batch_sh)
        new_params, metrics = jax.jit(
            train_step, in_shardings=(params_sh, batch_sh)
        )(p, b)
        jax.block_until_ready(metrics["loss"])

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
    )
    # expert weights really are sharded over the expert axis: each device
    # holds num_experts / expert_axis_size experts (device_set alone is
    # vacuous — a replicated array also spans all devices)
    w_in = new_params["params"]["SwitchFFN_0"]["w_in"]
    assert w_in.addressable_shards[0].data.shape[0] == 8 // 4


def test_pipeline_parallel_matches_sequential_and_trains():
    """GPipe-style pipeline_apply over a mesh 'pipe' axis: forward output is
    bit-identical to applying the stages sequentially, and grads flow
    through the scan + ppermute ring (a full pp train step executes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from accvlab_tpu.parallel import pipeline_apply

    S, M, MB, D = 4, 6, 4, 16
    mesh = Mesh(mesh_utils.create_device_mesh((2, S)), axis_names=("data", "pipe"))
    kw, kb, kx = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "w": jax.random.normal(kw, (S, D, D)) * 0.3,
        "b": jax.random.normal(kb, (S, D)) * 0.1,
    }
    xs = jax.random.normal(kx, (M, MB, D))

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    ref = xs
    for s in range(S):
        ref = stage_fn({"w": params["w"][s], "b": params["b"][s]}, ref)

    params_sh = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P("pipe"))), params
    )
    xs_sh = jax.device_put(xs, NamedSharding(mesh, P(None, "data")))
    with mesh:
        got = jax.jit(
            lambda p, x: pipeline_apply(p, x, stage_fn, mesh=mesh, data_spec=P("data"))
        )(params_sh, xs_sh)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        # full train step: mean-square loss, grads through the pipeline
        def loss_fn(p, x):
            y = pipeline_apply(p, x, stage_fn, mesh=mesh, data_spec=P("data"))
            return jnp.mean(y * y)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params_sh, xs_sh)
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))
    # grads for every stage are nonzero (each stage participated)
    gw = np.asarray(grads["w"])
    assert (np.abs(gw).reshape(S, -1).max(axis=1) > 0).all()


def test_pipeline_apply_output_collection_is_collective_free():
    """The forward pipeline's only collective is the ppermute ring: output
    collection is a pipe-sharded write + caller-side slice, NOT a psum
    broadcast (VERDICT r2 weak #9 — O(stages*output) ICI traffic)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh, PartitionSpec as P

    from accvlab_tpu.parallel import pipeline_apply

    S, M, MB, D = 4, 6, 4, 8
    mesh = Mesh(mesh_utils.create_device_mesh((2, S)), axis_names=("data", "pipe"))
    params = {"w": jnp.zeros((S, D, D)), "b": jnp.zeros((S, D))}
    xs = jnp.zeros((M, MB, D))

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    jaxpr = str(jax.make_jaxpr(
        lambda p, x: pipeline_apply(p, x, stage_fn, mesh=mesh, data_spec=P("data"))
    )(params, xs))
    assert "ppermute" in jaxpr
    assert "psum" not in jaxpr and "all_gather" not in jaxpr


def test_pipeline_loss_matches_sequential_and_accumulates_grads():
    """pipeline_loss (loss fused into the tick loop, scalars-only egress)
    matches the sequentially-applied stack's loss AND gradient — i.e. the
    scan transpose really does GPipe microbatch grad accumulation; remat
    on/off is grad-equivalent."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from accvlab_tpu.parallel import pipeline_loss

    S, M, MB, D = 4, 8, 4, 16
    mesh = Mesh(mesh_utils.create_device_mesh((2, S)), axis_names=("data", "pipe"))
    kw, kb, kx, kt = jax.random.split(jax.random.PRNGKey(7), 4)
    params = {
        "w": jax.random.normal(kw, (S, D, D)) * 0.3,
        "b": jax.random.normal(kb, (S, D)) * 0.1,
    }
    xs = jax.random.normal(kx, (M, MB, D))
    tgts = jax.random.normal(kt, (M, MB, D))

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    def loss_fn(y, t):
        return jnp.mean((y - t) ** 2)

    # sequential reference: stack the stages, mean loss over microbatches
    def ref_loss(p, x, t):
        y = x
        for s in range(S):
            y = stage_fn({"w": p["w"][s], "b": p["b"][s]}, y)
        return jnp.mean((y - t) ** 2)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params, xs, tgts)

    params_sh = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P("pipe"))), params
    )
    xs_sh = jax.device_put(xs, NamedSharding(mesh, P(None, "data")))
    tg_sh = jax.device_put(tgts, NamedSharding(mesh, P(None, "data")))

    with mesh:
        for remat in (True, False):
            fn = jax.jit(jax.value_and_grad(
                lambda p, x, t: pipeline_loss(
                    p, x, t, stage_fn, loss_fn,
                    mesh=mesh, data_spec=P("data"), remat=remat,
                )
            ))
            loss, grads = fn(params_sh, xs_sh, tg_sh)
            jax.block_until_ready(loss)
            np.testing.assert_allclose(float(loss), float(ref_l), rtol=2e-5)
            for k in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(grads[k]), np.asarray(ref_g[k]), rtol=2e-4, atol=1e-6
                )


def test_pipeline_loss_composed_with_tensor_parallel_stages():
    """param_specs lets each pipeline stage run TENSOR-parallel over a
    'model' mesh axis (column-parallel W1, row-parallel W2 + psum): the
    composed dp x pp x tp loss AND grads match the plain sequential stack."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from accvlab_tpu.parallel import pipeline_loss

    S, M, MB, D, H = 2, 4, 4, 8, 16
    mesh = Mesh(mesh_utils.create_device_mesh((2, S, 2)),
                axis_names=("data", "pipe", "model"))
    k1, k2, kx, kt = jax.random.split(jax.random.PRNGKey(9), 4)
    params = {
        "w1": jax.random.normal(k1, (S, D, H)) * 0.3,
        "b1": jax.random.normal(jax.random.PRNGKey(10), (S, H)) * 0.1,
        "w2": jax.random.normal(k2, (S, H, D)) * 0.3,
        "b2": jnp.zeros((S, D)),
    }
    param_specs = {
        "w1": P("pipe", None, "model"),
        "b1": P("pipe", "model"),
        "w2": P("pipe", "model", None),
        "b2": P("pipe"),
    }
    xs = jax.random.normal(kx, (M, MB, D))
    tgts = jax.random.normal(kt, (M, MB, D))

    def stage_fn(p, x):
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        return jnp.tanh(lax.psum(h @ p["w2"], "model") + p["b2"])

    def stage_ref(p, x):  # same math without the tp collective
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        return jnp.tanh(h @ p["w2"] + p["b2"])

    def ref_loss(p, x, t):
        y = x
        for s in range(S):
            y = stage_ref(jax.tree_util.tree_map(lambda a: a[s], p), y)
        return jnp.mean((y - t) ** 2)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params, xs, tgts)

    params_sh = {
        k: jax.device_put(v, NamedSharding(mesh, param_specs[k]))
        for k, v in params.items()
    }
    xs_sh = jax.device_put(xs, NamedSharding(mesh, P(None, "data")))
    tg_sh = jax.device_put(tgts, NamedSharding(mesh, P(None, "data")))

    with mesh:
        fn = jax.jit(jax.value_and_grad(
            lambda p, x, t: pipeline_loss(
                p, x, t, stage_fn, lambda y, tg: jnp.mean((y - tg) ** 2),
                mesh=mesh, data_spec=P("data"), param_specs=param_specs,
            )
        ))
        loss, grads = fn(params_sh, xs_sh, tg_sh)
        jax.block_until_ready(loss)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=2e-5)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(ref_g[k]), rtol=2e-4, atol=1e-6
        )


def test_fsdp_shardings_train_step_matches_unsharded():
    """ZeRO-3-style param sharding: large leaves split over the data axis,
    small leaves replicate; the train step's numbers match the unsharded
    run and updated params keep their (propagated) distribution."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from accvlab_tpu.models.centernet import (
        CenterNetDetector,
        make_example_batch,
        make_train_step,
    )
    from accvlab_tpu.parallel import make_fsdp_shardings, make_mesh, shard_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(data_parallel=8, model_parallel=1)
    model = CenterNetDetector(num_classes=4, width=16)
    batch = make_example_batch(batch_size=8, hw=(32, 48), num_classes=4)
    init_fn, train_step = make_train_step(model, optimizer=optax.sgd(1e-2))
    params, opt_state = init_fn(jax.random.PRNGKey(0), batch["images"])

    shardings = make_fsdp_shardings(params, mesh, min_size=1024)
    flat_params = jax.tree_util.tree_leaves(params)
    flat_shard = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    # at least one large leaf sharded over 'data'; small leaves replicated
    assert any(s.spec != P() for s in flat_shard)
    for leaf, s in zip(flat_params, flat_shard):
        if np.prod(np.shape(leaf)) < 1024:
            assert s.spec == P()

    params_f = jax.device_put(params, shardings)
    # sharded leaves really are distributed (per-device shard < full leaf)
    big = max(jax.tree_util.tree_leaves(params_f), key=lambda a: a.size)
    assert big.addressable_shards[0].data.size < big.size

    with mesh:
        sb = shard_batch(batch, mesh)
        p1, _, m1 = jax.jit(train_step)(params_f, opt_state, sb)
    p0, _, m0 = jax.jit(train_step)(params, opt_state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-4)
    # the updated params stay distributed (no silent full replication)
    big1 = max(jax.tree_util.tree_leaves(p1), key=lambda a: a.size)
    assert big1.addressable_shards[0].data.size < big1.size
    # and the numbers agree with the unsharded trajectory
    l0 = jax.tree_util.tree_leaves(p0)
    l1 = jax.tree_util.tree_leaves(p1)
    for a, b in zip(l0, l1):
        # bf16 backbone + per-shard reduction order: tiny absolute noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)
