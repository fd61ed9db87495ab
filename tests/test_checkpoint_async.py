"""Production checkpoint surface: async saves, retention GC, sharded restore.

Beyond reference parity (SURVEY §5.4 — the reference has no checkpointing):
the async path must never block the train loop on I/O, retention must only
collect COMMITTED checkpoints, and the restore template's shardings must
place parameters directly onto the target mesh (restore-on-resize).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from accvlab_tpu.models.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)


def _state(k=0.0):
    return (
        {"w": jnp.full((4, 3), 1.5 + k), "b": jnp.arange(3, dtype=jnp.float32) + k},
        {"mu": jnp.zeros((4, 3))},
    )


def test_async_save_restores_identically(tmp_path):
    params, opt = _state()
    path = save_checkpoint(
        str(tmp_path), 7, params, opt, {"iteration": 7}, asynchronous=True
    )
    # the train loop keeps running while the save serializes in background
    acc = jnp.zeros(())
    for i in range(5):
        acc = acc + jnp.sum(params["w"]) * i
    wait_for_checkpoints()
    assert latest_checkpoint(str(tmp_path)) == path
    rp, ro, meta = restore_checkpoint(path, {"params": params, "opt_state": opt})
    assert meta == {"step": 7, "pipeline": {"iteration": 7}}
    for a, b in zip(jax.tree_util.tree_leaves((params, opt)),
                    jax.tree_util.tree_leaves((rp, ro))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_retention_keeps_newest(tmp_path):
    for step in range(1, 5):
        params, opt = _state(float(step))
        save_checkpoint(str(tmp_path), step, params, opt, keep=2)
    wait_for_checkpoints()
    dirs = sorted(d for d in os.listdir(tmp_path) if d.startswith("step_")
                  and os.path.isdir(tmp_path / d))
    assert dirs == ["step_00000003", "step_00000004"]
    # sidecars of collected checkpoints are gone too
    metas = sorted(f for f in os.listdir(tmp_path) if f.endswith(".meta.json"))
    assert metas == ["step_00000003.meta.json", "step_00000004.meta.json"]
    # the survivor restores
    path = latest_checkpoint(str(tmp_path))
    rp, _, meta = restore_checkpoint(path, dict(zip(("params", "opt_state"), _state())))
    assert meta["step"] == 4
    np.testing.assert_allclose(np.asarray(rp["w"]), 1.5 + 4.0)


def test_sharded_restore_onto_mesh(tmp_path):
    """Save from host/single-device state, restore with ShapeDtypeStruct +
    NamedSharding templates: parameters land sharded on the target mesh
    (the saving topology does not constrain the restoring one)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from accvlab_tpu.parallel import make_mesh

    params = {"w": jnp.arange(8 * 6, dtype=jnp.float32).reshape(8, 6)}
    opt = {"mu": jnp.zeros((8, 6))}
    path = save_checkpoint(str(tmp_path), 1, params, opt)

    mesh = make_mesh()  # 8 virtual devices
    sh = NamedSharding(mesh, P("data", None))
    template = {
        "params": {"w": jax.ShapeDtypeStruct((8, 6), jnp.float32, sharding=sh)},
        "opt_state": {"mu": jax.ShapeDtypeStruct((8, 6), jnp.float32, sharding=sh)},
    }
    rp, ro, _ = restore_checkpoint(path, template)
    assert rp["w"].sharding.is_equivalent_to(sh, 2)
    assert len(rp["w"].sharding.device_set) == int(np.prod(mesh.devices.shape))
    np.testing.assert_array_equal(np.asarray(rp["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(ro["mu"]), 0.0)


def test_inflight_tmp_is_never_listed_or_collected(tmp_path):
    """orbax writes an in-flight async save to
    ``step_NNNNNNNN.orbax-checkpoint-tmp`` IN the checkpoint directory and
    renames on commit. An orphaned/in-flight tmp must never be returned by
    latest_checkpoint (resume would crash on the incomplete checkpoint)
    and must never count toward ``keep`` (with keep=1 it would evict the
    only committed checkpoint — total checkpoint loss on the next
    preemption)."""
    params, opt = _state()
    committed = save_checkpoint(str(tmp_path), 7, params, opt)
    # simulate a preemption mid-async-save: the tmp dir is left behind
    orphan = tmp_path / "step_00000008.orbax-checkpoint-tmp"
    orphan.mkdir()
    (orphan / "partial").write_text("x")

    assert latest_checkpoint(str(tmp_path)) == committed
    # retention with keep=1: the committed checkpoint survives
    save_checkpoint(str(tmp_path), 9, params, opt, keep=1)
    wait_for_checkpoints()
    assert latest_checkpoint(str(tmp_path)).endswith("step_00000009")
    dirs = {d for d in os.listdir(tmp_path)}
    assert "step_00000009" in dirs and "step_00000007" not in dirs
    # the orphan is untouched (cleanup is the owner's call, not GC's)
    assert orphan.is_dir()


def test_sharded_save_restores_onto_different_mesh_layout(tmp_path):
    """Production resize: params SAVED sharded on a (4, 2) mesh restore
    onto a (2, 4) mesh with a different partition spec — values exact,
    target sharding honored (orbax reads per-shard, the layouts are
    independent)."""
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh_a = Mesh(mesh_utils.create_device_mesh((4, 2)), ("data", "model"))
    mesh_b = Mesh(mesh_utils.create_device_mesh((2, 4)), ("data", "model"))

    w = jnp.arange(8 * 12, dtype=jnp.float32).reshape(8, 12)
    params = {
        "w": jax.device_put(w, NamedSharding(mesh_a, P("data", "model")))
    }
    opt = {"mu": jax.device_put(jnp.zeros((8, 12)),
                                NamedSharding(mesh_a, P("data", None)))}
    path = save_checkpoint(str(tmp_path), 1, params, opt)

    tgt = NamedSharding(mesh_b, P("model", "data"))  # transposed layout
    template = {
        "params": {"w": jax.ShapeDtypeStruct((8, 12), jnp.float32, sharding=tgt)},
        "opt_state": {
            "mu": jax.ShapeDtypeStruct((8, 12), jnp.float32, sharding=tgt)
        },
    }
    rp, ro, _ = restore_checkpoint(path, template)
    assert rp["w"].sharding.is_equivalent_to(tgt, 2)
    np.testing.assert_array_equal(np.asarray(rp["w"]), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(ro["mu"]), 0.0)
