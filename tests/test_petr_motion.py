"""Motion-aware PETR memory (StreamPETR's ego-compensated propagation).

Compact-model scale like the rest of ``models/`` — the properties under
test are the CONTRACTS: the compensation math, the anchor-relative box
head, ref-point plumbing through the streaming carry, and that the
default (non-motion) paths are untouched.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from accvlab_tpu.models.petr import (
    PETRDetector,
    compensate_ref_points,
    make_motion_petr_train_step,
    make_petr_example_batch,
    propagate_queries_with_motion,
)


def _ego(b, yaw=0.3, t=(1.0, -2.0, 0.1)):
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    m[:3, 3] = t
    return jnp.asarray(np.broadcast_to(m, (b, 4, 4)))


def test_compensation_math_matches_homogeneous_transform():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    T = _ego(2)
    got = np.asarray(compensate_ref_points(pts, T))
    for b in range(2):
        hom = np.concatenate([np.asarray(pts[b]), np.ones((5, 1), np.float32)], -1)
        want = (np.asarray(T[b]) @ hom.T).T[:, :3]
        np.testing.assert_allclose(got[b], want, rtol=1e-6, atol=1e-6)
    # None means identity
    np.testing.assert_array_equal(
        np.asarray(compensate_ref_points(pts, None)), np.asarray(pts)
    )


def _model(**kw):
    return PETRDetector(
        num_queries=8, num_classes=4, dim=32, num_layers=2, num_memory=4,
        motion_aware=True, **kw,
    )


def test_memory_refs_are_compensated_and_exposed():
    """outputs['ref_points'] carries the fresh anchors plus the memory refs
    transformed by the ego motion — the plumbing contract."""
    model = _model()
    b = 2
    images = jnp.zeros((b, 2, 16, 16, 3))
    memory = jnp.ones((b, 4, 32))
    memory_ref = jnp.asarray(
        np.random.default_rng(1).normal(size=(b, 4, 3)).astype(np.float32)
    )
    T = _ego(b)
    params = model.init(jax.random.PRNGKey(0), images, memory, memory_ref, T)
    out = model.apply(params, images, memory, memory_ref, T)
    refs = np.asarray(out["ref_points"])
    assert refs.shape == (b, 12, 3)
    np.testing.assert_allclose(
        refs[:, 8:], np.asarray(compensate_ref_points(memory_ref, T)),
        rtol=1e-6,
    )
    # the fresh-query anchors are the learned params, broadcast per sample
    anchors = np.asarray(params["params"]["ref_anchors"])
    np.testing.assert_array_equal(refs[0, :8], anchors)
    np.testing.assert_array_equal(refs[1, :8], anchors)


def test_box_xyz_is_anchor_relative():
    """The xyz head output is ref + offset. With the position encoder
    ZEROED, moving the memory refs by d leaves every query FEATURE
    unchanged, so the memory slots' predicted centers must shift by
    exactly d — the anchor-relative regression contract itself (a model
    that ignored refs in the box head would leave boxes3d unchanged)."""
    model = _model()
    b = 1
    images = jnp.zeros((b, 2, 16, 16, 3))
    memory = jnp.zeros((b, 4, 32))
    ref0 = jnp.zeros((b, 4, 3))
    params = model.init(jax.random.PRNGKey(0), images, memory, ref0, None)
    params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.zeros_like(leaf)
        if any("position_encoder" in str(getattr(p, "key", p)) for p in path)
        else leaf,
        params,
    )
    out0 = model.apply(params, images, memory, ref0, None)
    d = jnp.asarray([[0.5, -1.0, 2.0]])
    T = jnp.eye(4)[None].at[:, :3, 3].set(d)
    out1 = model.apply(params, images, memory, ref0, T)
    # features identical -> memory-slot centers shift by exactly d ...
    np.testing.assert_allclose(
        np.asarray(out1["boxes3d"][:, 8:, :3] - out0["boxes3d"][:, 8:, :3]),
        np.broadcast_to(np.asarray(d), (1, 4, 3)),
        rtol=1e-5, atol=1e-6,
    )
    # ... while size/yaw dims and the fresh queries' boxes are untouched
    np.testing.assert_array_equal(
        np.asarray(out1["boxes3d"][:, 8:, 3:]), np.asarray(out0["boxes3d"][:, 8:, 3:])
    )
    np.testing.assert_array_equal(
        np.asarray(out1["boxes3d"][:, :8]), np.asarray(out0["boxes3d"][:, :8])
    )
    # and the exposed refs carry the compensated positions
    np.testing.assert_allclose(
        np.asarray(out1["ref_points"][:, 8:] - out0["ref_points"][:, 8:]),
        np.broadcast_to(np.asarray(d), (1, 4, 3)),
        rtol=1e-6,
    )


def test_streaming_motion_training_runs_and_learns():
    model = _model()
    # num_queries=12 == the model's 8 fresh + 4 memory slots: matches_pred
    # must be in range or the masked gathers drop them and the matched loss
    # terms degenerate
    batch = make_petr_example_batch(
        batch_size=2, num_cams=2, hw=(16, 16), num_classes=4, num_queries=12
    )
    batch = dict(batch)
    batch["matches_pred"] = batch["matches_pred"].astype(jnp.int32)
    batch["ego_transform"] = _ego(2, yaw=0.05, t=(0.5, 0.0, 0.0))
    init_fn, train_step = make_motion_petr_train_step(model)
    params, opt_state, memory, memory_ref = init_fn(
        jax.random.PRNGKey(0), batch["images"]
    )
    step = jax.jit(train_step)
    first = None
    for _ in range(12):
        params, opt_state, memory, memory_ref, metrics = step(
            params, opt_state, batch, memory, memory_ref
        )
        if first is None:
            first = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first
    assert memory.shape == (2, 4, 32) and memory_ref.shape == (2, 4, 3)
    # propagated refs are the selected queries' predicted centers
    assert np.isfinite(np.asarray(memory_ref)).all()


def test_propagation_carries_predicted_centers():
    model = _model()
    b = 1
    images = jnp.zeros((b, 2, 16, 16, 3))
    params = model.init(
        jax.random.PRNGKey(0), images, jnp.zeros((b, 4, 32)),
        jnp.zeros((b, 4, 3)), None,
    )
    out = model.apply(params, images, jnp.zeros((b, 4, 32)),
                      jnp.zeros((b, 4, 3)), None)
    feats, centers = propagate_queries_with_motion(out, 4)
    scores = np.asarray(jax.nn.sigmoid(out["existence"]))
    idx = np.argsort(-scores[0], kind="stable")[:4]
    # centers are score-gated (empty scenes propagate ~zero state for the
    # positional half too, not just the features)
    np.testing.assert_allclose(
        np.asarray(centers[0]),
        np.asarray(out["boxes3d"][0, idx, :3]) * scores[0, idx][:, None],
        rtol=1e-5,
    )
    assert feats.shape == (b, 4, 32)


def test_default_paths_untouched():
    """motion_aware=False keeps the original signature/outputs (no
    ref_points key, same param tree as before the feature)."""
    model = PETRDetector(num_queries=8, num_classes=4, dim=32, num_layers=2)
    images = jnp.zeros((1, 2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), images)
    out = model.apply(params, images)
    assert "ref_points" not in out
    assert "ref_anchors" not in params["params"]
    assert not any(k.startswith("position_encoder") for k in params["params"])
