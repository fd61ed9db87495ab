"""Model trainability: the flagship train steps actually LEARN.

The forward/step tests prove shapes and jit-compatibility; these prove the
gradient path end to end — each model family overfits a small fixed batch
(the standard trainability smoke test) with a clear loss reduction, and
CenterNet additionally localizes: after overfitting a one-object scene the
predicted heatmap argmax lands on the target center.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def _overfit(train_step, params, opt_state, batch, steps, key=None):
    step = jax.jit(train_step)
    first = None
    for i in range(steps):
        params, opt_state, metrics = step(params, opt_state, batch)
        if i == 0:
            first = float(metrics["loss"])
    return params, first, float(metrics["loss"])


def _centernet_batch(centers_xy, num_classes=4, hw=(32, 48), cls=2):
    """Deterministic one-object-per-sample batch in the train-step contract
    (heatmap one-hot at the center; ragged box targets with one live slot)."""
    from accvlab_tpu.ragged import RaggedBatch

    rng = np.random.default_rng(5)
    b = len(centers_xy)
    hf, wf = hw[0] // 4, hw[1] // 4
    images = rng.uniform(0, 1, (b, *hw, 3)).astype(np.float32)
    heatmap = np.zeros((b, hf, wf, num_classes), np.float32)
    centers = np.zeros((b, 1, 2), np.int32)
    for i, (cx, cy) in enumerate(centers_xy):
        heatmap[i, cy, cx, cls] = 1.0
        centers[i, 0] = (cx, cy)
    sizes = np.ones((b,), np.int32)
    mk = lambda x: RaggedBatch(jnp.asarray(x), sample_sizes=jnp.asarray(sizes))
    return {
        "images": jnp.asarray(images),
        "targets": {
            "heatmap": jnp.asarray(heatmap),
            "centers": mk(centers),
            "offsets": mk(np.full((b, 1, 2), 0.5, np.float32)),
            "sizes": mk(np.full((b, 1, 2), 4.0, np.float32)),
        },
    }


def test_centernet_overfits_and_localizes():
    from accvlab_tpu.models.centernet import CenterNetDetector, make_train_step

    model = CenterNetDetector(num_classes=4, width=24)
    targets_xy = [(4, 3), (9, 6)]
    batch = _centernet_batch(targets_xy)

    init_fn, train_step = make_train_step(
        model, optimizer=optax.adam(3e-3)
    )
    params, opt_state = init_fn(jax.random.PRNGKey(0), batch["images"])
    params, first, last = _overfit(train_step, params, opt_state, batch, steps=120)
    assert last < 0.5 * first, (first, last)

    out = model.apply(params, batch["images"])
    heat = jax.nn.sigmoid(out["heatmap"])  # (B, Hf, Wf, C)
    for b, (cx, cy) in enumerate(targets_xy):
        hb = np.asarray(heat[b, :, :, 2])
        py, px = np.unravel_index(hb.argmax(), hb.shape)
        assert (abs(px - cx) <= 1 and abs(py - cy) <= 1), (
            f"sample {b}: peak at ({px},{py}), target ({cx},{cy})"
        )


def test_petr_overfits():
    from accvlab_tpu.models.petr import (
        PETRDetector,
        make_petr_example_batch,
        make_petr_train_step,
    )

    model = PETRDetector(num_classes=4, dim=32, num_queries=8, num_layers=2)
    batch = make_petr_example_batch(
        batch_size=2, num_cams=2, hw=(16, 16), num_classes=4
    )
    init_fn, train_step = make_petr_train_step(
        model, optimizer=optax.adam(3e-3)
    )
    params, opt_state = init_fn(jax.random.PRNGKey(1), batch["images"])
    params, first, last = _overfit(train_step, params, opt_state, batch, steps=60)
    assert last < 0.6 * first, (first, last)


def test_moe_overfits():
    from accvlab_tpu.models.moe import (
        MoEClassifier,
        make_moe_example_batch,
        make_moe_train_step,
    )

    model = MoEClassifier(num_experts=4, dim=32, num_classes=4)
    batch = make_moe_example_batch(batch_size=8, tokens=8, in_dim=12, num_classes=4)
    init_fn, train_step = make_moe_train_step(model)
    params = init_fn(jax.random.PRNGKey(2), batch["tokens"])

    step = jax.jit(train_step, static_argnums=(2,))
    first = last = None
    for i in range(250):
        params, metrics = step(params, batch, 5e-2)
        if i == 0:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < 0.3 * first, (first, last)
