"""Lane regression trained through differentiable polyline resampling.

Demonstrates the polyline subsystem (``accvlab_tpu.polyline``) in a real
training loop — the workload ACCV-Lab's ``lane_helpers`` extension exists for
(``packages/lane_helpers/accvlab/lane_helpers/polyline/functions.py:27-120``):
ground-truth lanes arrive as variable-length polylines, and both prediction
and ground truth are resampled at uniform relative arc-lengths so an L2 loss
compares geometry rather than raw control points.

TPU-native advantage exercised here: unlike the reference's CUDA kernels, the
TPU polyline ops are differentiable end to end, so arc-length resampling sits
*inside* the loss and gradients flow through the interpolation weights — no
pre-resampled targets needed.

Run: ``python examples/lane_regression_training.py``
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from accvlab_tpu.polyline import interpolate, interpolate_var_size_batch
from accvlab_tpu.ragged import RaggedBatch

GRID = 32          # BEV raster resolution
MAX_GT_PTS = 12    # static bound on ground-truth polyline length
NUM_CTRL = 8       # predicted control points per lane
NUM_SAMPLES = 16   # arc-length sample count used by the loss


def make_lane_batch(batch_size: int, rng: np.random.Generator):
    """Synthetic quadratic lanes: a BEV occupancy raster (model input) and the
    generating polyline with a variable number of vertices (ground truth)."""
    rasters = np.zeros((batch_size, GRID, GRID), np.float32)
    pts = np.zeros((batch_size, MAX_GT_PTS, 2), np.float32)
    sizes = np.zeros((batch_size,), np.int32)
    for b in range(batch_size):
        n = int(rng.integers(5, MAX_GT_PTS + 1))
        a, c = rng.uniform(-0.6, 0.6), rng.uniform(0.2, 0.8)
        y = np.linspace(0.05, 0.95, n)
        x = np.clip(c + a * (y - 0.5) ** 2 * 4.0, 0.02, 0.98)
        pts[b, :n, 0], pts[b, :n, 1] = x, y
        sizes[b] = n
        # rasterize with a dense resample so the input actually shows the lane
        dense = np.linspace(0, 1, 64)
        xd = np.interp(dense, y, x)
        rasters[b, (dense * (GRID - 1)).astype(int), (xd * (GRID - 1)).astype(int)] = 1.0
    return rasters, pts, sizes


def init_params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    h = 128
    return {
        "w1": jax.random.normal(k1, (GRID * GRID, h)) * (1.0 / GRID),
        "b1": jnp.zeros((h,)),
        "w2": jax.random.normal(k2, (h, h)) * (2.0 / h) ** 0.5,
        "b2": jnp.zeros((h,)),
        "w3": jax.random.normal(k3, (h, NUM_CTRL * 2)) * 0.01,
        "b3": jnp.zeros((NUM_CTRL * 2,)),
    }


def predict(params, rasters):
    """(B, GRID, GRID) occupancy -> (B, NUM_CTRL, 2) lane control points."""
    x = rasters.reshape(rasters.shape[0], -1)
    x = jax.nn.relu(x @ params["w1"] + params["b1"])
    x = jax.nn.relu(x @ params["w2"] + params["b2"])
    ctrl = jax.nn.sigmoid(x @ params["w3"] + params["b3"])
    return ctrl.reshape(-1, NUM_CTRL, 2)


def arc_length_loss(params, rasters, gt: RaggedBatch):
    """Resample prediction AND variable-length ground truth at the same
    relative arc-lengths, then L2 — geometry-space comparison."""
    pred = predict(params, rasters)  # (B, NUM_CTRL, 2), fixed size
    b = pred.shape[0]
    fracs = jnp.broadcast_to(jnp.linspace(0.0, 1.0, NUM_SAMPLES), (b, NUM_SAMPLES))
    pred_samples = interpolate(pred, fracs, relative=True)  # differentiable
    gt_fracs = RaggedBatch.FromFullTensor(fracs)
    gt_samples = interpolate_var_size_batch(gt, gt_fracs, relative=True)
    err = pred_samples - gt_samples.tensor  # all NUM_SAMPLES rows valid
    return jnp.mean(jnp.sum(err * err, axis=-1))


def run(num_steps: int = 150, batch_size: int = 32, seed: int = 0, verbose: bool = True):
    import optax

    opt = optax.adam(3e-3)
    rng = np.random.default_rng(seed)
    params = init_params(jax.random.PRNGKey(seed))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, rasters, gt: RaggedBatch):
        loss, grads = jax.value_and_grad(arc_length_loss)(params, rasters, gt)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    first = last = None
    for step in range(num_steps):
        rasters, pts, sizes = make_lane_batch(batch_size, rng)
        gt = RaggedBatch(jnp.asarray(pts), sample_sizes=jnp.asarray(sizes))
        params, opt_state, loss = train_step(params, opt_state, jnp.asarray(rasters), gt)
        loss = float(loss)
        first = loss if first is None else first
        last = loss
        if verbose and (step % 25 == 0 or step == num_steps - 1):
            print(f"step {step:3d}  arc-length L2 loss {loss:.5f}")
    return first, last


if __name__ == "__main__":
    first, last = run()
    print(f"loss {first:.5f} -> {last:.5f}")
    assert last < first * 0.5, "training did not converge"
    print("OK")
