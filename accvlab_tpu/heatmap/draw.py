"""Batched Gaussian heatmap rasterization (TPU-native).

Re-design of ACCV-Lab's ``draw_heatmap`` CUDA extension
(``packages/draw_heatmap/accvlab/draw_heatmap/include/draw_heatmap_cuda_kernel.cuh``
and the Python API in ``funtions/draw_heatmap_batched.py:27-84``).

Math parity (``draw_heatmap_cuda_kernel.cuh:36-48``):

* ``diameter = 2 * radius + 1``; ``sigma = diameter / diameter_to_sigma_factor``;
  ``var = 2 * sigma^2``
* a target contributes ``exp(-(dy^2 + dx^2) / var) * k_scale`` to every pixel
  within its Chebyshev-radius box (``|dy| <= r``, ``|dx| <= r`` — the
  left/right/top/bottom clipping in the reference reduces to exactly this for
  in-bounds pixels)
* contributions combine with the existing heatmap via **max** — the
  reference's CAS-based float ``atomicMax`` is order-independent, so a
  deterministic masked max-reduce is bit-identical.

Two implementations, same results:

* ``xla``: dense ``(T, H, W)`` contributions + max-reduce. XLA fuses it; used
  as the golden model and on CPU.
* ``pallas``: one grid step per (sample[, class]); target parameters are read
  from SMEM, the (H, W) tile lives in VMEM, and a ``fori_loop`` over targets
  folds each Gaussian into the tile with ``maximum``. No (T, H, W)
  materialization — this is the TPU speed-of-light path for large T.

All functions are functional (return the new heatmap) — the reference draws
in place; under ``jit``, XLA buffer donation removes the copy.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ragged import RaggedBatch

Array = jax.Array


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _resolve_impl(implementation: str) -> str:
    if implementation == "auto":
        return "pallas" if _on_tpu() else "xla"
    return implementation


def _gauss_params(radii_f32: Array, diameter_to_sigma_factor: float):
    diameter = 2.0 * radii_f32 + 1.0
    sigma = diameter / diameter_to_sigma_factor
    return 2.0 * sigma * sigma


# ---------------------------------------------------------------------- #
# XLA (dense) implementation — golden model                              #
# ---------------------------------------------------------------------- #


def _draw_dense(heatmap, xs, ys, radii, valid, diameter_to_sigma_factor, k_scale):
    """heatmap (H, W); xs/ys/radii/valid (T,) -> new (H, W)."""
    h, w = heatmap.shape
    rows = jnp.arange(h, dtype=jnp.int32)[None, :, None]  # (1, H, 1)
    cols = jnp.arange(w, dtype=jnp.int32)[None, None, :]  # (1, 1, W)
    dy = rows - ys[:, None, None]
    dx = cols - xs[:, None, None]
    r = radii[:, None, None]
    inbox = (jnp.abs(dy) <= r) & (jnp.abs(dx) <= r) & valid[:, None, None]
    var = _gauss_params(radii.astype(jnp.float32), diameter_to_sigma_factor)[:, None, None]
    g = jnp.exp(-(dy * dy + dx * dx).astype(jnp.float32) / var) * k_scale
    contrib = jnp.where(inbox, g, -jnp.inf)
    return jnp.maximum(heatmap, jnp.max(contrib, axis=0, initial=-jnp.inf))


# ---------------------------------------------------------------------- #
# Pallas kernel                                                          #
# ---------------------------------------------------------------------- #


def _heatmap_kernel(
    params_ref,  # SMEM (1, 1, T*4): x, y, radius, select (label or heatmap idx)
    count_ref,  # SMEM (1, 1, 1): number of valid targets (or T)
    hm_ref,  # VMEM (1, H, W) input tile
    out_ref,  # VMEM (1, H, W) output tile
    *,
    num_targets: int,
    diameter_to_sigma_factor: float,
    k_scale: float,
    select_grid_dim: Optional[int],
):
    h, w = out_ref.shape[1], out_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    out_ref[0] = hm_ref[0]
    n = count_ref[0, 0, 0]
    sel = pl.program_id(select_grid_dim) if select_grid_dim is not None else None

    def body(t, _):
        tgt_sel = params_ref[0, 0, 4 * t + 3]
        cond = t < n
        if sel is not None:
            cond = jnp.logical_and(cond, tgt_sel == sel)

        @pl.when(cond)
        def _():
            x = params_ref[0, 0, 4 * t]
            y = params_ref[0, 0, 4 * t + 1]
            r = params_ref[0, 0, 4 * t + 2]
            dy = rows - y
            dx = cols - x
            inbox = (jnp.abs(dy) <= r) & (jnp.abs(dx) <= r)
            sigma = (2.0 * r.astype(jnp.float32) + 1.0) / diameter_to_sigma_factor
            var = 2.0 * sigma * sigma
            g = jnp.exp(-(dy * dy + dx * dx).astype(jnp.float32) / var) * k_scale
            out_ref[0] = jnp.maximum(out_ref[0], jnp.where(inbox, g, -jnp.inf))

        return 0

    jax.lax.fori_loop(0, num_targets, body, 0)


def _pack_params(xs, ys, radii, select):
    """Interleave per-target scalars into an SMEM-friendly (B, T*4) i32 array."""
    stacked = jnp.stack(
        [xs.astype(jnp.int32), ys.astype(jnp.int32), radii.astype(jnp.int32), select.astype(jnp.int32)],
        axis=-1,
    )
    # rank-3 (B, 1, T*4): TPU SMEM block shapes need the last two dims to
    # match the array dims when not tile-aligned
    return stacked.reshape(stacked.shape[0], 1, -1)


def _pallas_draw(heatmap, params, counts, select_grid: bool, factor, k_scale, interpret):
    """heatmap (G0[, G1], H, W); params (G0, T*4); counts (G0, 1)."""
    has_sel = select_grid
    if has_sel:
        g0, g1, h, w = heatmap.shape
        grid = (g0, g1)
        hm_spec = pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        p_spec = pl.BlockSpec((1, 1, params.shape[2]), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM)
        c_spec = pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM)
        sel_dim = 1
    else:
        g0, h, w = heatmap.shape
        grid = (g0,)
        hm_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        p_spec = pl.BlockSpec((1, 1, params.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
        c_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
        sel_dim = None

    num_targets = params.shape[2] // 4
    kernel = functools.partial(
        _heatmap_kernel,
        num_targets=num_targets,
        diameter_to_sigma_factor=factor,
        k_scale=k_scale,
        select_grid_dim=sel_dim,
    )

    if has_sel:
        # Fold the class dim into the kernel via a 4-D block reshaped to 3-D.
        def kernel4(params_ref, count_ref, hm_ref, out_ref):
            kernel(params_ref, count_ref, hm_ref.at[0], out_ref.at[0])

        body, hspec = kernel4, hm_spec
    else:
        body, hspec = kernel, hm_spec

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[p_spec, c_spec, hspec],
        out_specs=hspec,
        out_shape=jax.ShapeDtypeStruct(heatmap.shape, heatmap.dtype),
        interpret=interpret,
    )(params, counts, heatmap)


# ---------------------------------------------------------------------- #
# Optimized batched kernel (one grid step, in-kernel sample loop)        #
# ---------------------------------------------------------------------- #
#
# Loop iterations are far cheaper than grid steps on TPU; processing all
# samples inside one grid step with (T, P) 2-D vector math measured 0.185 ms
# for the reference's 48x20x50/T=50 benchmark vs 0.30 ms for the per-sample
# grid kernel and 0.24 ms for the fused-XLA path (docs/performance.md).
# Invalid targets are pre-masked with radius -1 (inbox never true), and the
# inverse variance is precomputed on the host side of the trace.


def _batched_kernel(xs_ref, ys_ref, rr_ref, iv_ref, hm_ref, out_ref, *, width, k_scale):
    num_samples = out_ref.shape[0]
    p = out_ref.shape[2]
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    py = (pid // width).astype(jnp.float32)
    px = (pid % width).astype(jnp.float32)

    def body(s, _):
        xs = xs_ref[s]
        ys = ys_ref[s]
        rr = rr_ref[s]
        iv = iv_ref[s]
        dy = py - ys
        dx = px - xs
        inbox = (jnp.abs(dy) <= rr) & (jnp.abs(dx) <= rr)
        g = jnp.exp(-(dy * dy + dx * dx) * iv) * k_scale
        contrib = jnp.where(inbox, g, -jnp.inf)
        drawn = jnp.max(contrib, axis=0, keepdims=True)
        out_ref[s] = jnp.maximum(hm_ref[s], drawn)
        return 0

    jax.lax.fori_loop(0, num_samples, body, 0)


def _pallas_draw_batched(heatmap, centers_t, radii_t, nums, factor, k_scale, interpret):
    b, h, w = heatmap.shape
    t = radii_t.shape[1]
    valid = jnp.arange(t, dtype=jnp.int32)[None, :] < nums[:, None]
    radii_f = radii_t.astype(jnp.float32)
    rr_masked = jnp.where(valid, radii_f, -1.0)[:, :, None]
    sigma = (2.0 * radii_f + 1.0) / factor
    inv_var = (1.0 / (2.0 * sigma * sigma))[:, :, None]
    xs = centers_t[:, :, 0].astype(jnp.float32)[:, :, None]
    ys = centers_t[:, :, 1].astype(jnp.float32)[:, :, None]
    hm_flat = heatmap.reshape(b, 1, h * w)
    kernel = functools.partial(_batched_kernel, width=w, k_scale=k_scale)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((b, t, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((b, 1, h * w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, 1, h * w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, h * w), heatmap.dtype),
        interpret=interpret,
    )(xs, ys, rr_masked, inv_var, hm_flat)
    return out.reshape(b, h, w)


# ---------------------------------------------------------------------- #
# Public API                                                             #
# ---------------------------------------------------------------------- #


def draw_heatmap(
    heatmaps: Array,
    centers: Array,
    radii: Array,
    heatmap_idxes: Array,
    diameter_to_sigma_factor: float = 6.0,
    k_scale: float = 1.0,
    implementation: str = "auto",
) -> Array:
    """Flattened-format heatmap drawing (explicit per-target heatmap indices).

    Parity: reference ``draw_heatmap`` binding (``csrc/draw_heatmap.cpp:132``;
    kernel ``draw_heatmap_cuda_kernel``). Functional: returns the new
    heatmaps.

    Args:
        heatmaps: ``(num_heatmaps, H, W)`` float32.
        centers: ``(num_targets, 2)`` int — x, y per target.
        radii: ``(num_targets,)`` int.
        heatmap_idxes: ``(num_targets,)`` int — destination heatmap per target.
    """
    heatmaps = jnp.asarray(heatmaps, jnp.float32)
    centers = jnp.asarray(centers, jnp.int32)
    radii = jnp.asarray(radii, jnp.int32)
    heatmap_idxes = jnp.asarray(heatmap_idxes, jnp.int32)
    impl = _resolve_impl(implementation)
    num_maps = heatmaps.shape[0]
    t = centers.shape[0]

    if impl == "xla":
        def per_map(n):
            return _draw_dense(
                heatmaps[n],
                centers[:, 0],
                centers[:, 1],
                radii,
                heatmap_idxes == n,
                diameter_to_sigma_factor,
                k_scale,
            )

        return jax.vmap(per_map)(jnp.arange(num_maps))

    if _on_tpu():
        # the per-heatmap tile kernel's (H, W) ref views need lane-aligned
        # widths on real TPUs; the fused-XLA path is equally fast at flat
        # sizes, so it is the TPU implementation of record
        def per_map(n):
            return _draw_dense(
                heatmaps[n], centers[:, 0], centers[:, 1], radii,
                heatmap_idxes == n, diameter_to_sigma_factor, k_scale,
            )

        return jax.vmap(per_map)(jnp.arange(num_maps))
    params = _pack_params(centers[:, 0], centers[:, 1], radii, heatmap_idxes).reshape(1, 1, t * 4)
    counts = jnp.full((1, 1, 1), t, dtype=jnp.int32)
    return _pallas_draw_flat(
        heatmaps, params, counts, diameter_to_sigma_factor, k_scale, interpret=True
    )


def _pallas_draw_flat(heatmaps, params, counts, factor, k_scale, interpret):
    """Flat variant: grid over heatmaps, target selected by heatmap index."""
    n_maps, h, w = heatmaps.shape
    num_targets = params.shape[2] // 4
    kernel = functools.partial(
        _heatmap_kernel,
        num_targets=num_targets,
        diameter_to_sigma_factor=factor,
        k_scale=k_scale,
        select_grid_dim=0,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_maps,),
        in_specs=[
            pl.BlockSpec((1, 1, params.shape[2]), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(heatmaps.shape, heatmaps.dtype),
        interpret=interpret,
    )(params[0:1], counts[0:1], heatmaps)


def draw_heatmap_batched(
    heatmap: Array,
    centers: RaggedBatch,
    radii: RaggedBatch,
    diameter_to_sigma_factor: float = 6.0,
    k_scale: float = 1.0,
    labels: Optional[RaggedBatch] = None,
    implementation: str = "auto",
) -> Array:
    """Draw heatmaps for a batch of samples (optionally classwise).

    Parity: ``funtions/draw_heatmap_batched.py:27-84`` /
    ``draw_heatmap_batched_cuda_kernel``. Functional: returns the new heatmap.

    Args:
        heatmap: ``(batch, H, W)`` — or ``(batch, num_classes, H, W)`` when
            ``labels`` is given.
        centers: RaggedBatch ``(batch, max_num_targets, 2)`` (x, y).
        radii: RaggedBatch ``(batch, max_num_targets)``.
        labels: optional RaggedBatch ``(batch, max_num_targets)`` of class ids.
    """
    heatmap = jnp.asarray(heatmap, jnp.float32)
    centers_t = jnp.asarray(centers.tensor, jnp.int32)
    radii_t = jnp.asarray(radii.tensor, jnp.int32)
    assert centers_t.shape[0] == radii_t.shape[0], (
        "centers and radii must have the same size batch size"
    )
    assert centers_t.shape[1] == radii_t.shape[1], (
        "centers and radii must have the same maximum number of objects"
    )
    nums = centers.sample_sizes.astype(jnp.int32)
    impl = _resolve_impl(implementation)

    if labels is None:
        if impl == "xla":
            return jax.vmap(
                lambda hm, xs, ys, rr, n: _draw_dense(
                    hm,
                    xs,
                    ys,
                    rr,
                    jnp.arange(rr.shape[0]) < n,
                    diameter_to_sigma_factor,
                    k_scale,
                )
            )(heatmap, centers_t[:, :, 0], centers_t[:, :, 1], radii_t, nums)
        return _pallas_draw_batched(
            heatmap,
            centers_t,
            radii_t,
            nums,
            diameter_to_sigma_factor,
            k_scale,
            interpret=not _on_tpu(),
        )

    labels_t = jnp.asarray(labels.tensor, jnp.int32)
    assert centers_t.shape[0] == labels_t.shape[0], (
        "centers and labels must have the same size batch size"
    )
    assert centers_t.shape[1] == labels_t.shape[1], (
        "centers and labels must have the same maximum number of objects"
    )
    num_classes = heatmap.shape[1]

    if impl == "xla":
        def per_sample(hm, xs, ys, rr, lab, n):
            # (T, H, W) contributions once, then a deterministic scatter-max
            # into class channels (O(T*H*W), not O(T*C*H*W))
            t = rr.shape[0]
            h, w = hm.shape[1], hm.shape[2]
            valid = jnp.arange(t) < n
            rows = jnp.arange(h, dtype=jnp.int32)[None, :, None]
            cols = jnp.arange(w, dtype=jnp.int32)[None, None, :]
            dy = rows - ys[:, None, None]
            dx = cols - xs[:, None, None]
            r = rr[:, None, None]
            inbox = (jnp.abs(dy) <= r) & (jnp.abs(dx) <= r) & valid[:, None, None]
            var = _gauss_params(rr.astype(jnp.float32), diameter_to_sigma_factor)[
                :, None, None
            ]
            g = jnp.exp(-(dy * dy + dx * dx).astype(jnp.float32) / var) * k_scale
            contrib = jnp.where(inbox, g, -jnp.inf)
            safe_lab = jnp.clip(lab, 0, num_classes - 1)
            drawn = jax.ops.segment_max(contrib, safe_lab, num_segments=num_classes)
            return jnp.maximum(hm, drawn)

        return jax.vmap(per_sample)(
            heatmap, centers_t[:, :, 0], centers_t[:, :, 1], radii_t, labels_t, nums
        )

    if _on_tpu():
        # the per-(sample, class) tile kernel's (H, W) ref views need
        # lane-aligned widths on real TPUs; the segment-max XLA path is the
        # TPU classwise implementation of record
        def per_sample(hm, xs, ys, rr, lab, n):
            t = rr.shape[0]
            h, w = hm.shape[1], hm.shape[2]
            valid = jnp.arange(t) < n
            rows = jnp.arange(h, dtype=jnp.int32)[None, :, None]
            cols = jnp.arange(w, dtype=jnp.int32)[None, None, :]
            dy = rows - ys[:, None, None]
            dx = cols - xs[:, None, None]
            r = rr[:, None, None]
            inbox = (jnp.abs(dy) <= r) & (jnp.abs(dx) <= r) & valid[:, None, None]
            var = _gauss_params(rr.astype(jnp.float32), diameter_to_sigma_factor)[
                :, None, None
            ]
            g = jnp.exp(-(dy * dy + dx * dx).astype(jnp.float32) / var) * k_scale
            contrib = jnp.where(inbox, g, -jnp.inf)
            safe_lab = jnp.clip(lab, 0, num_classes - 1)
            drawn = jax.ops.segment_max(contrib, safe_lab, num_segments=num_classes)
            return jnp.maximum(hm, drawn)

        return jax.vmap(per_sample)(
            heatmap, centers_t[:, :, 0], centers_t[:, :, 1], radii_t, labels_t, nums
        )
    params = _pack_params(centers_t[:, :, 0], centers_t[:, :, 1], radii_t, labels_t)
    return _pallas_draw(
        heatmap,
        params,
        nums[:, None, None],
        True,
        diameter_to_sigma_factor,
        k_scale,
        interpret=True,
    )
