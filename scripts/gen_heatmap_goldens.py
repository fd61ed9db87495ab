#!/usr/bin/env python
"""Generate reference-derived golden heatmap artifacts.

Pure-numpy SCALAR oracle of the reference CUDA kernels
(``draw_heatmap_cuda_kernel.cuh:36-109``): per-target box clipping
(left/right/top/bottom as min(x,r)/min(W-x,r+1)/...), the
diameter->sigma->var->var_inv arithmetic order, ``exp(-(ii+jj)*var_inv)*k``
per pixel, and float max combine. The only deviation from the reference is
pinned and documented: exp and the two divisions use the repo's
bit-reproducible definitions (``repro_exp.exp_f32_np`` /
``div_f32_np``) because CUDA's expf / XLA's exp / libm are three different
<=2-ulp approximations — no portable artifact can reproduce CUDA's exact
bits, so the goldens pin a portable definition with equal-or-better
accuracy instead.

No JAX import anywhere: the artifact is independent of the implementation
under test. Run from the repo root:

    python scripts/gen_heatmap_goldens.py

writes tests/data/goldens/heatmap_goldens.npz (committed in-tree).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accvlab_tpu.heatmap.repro_exp import div_f32_np, exp_f32_np  # noqa: E402

F32 = np.float32


def draw_gaussian_scalar(heatmap2d, x, y, radius, factor, k_scale):
    """One target onto one (H, W) map — the reference's draw_gaussian
    (cuh:36-48) with its clipping (cuh:66-69), scalar loops."""
    h, w = heatmap2d.shape
    diameter = F32(2 * radius + 1)
    sigma = div_f32_np(diameter, F32(factor))
    var = F32(F32(2.0) * sigma * sigma)
    var_inv = div_f32_np(F32(1.0), var)
    left = min(x, radius)
    right = min(w - x, radius + 1)
    top = min(y, radius)
    bottom = min(h - y, radius + 1)
    for i in range(-top, bottom):
        ii = F32(i * i)
        for j in range(-left, right):
            jj = F32(j * j)
            g = F32(exp_f32_np(F32(-(ii + jj) * var_inv)) * F32(k_scale))
            if g > heatmap2d[y + i, x + j]:  # atomicMax (cuh:26-34)
                heatmap2d[y + i, x + j] = g


def gen_batched(rng, b, t, h, w, factor, k_scale, classwise_c=None):
    sizes = rng.integers(0, t + 1, (b,)).astype(np.int32)
    sizes[0] = t  # ensure at least one full sample
    centers = rng.integers(0, [w, h], (b, t, 2)).astype(np.int32)
    radii = rng.integers(1, max(2, min(h, w) // 2), (b, t)).astype(np.int32)
    if classwise_c is not None:
        labels = rng.integers(0, classwise_c, (b, t)).astype(np.int32)
        hm = np.zeros((b, classwise_c, h, w), np.float32)
        for bb in range(b):
            for tt in range(sizes[bb]):
                draw_gaussian_scalar(
                    hm[bb, labels[bb, tt]],
                    int(centers[bb, tt, 0]),
                    int(centers[bb, tt, 1]),
                    int(radii[bb, tt]),
                    factor,
                    k_scale,
                )
        return dict(
            heatmap=hm, centers=centers, radii=radii, labels=labels,
            sizes=sizes, factor=np.float32(factor), k_scale=np.float32(k_scale),
        )
    hm = np.zeros((b, h, w), np.float32)
    for bb in range(b):
        for tt in range(sizes[bb]):
            draw_gaussian_scalar(
                hm[bb],
                int(centers[bb, tt, 0]),
                int(centers[bb, tt, 1]),
                int(radii[bb, tt]),
                factor,
                k_scale,
            )
    return dict(
        heatmap=hm, centers=centers, radii=radii, sizes=sizes,
        factor=np.float32(factor), k_scale=np.float32(k_scale),
    )


def gen_flat(rng, n_maps, t, h, w, factor, k_scale):
    centers = rng.integers(0, [w, h], (t, 2)).astype(np.int32)
    radii = rng.integers(1, max(2, min(h, w) // 2), (t,)).astype(np.int32)
    idxes = rng.integers(0, n_maps, (t,)).astype(np.int32)
    hm = np.zeros((n_maps, h, w), np.float32)
    for tt in range(t):
        draw_gaussian_scalar(
            hm[idxes[tt]], int(centers[tt, 0]), int(centers[tt, 1]),
            int(radii[tt]), factor, k_scale,
        )
    return dict(
        heatmap=hm, centers=centers, radii=radii, idxes=idxes,
        factor=np.float32(factor), k_scale=np.float32(k_scale),
    )


def gen_layout_combine(rng, lengths, inner):
    """Batch-layout golden for combine_data: per-sample (n_i, inner) arrays
    -> zero-padded (B, max_n, inner) tensor + mask + sizes (the reference's
    layout contract, batched_processing_py.py:412: torch.zeros then row
    fill)."""
    samples = [rng.normal(size=(n, inner)).astype(np.float32) for n in lengths]
    b = len(lengths)
    m = max(lengths)
    tensor = np.zeros((b, m, inner), np.float32)
    mask = np.zeros((b, m), bool)
    for i, s in enumerate(samples):
        tensor[i, : len(s)] = s
        mask[i, : len(s)] = True
    return dict(
        concat=np.concatenate(samples, axis=0),
        lengths=np.asarray(lengths, np.int32),
        tensor=tensor,
        mask=mask,
        sizes=np.asarray(lengths, np.int32),
    )


def gen_layout_compact(rng, b, n, inner):
    """Batch-layout golden for get_compact_lists: masked gather preserving
    order, zero filler (batched_processing_py.py:200-272)."""
    mask = rng.random((b, n)) < 0.4
    mask[0, :] = False  # empty sample
    values = rng.normal(size=(b, n, inner)).astype(np.float32)
    sizes = mask.sum(axis=1).astype(np.int32)
    m = int(sizes.max())
    compact = np.zeros((b, m, inner), np.float32)
    out_mask = np.zeros((b, m), bool)
    for i in range(b):
        sel = values[i][mask[i]]
        compact[i, : len(sel)] = sel
        out_mask[i, : len(sel)] = True
    return dict(
        mask=mask, values=values, compact=compact, out_mask=out_mask, sizes=sizes
    )


def main():
    out = {}
    rng = np.random.default_rng(2026)
    # batched: reference benchmark shape (48 samples, 20x50 maps, 50 targets)
    for name, cfg in {
        "batched_ref_shape": dict(b=8, t=24, h=20, w=50, factor=6.0, k_scale=1.0),
        "batched_large_radii": dict(b=3, t=6, h=40, w=56, factor=6.0, k_scale=1.0),
        "batched_factor3_k05": dict(b=4, t=8, h=24, w=24, factor=3.0, k_scale=0.5),
    }.items():
        for key, arr in gen_batched(rng, **cfg).items():
            out[f"{name}/{key}"] = arr
    for key, arr in gen_batched(
        rng, b=3, t=10, h=20, w=28, factor=6.0, k_scale=1.0, classwise_c=5
    ).items():
        out[f"classwise/{key}"] = arr
    for key, arr in gen_flat(rng, n_maps=6, t=30, h=24, w=40, factor=6.0, k_scale=1.0).items():
        out[f"flat/{key}"] = arr
    for key, arr in gen_layout_combine(rng, [3, 0, 7, 1, 5], inner=4).items():
        out[f"layout_combine/{key}"] = arr
    for key, arr in gen_layout_compact(rng, b=6, n=15, inner=3).items():
        out[f"layout_compact/{key}"] = arr

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests", "data", "goldens"
    )
    os.makedirs(path, exist_ok=True)
    dest = os.path.join(path, "heatmap_goldens.npz")
    np.savez_compressed(dest, **out)
    total = sum(v.nbytes for v in out.values())
    print(f"wrote {dest} ({len(out)} arrays, {total/1024:.0f} KiB raw)")


if __name__ == "__main__":
    main()
