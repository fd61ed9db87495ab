"""Bit-reproducible float32 exp and division for heatmap rasterization.

The reference kernel computes ``expf(-(ii+jj) * var_inv) * k_scale``
(``draw_heatmap_cuda_kernel.cuh:36-48``). CUDA's ``expf`` is a
hardware-specific approximation (documented <= 2 ulp); XLA's ``exp`` is a
different approximation per backend (Eigen on CPU, transcendental unit on
TPU), and numpy's libm is a third. Bit-exact golden artifacts therefore
require pinning ONE exp definition that every implementation reproduces
exactly.

Why this is harder than writing a polynomial: XLA's backends apply
fp-contraction — a ``mul`` whose only consumer is an ``add`` may be fused
into an FMA, skipping the intermediate rounding, and WHETHER it fuses
depends on vectorization context (measured: the same graph contracts at one
array size and not at another). So the pinned algorithm is built only from
contraction-immune pieces:

* **Dekker exact products** — Veltkamp-split partial products are exact in
  f32, so contracting them into FMAs cannot change any value, and the
  rounded product itself is multiply-used (live in the error term), so it
  can never be folded away into an FMA.
* **2Sum / plain additions** — fp-contraction only fuses mul+add pairs;
  pure add/sub chains round deterministically.
* **exponent bitcasts** — integer ops.

``exp_f32``: Cody-Waite two-constant reduction (musl's ``ln2_hi``/``ln2_lo``
split; ``x - k*ln2_hi`` is Sterbenz-exact, the ``k*ln2_lo`` product is
Dekker-protected) + degree-6 Taylor evaluated in compensated (double-single)
Horner form, rounded once at the end. Accuracy: ~0.5 ulp from correctly
rounded — better than CUDA's expf. Domain: x <= 0; inputs below -87.3 flush
to +0.0 like ``expf`` underflow.

``div_f32``: correctly-rounded division (XLA lowers f32 division to a fast
reciprocal-multiply, measured up to 2 ulp off) — computes the backend's
approximate quotient, then selects among its +-2-ulp neighbors the value
minimizing the EXACT residual ``|a - y*b|`` (Dekker products again), which
is the correctly-rounded quotient, bit-identical to numpy's IEEE division.

Every function has a numpy twin (``*_np``) used by the scalar golden oracle
and the committed golden artifacts: numpy's f32 ops are plain IEEE
(no contraction), so the twins produce identical bits by construction.
"""

from __future__ import annotations

import numpy as np

_F32 = np.float32
LOG2E = _F32(1.4426950408889634)
# musl expf split: ln2_hi has zeroed low bits so k*ln2_hi is exact for |k|<2^9
LN2_HI = _F32(0.693145751953125)  # 0x1.62e400p-1
LN2_LO = _F32(1.428606765330187e-06)  # 0x1.7f7d1cp-20
# Taylor exp(t) = sum t^n / n!
_COEFFS = tuple(
    _F32(v) for v in (1.0, 1.0, 0.5, 1.0 / 6, 1.0 / 24, 1.0 / 120, 1.0 / 720)
)
_MIN_X = _F32(-87.0)  # exp(-87) ~ 1.6e-38, just above f32 min normal
_SPLIT = _F32(4097.0)  # Veltkamp split constant, 2^12 + 1


# ---------------------------------------------------------------------- #
# jnp implementation (usable inside jit, vmap, and Pallas kernels)       #
# ---------------------------------------------------------------------- #


def _dekker_mul(x, y):
    """Rounded product + exact error: x*y == p + err.

    All partial products of the Veltkamp halves are exact in f32, so FMA
    contraction cannot change them; p is live in the error expression, so it
    is always materialized with its own rounding.
    """
    p = x * y
    c = _SPLIT * x
    xh = c - (c - x)
    xl = x - xh
    d = _SPLIT * y
    yh = d - (d - y)
    yl = y - yh
    err = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
    return p, err


def _two_sum(a, b):
    """Rounded sum + exact error (Knuth 2Sum; additions only)."""
    s = a + b
    z = s - a
    e = (a - (s - z)) + (b - z)
    return s, e


def exp_f32(x):
    """Pinned bit-reproducible f32 exp (jnp; see module docstring)."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x, jnp.float32)
    k = jnp.rint(x * LOG2E).astype(jnp.int32)
    kf = k.astype(jnp.float32)
    s = x - kf * LN2_HI  # Sterbenz-exact (k*ln2_hi is an exact product)
    b, _berr = _dekker_mul(kf, jnp.full_like(kf, LN2_LO))
    t = s - b  # _berr (~2^-40 relative) is dropped in both twins alike
    hi = jnp.full_like(t, _COEFFS[6])
    lo = jnp.zeros_like(t)
    for c in _COEFFS[5::-1]:
        qh, qe = _dekker_mul(hi, t)
        lh, le = _dekker_mul(lo, t)
        rh, re = _two_sum(qh, jnp.full_like(qh, c))
        hi = rh
        lo = (qe + lh) + (re + le)
    kk = jnp.clip(k, -126, 126)
    scale = jax.lax.bitcast_convert_type((kk + 127) << 23, jnp.float32)
    r = hi + lo
    return jnp.where(x < _MIN_X, jnp.float32(0.0), r * scale)


def div_f32(a, b):
    """Correctly-rounded f32 division for jit graphs (see module docstring).

    Intended domain: positive normal a, b (gaussian radii/variances); cost
    ~40 flops, used per target only.
    """
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    a, b = jnp.broadcast_arrays(a, b)
    y0 = a / b
    yi = jax.lax.bitcast_convert_type(y0, jnp.int32)
    best_r = jnp.full_like(a, jnp.inf)
    best_y = y0
    for delta in (-2, -1, 0, 1, 2):
        yc = jax.lax.bitcast_convert_type(yi + delta, jnp.float32)
        p, err = _dekker_mul(yc, b)
        r = jnp.abs((a - p) - err)
        take = r < best_r
        best_y = jnp.where(take, yc, best_y)
        best_r = jnp.where(take, r, best_r)
    return best_y


# ---------------------------------------------------------------------- #
# numpy twins (golden oracle; numpy f32 ops are plain IEEE)              #
# ---------------------------------------------------------------------- #


def _dekker_mul_np(x, y):
    p = (x * y).astype(np.float32)
    c = (_SPLIT * x).astype(np.float32)
    xh = (c - (c - x).astype(np.float32)).astype(np.float32)
    xl = (x - xh).astype(np.float32)
    d = (_SPLIT * y).astype(np.float32)
    yh = (d - (d - y).astype(np.float32)).astype(np.float32)
    yl = (y - yh).astype(np.float32)
    err = (
        ((xh * yh).astype(np.float32) - p).astype(np.float32)
        + (xh * yl).astype(np.float32)
    ).astype(np.float32)
    err = (err + (xl * yh).astype(np.float32)).astype(np.float32)
    err = (err + (xl * yl).astype(np.float32)).astype(np.float32)
    return p, err


def _two_sum_np(a, b):
    s = (a + b).astype(np.float32)
    z = (s - a).astype(np.float32)
    e = (
        (a - (s - z).astype(np.float32)).astype(np.float32)
        + (b - z).astype(np.float32)
    ).astype(np.float32)
    return s, e


def exp_f32_np(x):
    """numpy twin of :func:`exp_f32` — identical bits by construction."""
    x = np.asarray(x, np.float32)
    k = np.rint(x * LOG2E).astype(np.int32)
    kf = k.astype(np.float32)
    s = (x - (kf * LN2_HI).astype(np.float32)).astype(np.float32)
    b, _berr = _dekker_mul_np(kf, np.full_like(kf, LN2_LO))
    t = (s - b).astype(np.float32)
    hi = np.full_like(t, _COEFFS[6])
    lo = np.zeros_like(t)
    for c in _COEFFS[5::-1]:
        qh, qe = _dekker_mul_np(hi, t)
        lh, le = _dekker_mul_np(lo, t)
        rh, re = _two_sum_np(qh, np.full_like(qh, c))
        hi = rh
        lo = (
            (qe + lh).astype(np.float32) + (re + le).astype(np.float32)
        ).astype(np.float32)
    kk = np.clip(k, -126, 126)
    scale = ((kk.astype(np.int32) + 127) << 23).view(np.float32)
    r = (hi + lo).astype(np.float32)
    return np.where(x < _MIN_X, np.float32(0.0), (r * scale).astype(np.float32))


def div_f32_np(a, b):
    """numpy twin of :func:`div_f32` — numpy's f32 division is already
    IEEE correctly rounded."""
    return (np.asarray(a, np.float32) / np.asarray(b, np.float32)).astype(np.float32)
