"""Differential fuzz of the native DCT band encoder vs the numpy fallback.

The native engine (``pipeline/csrc/dctpack.cpp``) has distinct code paths —
an SSE2 16-value bitplane loop, a scalar 8-value tail for row widths that
are not multiples of 16, the scalar DC-band predictor path, a rare-branch
exception slow path, and the high-bitplane (b > 8) emit — and the numpy
backend (``_CompsetEncoder._build_numpy_state``) is the executable spec
they must all match byte-for-byte. The JPEG-level equivalence test
(``test_dct_wire.py::test_native_and_numpy_encoders_equivalent``) only sees
the widths/content one photo-like batch produces; this fuzz drives the
encoder directly with synthetic band arrays that force every path:

* row widths with ``bwp % 16 == 8`` (scalar tail after the vector loop),
* forced widths b in {0, 1, 9, 12} regardless of the optimizer's choice
  (b = 0 exercises exception-only groups, b > 8 the high-plane emit),
* heavy-tailed values up to the |coef| <= 2047 reader contract
  (``jpegdec.cpp ajd_read_dct``) so exceptions hit the vector slow path,
* exception capacity exactly at, below, and above the true count
  (below = the clip contract: entries beyond ``cap`` dropped, TRUE count
  still returned),
* all three DC predictor modes.

Reference test-strategy anchor: the golden-model dual-implementation
pattern (SURVEY §4), e.g. draw_heatmap's numpy reference vs CUDA kernels.
"""

import numpy as np
import pytest

from accvlab_tpu.pipeline import dct_native
from accvlab_tpu.pipeline.processing_steps.dct_wire import _CompsetEncoder

pytestmark = pytest.mark.skipif(
    dct_native.get_lib() is None, reason="native DCT encoder unavailable"
)

_MODES = (0, 1, 2)


def _make_bands(rng, nb, bh, bwp):
    """Heavy-tailed synthetic bands within the |coef| <= 2047 contract."""
    small = rng.geometric(0.55, size=(nb, bh, bwp)).astype(np.int16) - 1
    sign = rng.choice([-1, 1], size=small.shape).astype(np.int16)
    bands = small * sign
    # sparse heavy tail: a few percent of values use the full range
    tail = rng.random(size=bands.shape) < 0.03
    bands[tail] = rng.integers(-2047, 2048, size=int(tail.sum()), dtype=np.int16)
    return np.ascontiguousarray(bands)


def _random_groups(rng, nb):
    """Contiguous partition with the mandatory (0, 1) DC group first."""
    cuts = sorted(
        set([1, nb])
        | set(int(c) for c in rng.integers(1, nb, size=rng.integers(0, 5)))
    )
    bounds = [0] + cuts
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def _numpy_encoder(bands, groups, monkeypatch):
    with monkeypatch.context() as m:
        m.setattr(dct_native, "get_lib", lambda: None)
        return _CompsetEncoder(bands, groups)


@pytest.mark.parametrize("case", range(12))
def test_native_matches_numpy_on_synthetic_bands(case, monkeypatch):
    rng = np.random.default_rng(1000 + case)
    nb = int(rng.integers(2, 20))
    bh = int(rng.integers(1, 15))
    # always include the scalar-tail widths; case parity picks %16==8 ones
    bwp = int(rng.choice([8, 24, 40, 56] if case % 2 else [16, 32, 64, 128]))
    bands = _make_bands(rng, nb, bh, bwp)
    groups = _random_groups(rng, nb)

    enc_nat = _CompsetEncoder(bands, groups)
    enc_np = _numpy_encoder(bands, groups, monkeypatch)
    assert enc_nat._native and not enc_np._native

    # fits tables (drive both the AC analyze and the 3-mode DC analyze)
    for mode in _MODES:
        np.testing.assert_array_equal(
            enc_nat.fits(0, mode), enc_np.fits(0, mode), err_msg=f"DC mode {mode}"
        )
    for g in range(1, len(groups)):
        np.testing.assert_array_equal(
            enc_nat.fits(g, 0), enc_np.fits(g, 0), err_msg=f"group {g}"
        )

    # pack at forced widths, every group, rotating DC mode
    dc_mode = case % 3
    for g in range(len(groups)):
        for b in (0, 1, 9, 12):
            true_exc = enc_nat.exceptions_at(g, dc_mode, b)
            cap = true_exc + 5
            p1 = np.full((cap,), -1, np.int32)
            v1 = np.zeros((cap,), np.int16)
            p2 = p1.copy()
            v2 = v1.copy()
            bp1, ne1 = enc_nat.pack_group_into(g, dc_mode, b, p1, v1, 0)
            bp2, ne2 = enc_np.pack_group_into(g, dc_mode, b, p2, v2, 0)
            ctx = f"case {case} g={g} b={b} dc_mode={dc_mode} bwp={bwp}"
            assert ne1 == ne2 == true_exc, ctx
            np.testing.assert_array_equal(bp1, bp2, err_msg=ctx)
            np.testing.assert_array_equal(p1, p2, err_msg=ctx)
            np.testing.assert_array_equal(v1, v2, err_msg=ctx)


def test_capacity_clip_returns_true_count(monkeypatch):
    """Entries beyond ``cap`` are dropped but the TRUE count is returned,
    and the written prefix (ascending positions) matches the numpy path."""
    rng = np.random.default_rng(7)
    bands = _make_bands(rng, 6, 9, 24)
    groups = [(0, 1), (1, 6)]
    enc_nat = _CompsetEncoder(bands, groups)
    enc_np = _numpy_encoder(bands, groups, monkeypatch)

    b = 1  # narrow width -> plenty of exceptions
    true_exc = enc_nat.exceptions_at(1, 0, b)
    assert true_exc > 8, "fixture must produce exceptions"
    for cap in (0, 1, true_exc // 2, true_exc, true_exc + 3):
        p1 = np.full((cap,), -1, np.int32)
        v1 = np.zeros((cap,), np.int16)
        p2, v2 = p1.copy(), v1.copy()
        bp1, ne1 = enc_nat.pack_group_into(1, 0, b, p1, v1, 0)
        bp2, ne2 = enc_np.pack_group_into(1, 0, b, p2, v2, 0)
        assert ne1 == ne2 == true_exc, f"cap={cap}"
        np.testing.assert_array_equal(bp1, bp2, err_msg=f"cap={cap}")
        np.testing.assert_array_equal(p1, p2, err_msg=f"cap={cap}")
        np.testing.assert_array_equal(v1, v2, err_msg=f"cap={cap}")
        wrote = min(cap, true_exc)
        if wrote:  # ascending scan order within the written prefix
            assert (np.diff(p1[:wrote]) > 0).all(), f"cap={cap}"


def test_nonzero_start_offset_appends(monkeypatch):
    """Appending at ne > 0 (the unified per-compset exception list)."""
    rng = np.random.default_rng(11)
    bands = _make_bands(rng, 4, 5, 40)
    groups = [(0, 1), (1, 4)]
    enc_nat = _CompsetEncoder(bands, groups)
    enc_np = _numpy_encoder(bands, groups, monkeypatch)

    cap = 4096
    p1 = np.full((cap,), -1, np.int32)
    v1 = np.zeros((cap,), np.int16)
    p2, v2 = p1.copy(), v1.copy()
    ne1 = ne2 = 0
    for g, b in ((0, 2), (1, 1)):
        bp1, ne1 = enc_nat.pack_group_into(g, 2, b, p1, v1, ne1)
        bp2, ne2 = enc_np.pack_group_into(g, 2, b, p2, v2, ne2)
        np.testing.assert_array_equal(bp1, bp2, err_msg=f"g={g}")
    assert ne1 == ne2 <= cap
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(v1, v2)
