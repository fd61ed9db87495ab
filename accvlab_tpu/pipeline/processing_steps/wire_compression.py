"""Lossless host->device wire compression for uint8 plane fields.

On remote- or PCIe-attached accelerators the host->device wire is often the
binding constraint of an input pipeline (this repo's headline bench is wire-
bound at 15-27 MB/s through the remote-attach tunnel; the reference ships raw
NV12 bytes over NVLink/PCIe, ``ColorSpace.cu:227-283``, where the same
constraint appears at larger scale). Generic byte compressors (zstd/LZ4)
cannot help here: the receiving end of the wire is the accelerator itself —
there is no host CPU on the far side to decompress. The decompressor must be
*part of the jitted device program*.

This module implements exactly that, TPU-first:

* :class:`WirePlanePacker` — a host batch-level step that losslessly encodes
  uint8 plane fields (images, Y/CbCr planes) into a bitplane-packed
  predictive code (numpy, vectorized).
* :class:`WirePlaneUnpacker` — the matching device step whose decode is pure
  XLA: fixed-shape reshape/shift bit-unpacking (no gathers), one bounded
  scatter for the exception list, and one or two cumsums — all fused into
  the pipeline's single batched device program.

Predictors (chosen per batch per field, by measured cost):

* mode 1 — "vertical": ``r[y] = p[y] - p[y-1]`` (row 0 is horizontally
  differenced). Inverse: cumsum row 0 along the row, then cumsum down the
  columns. Robust on high-entropy content.
* mode 2 — "plane": ``r = p - up - left + upleft`` (the 2-D second
  difference). Inverse: cumsum along the row axis, then down the columns —
  still fully parallel, and ~25% fewer bits than vertical on photographic
  content (the MED/Paeth predictors compress similarly but need a
  sequential 2-D wavefront to invert — unusable on a vector machine).

Wire format (per plane field ``F`` of shape ``(H, d1, ...)``, row width
``Wr = prod(shape[1:])``, ``Wr % 8 == 0``):

* ``F_wire_bp``    uint8 ``(b, H, Wr/8)`` — bitplanes (LSB first) of the
  zigzag-mapped residual; plane ``k`` holds bit ``k``, 8 values per byte
  along the row (``np.packbits`` big-bit-order).
* ``F_wire_excp``  int32 ``(E,)`` — flat indices (into the ``(H, Wr)``
  residual array) of values needing more than ``b`` bits ("patched
  frame-of-reference" exceptions); padded with ``H*Wr`` (out of range,
  dropped by the device scatter).
* ``F_wire_excv``  int16 ``(E,)`` — the full zigzag residual at those
  positions (zigzag fits 10 bits); padding zeros.
* ``F_wire_mode``  uint8 ``(mode, d2, ...)`` — zeros; its SHAPE carries the
  predictor mode (leading axis length 1 or 2) and the plane's trailing
  layout BEYOND the row axis (``d1``, the horizontal-cumsum axis, is
  reconstructed as ``Wr / prod(d2...)`` from ``bp``'s shape — shipping it
  would waste ``mode*Wr`` zero bytes per plane on the very wire this codec
  shrinks). Shapes are part of the jit cache key, so each mode compiles
  its own correct program variant.

``b`` and the predictor mode are chosen per batch (total measured cost over
samples) and ``E`` is the per-batch max exception count bucketed to a power
of two — so the device program shapes are uniform within a batch and stable
across batches of similar content.

Decoded output is **bit-identical** to the input plane: residuals are exact
integer differences, the cumsums telescope back to the original values.

Measured on the headline bench content (synthetic quality-90 JPEGs, YUV
4:2:0 wire): plane predictor ~1.59x on Y, ~1.28x on CbCr => ~1.45x fewer
bytes end-to-end (x1.43 measured through the full pipeline incl. field
padding), which converts 1:1 into throughput when the wire is the
bottleneck. Natural imagery compresses better still; on incompressible
noise the codec falls back to the vertical predictor and stays within ~12%
of raw (9 bitplanes).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Union

import numpy as np

from .pipeline_step_base import BatchLevelStepBase, PipelineStepBase
from ..dtypes import DType
from ..sample_data_group import SampleDataGroup

#: wire cost of one exception: int32 position + int16 value
_EXC_BITS = 48
#: minimum exception-list capacity bucket (keeps program-variant churn low)
_MIN_EXC_BUCKET = 64
#: plane-predictor residuals span [-510, 510] -> zigzag <= 1020 -> 10 bits
_MAX_BITS = 10

_SUFFIXES = ("_wire_bp", "_wire_excp", "_wire_excv", "_wire_mode")
_MODE_VERTICAL, _MODE_PLANE = 1, 2


def _zigzag(r: np.ndarray) -> np.ndarray:
    """Map signed residuals to unsigned: 0,-1,1,-2,2 -> 0,1,2,3,4.

    int16 arithmetic throughout (|r| <= 510 so ``r << 1`` fits): ~3x faster
    than widening to int32 on the host encode path, which runs per decoded
    image inside the producer thread."""
    r16 = np.ascontiguousarray(r, np.int16)
    return ((r16 << 1) ^ (r16 >> 15)).view(np.uint16)


def _bit_lengths(zz: np.ndarray) -> np.ndarray:
    """Bits required per value (0 for 0). Test/diagnostic helper — the
    encode path works from the value histogram instead (cheaper)."""
    return np.ceil(np.log2(zz.astype(np.float64) + 1.0)).astype(np.uint8)


def _exceptions_at(hist_cum: np.ndarray, b: int) -> int:
    """count(zz >= 2**b) — values needing more than ``b`` bits."""
    t = 1 << b
    if t > hist_cum.size:
        return 0
    return int(hist_cum[-1] - hist_cum[t - 1])


def _hist_cum(zz: np.ndarray) -> np.ndarray:
    return np.cumsum(np.bincount(zz.ravel(), minlength=1 << _MAX_BITS))


def optimal_width_from_fits(
    fits, n: int, max_bits: int, exc_bits: int = _EXC_BITS
) -> tuple:
    """Cost-optimal base width: minimize ``b*N + exceptions(b)*exc_bits``,
    where ``fits[b] = count(zigzag < 2**b)`` over the N values. The ONE
    width-cost model shared by the pixel codec and the DCT band codec
    (:mod:`dct_wire`); returns ``(b, cost_bits)``."""
    best_b, best_cost = max_bits, max_bits * n
    for b in range(max_bits + 1):
        cost = b * n + (n - int(fits[b])) * exc_bits
        if cost < best_cost:
            best_b, best_cost = b, cost
    return best_b, best_cost


def _optimal_width(zz_or_hist: np.ndarray, n: Optional[int] = None) -> tuple:
    """Pixel-codec entry: accepts either the zigzag value array
    (convenience/tests) or a precomputed cumulative value histogram with
    its element count. Returns ``(b, cost_bits)``."""
    if n is None:
        hist_cum = _hist_cum(np.ravel(zz_or_hist))
        n = int(zz_or_hist.size)
    else:
        hist_cum = zz_or_hist
    fits = [n - _exceptions_at(hist_cum, b) for b in range(_MAX_BITS + 1)]
    return optimal_width_from_fits(fits, n, _MAX_BITS)


def _next_pow2(n: int) -> int:
    p = _MIN_EXC_BUCKET
    while p < n:
        p *= 2
    return p


def _validate_plane(plane: np.ndarray) -> int:
    """Shared shape/dtype contract; returns the flattened row width."""
    if plane.dtype != np.uint8:
        raise TypeError(
            f"WirePlanePacker compresses uint8 planes, got {plane.dtype}"
        )
    if plane.ndim < 2:
        raise ValueError(
            f"WirePlanePacker needs >=2-D planes, got shape {plane.shape}"
        )
    wr = int(np.prod(plane.shape[1:]))
    if wr % 8 != 0:
        raise ValueError(
            f"WirePlanePacker: row width {wr} (shape {plane.shape}) must "
            "be divisible by 8 (bit-packing granularity)"
        )
    return wr


def _residuals(plane: np.ndarray):
    """Both predictors' zigzag residuals for one plane (numpy path).

    -> ``(zz_vertical, zz_plane)``, each ``(H, Wr)`` uint16 (the
    horizontal axis is the plane's axis 1; trailing axes ride along inside
    each row element group, exactly as the device inverse treats them).
    """
    wr = _validate_plane(plane)
    d = plane.astype(np.int16)
    # vertical diffs; row 0 stays raw for now
    rv = d.copy()
    rv[1:] -= d[:-1]
    # horizontal diff along axis 1 (per trailing channel)
    def hdiff(x):
        out = x.copy()
        out[:, 1:] -= x[:, :-1]
        return out

    r1 = rv.copy()
    r1[:1] = hdiff(d[:1])          # vertical mode: row 0 h-differenced
    r2 = hdiff(rv)                 # plane mode: 2-D second difference
    h = plane.shape[0]
    return _zigzag(r1).reshape(h, wr), _zigzag(r2).reshape(h, wr)


def _pack_fields(zz, b, e):
    """Bitplane-pack chosen residuals + exception list (padded to ``e``)."""
    planes = np.empty((b, zz.shape[0], zz.shape[1] // 8), np.uint8)
    for k in range(b):
        planes[k] = np.packbits(((zz >> k) & 1).astype(np.uint8), axis=-1)
    pos = np.flatnonzero(zz >= (1 << b)).astype(np.int32)
    excp = np.full((e,), zz.size, np.int32)
    excv = np.zeros((e,), np.int16)  # zigzag residuals fit 10 bits
    excp[: pos.size] = pos
    excv[: pos.size] = zz.reshape(-1)[pos].astype(np.int16)
    return planes, excp, excv


class _PlaneEncoder:
    """Per-plane encode state behind one interface for two backends.

    The native engine (``pipeline/csrc/wirepack.cpp``, built lazily) does
    residual + zigzag + histogram and the final bitplane/exception emit in
    single cache-friendly passes with no intermediate arrays; the numpy
    fallback materializes both predictors' residual planes. Both produce
    byte-identical wire fields (tested).
    """

    def __init__(self, plane: np.ndarray):
        wr = _validate_plane(plane)
        self.trailing = plane.shape[1:]
        self.n = plane.shape[0] * wr
        self._zz = None
        self._p2d = None
        # trailing elements per step along the horizontal axis 1
        group = 1
        for d in plane.shape[2:]:
            group *= d
        self._group = group
        from .. import wire_native

        p2d = np.ascontiguousarray(plane.reshape(plane.shape[0], wr))
        hists = wire_native.analyze(p2d, group)
        if hists is not None:
            self._p2d = p2d
            self._h = (np.cumsum(hists[0]), np.cumsum(hists[1]))
        else:
            zz1, zz2 = _residuals(plane)
            self._zz = (zz1, zz2)
            self._h = (_hist_cum(zz1), _hist_cum(zz2))

    def hist_cum(self, mode: int) -> np.ndarray:
        return self._h[mode - 1]

    def exceptions_at(self, mode: int, b: int) -> int:
        return _exceptions_at(self.hist_cum(mode), b)

    def pack(self, mode: int, b: int, cap: int):
        if self._p2d is not None:
            from .. import wire_native

            out = wire_native.pack(self._p2d, self._group, mode, b, cap)
            if out is not None:
                return out
            # library vanished mid-run (never observed): numpy fallback
            self._zz = _residuals(self._p2d.reshape((-1,) + tuple(self.trailing)))
        return _pack_fields(self._zz[mode - 1], b, cap)


def compress_plane(plane: np.ndarray, min_exc_capacity: int = _MIN_EXC_BUCKET):
    """Functional host-side encode of one uint8 plane (outside the pipeline).

    Returns ``{"bp", "excp", "excv", "mode"}`` numpy arrays in the wire
    format described in the module docstring; feed them (after transfer) to
    :func:`decompress_plane` inside a jitted program. For batched use with
    uniform shapes, pad to common sizes or use the :class:`WirePlanePacker`
    pipeline step, which does it per batch.
    """
    plane = np.asarray(plane)
    enc = _PlaneEncoder(plane)
    b1, c1 = _optimal_width(enc.hist_cum(_MODE_VERTICAL), enc.n)
    b2, c2 = _optimal_width(enc.hist_cum(_MODE_PLANE), enc.n)
    mode, b = (_MODE_VERTICAL, b1) if c1 <= c2 else (_MODE_PLANE, b2)
    # power-of-two capacity (like the pipeline step): per-call exact sizing
    # would give every batch its own E shape and retrace the caller's jitted
    # decode on every call
    e = max(int(min_exc_capacity), _next_pow2(enc.exceptions_at(mode, b)))
    planes, excp, excv = enc.pack(mode, b, e)
    return {
        "bp": planes,
        "excp": excp,
        "excv": excv,
        "mode": np.zeros((mode,) + plane.shape[2:], np.uint8),
    }


def decompress_plane(fields) -> "jax.Array":  # noqa: F821 - doc type only
    """Functional jit-compatible decode of :func:`compress_plane` output.

    ``fields`` is the dict (or any mapping) of the four wire arrays; returns
    the exact original uint8 plane. Pure XLA — safe to call inside jit/vmap
    (shapes are static per ``(b, E, mode)`` family).
    """
    return WirePlaneUnpacker._decode(
        fields["bp"], fields["excp"], fields["excv"], fields["mode"]
    )


class WirePlanePacker(BatchLevelStepBase):
    """Host batch-level step: encode uint8 plane fields for the wire.

    Pair with :class:`WirePlaneUnpacker` (same ``field_names``) as a device
    step placed before anything that reads the planes. Between the two, each
    field ``F`` travels as the four ``F_wire_*`` fields described in the
    module docstring — typically ~1.4-2x fewer bytes, bit-identically
    reconstructed on device.

    Args:
        field_names: plane field name(s) to compress (uint8, vertical axis
            first, row width divisible by 8). For the YUV 4:2:0 wire, pass
            both the Y field and its ``<image>_cbcr`` sibling.
    """

    def __init__(self, field_names: Union[str, Iterable[str]]):
        super().__init__()
        if isinstance(field_names, str):
            field_names = [field_names]
        self._field_names = list(field_names)
        if not self._field_names:
            raise ValueError("WirePlanePacker needs at least one field name")
        #: observability: per-field choices of the most recent batch —
        #: {name: {"mode", "width", "exc_capacity", "raw_bytes",
        #: "packed_bytes"}}; written by the producer thread, read racily
        #: (monitoring only, like TPUPipeline.stats())
        self.last_batch_stats: dict = {}

    # ------------------------------------------------------------------ #

    def _process_batch(
        self, samples: List[SampleDataGroup]
    ) -> List[SampleDataGroup]:
        # pass 1: residuals for BOTH predictors everywhere; SUM the value
        # histograms per (field name, mode) so the batch picks the mode AND
        # the single width that minimize the TOTAL cost over all samples
        # (shapes must be batch-uniform; the summed-histogram optimum
        # dominates max-of-per-sample-optima — a batch where most planes
        # want b=4 and one wants b=5 can stay at 4 and pay that plane's
        # exceptions instead of widening everyone)
        encoded = []  # (sample_idx, path, encoder, name)
        hist = {}
        count = {}
        for si, sdg in enumerate(samples):
            for name in self._field_names:
                for ip in sdg.find_all_occurrences(name):
                    plane = np.asarray(sdg.get_item_in_path(ip))
                    enc = _PlaneEncoder(plane)
                    encoded.append((si, tuple(ip), enc, name))
                    for mode in (_MODE_VERTICAL, _MODE_PLANE):
                        key = (name, mode)
                        hist[key] = hist.get(key, 0) + enc.hist_cum(mode)
                        count[key] = count.get(key, 0) + enc.n
        mode_for = {}
        width = {}
        for name in {name for _, _, _, name in encoded}:
            best = None
            for mode in (_MODE_VERTICAL, _MODE_PLANE):
                b, c = _optimal_width(hist[(name, mode)], count[(name, mode)])
                if best is None or c < best[0]:
                    best = (c, mode, b)
            _, mode_for[name], width[(name, mode_for[name])] = best
        # batch-uniform exception capacity per field name, at the chosen
        # (mode, width)
        cap: dict = {}
        for _, _, enc, name in encoded:
            ne = enc.exceptions_at(mode_for[name], width[(name, mode_for[name])])
            cap[name] = max(cap.get(name, 0), ne)
        cap = {k: _next_pow2(v) for k, v in cap.items()}

        # pass 2: pack
        batch_stats: dict = {}
        for si, ip, enc, name in encoded:
            mode = mode_for[name]
            trailing = enc.trailing
            b, e = width[(name, mode)], cap[name]
            planes, excp, excv = enc.pack(mode, b, e)
            st = batch_stats.setdefault(
                name,
                {
                    "mode": "plane" if mode == _MODE_PLANE else "vertical",
                    "width": b,
                    "exc_capacity": e,
                    "raw_bytes": 0,
                    "packed_bytes": 0,
                },
            )
            st["raw_bytes"] += enc.n
            mode_bytes = mode
            for d in trailing[1:]:
                mode_bytes *= d
            st["packed_bytes"] += (
                planes.nbytes + excp.nbytes + excv.nbytes + mode_bytes
            )
            sdg = samples[si]
            parent = sdg.get_parent_of_path(list(ip))
            fname = ip[-1]
            parent.remove_field(fname)
            parent.add_data_field(f"{fname}_wire_bp", DType.UINT8)
            parent[f"{fname}_wire_bp"] = planes
            parent.add_data_field(f"{fname}_wire_excp", DType.INT32)
            parent[f"{fname}_wire_excp"] = excp
            parent.add_data_field(f"{fname}_wire_excv", DType.INT16)
            parent[f"{fname}_wire_excv"] = excv
            parent.add_data_field(f"{fname}_wire_mode", DType.UINT8)
            parent[f"{fname}_wire_mode"] = np.zeros(
                (mode,) + tuple(trailing[1:]), np.uint8
            )
        self.last_batch_stats = batch_stats
        return samples

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        found_any = False
        for name in self._field_names:
            for ip in data_empty.find_all_occurrences(name):
                found_any = True
                parent = data_empty.get_parent_of_path(list(ip))
                t = parent.get_type_of_field(ip[-1])
                if t != DType.UINT8:
                    raise TypeError(
                        f"WirePlanePacker: field '{name}' at {ip} must be "
                        f"UINT8, got {t}"
                    )
                parent.remove_field(ip[-1])
                parent.add_data_field(f"{ip[-1]}_wire_bp", DType.UINT8)
                parent.add_data_field(f"{ip[-1]}_wire_excp", DType.INT32)
                parent.add_data_field(f"{ip[-1]}_wire_excv", DType.INT16)
                parent.add_data_field(f"{ip[-1]}_wire_mode", DType.UINT8)
        if not found_any:
            raise KeyError(
                f"WirePlanePacker: none of {self._field_names} found in the "
                "sample data structure"
            )
        return data_empty


class WirePlaneUnpacker(PipelineStepBase):
    """Device step: reconstruct plane fields packed by :class:`WirePlanePacker`.

    Pure XLA decode, fused into the batched device program:

    1. bit-unpack: ``(b, H, Wr/8)`` bytes -> bits via broadcast
       shift-and-mask + reshape (no gather), summed LSB-first into the
       zigzag residual.
    2. exception patch: one bounded ``scatter`` (``mode='drop'`` for the
       padding) overwrites values that did not fit ``b`` bits.
    3. un-zigzag + the predictor's inverse cumsum(s) telescope residuals
       back to the exact original uint8 plane. The predictor mode is read
       from the mode field's SHAPE, so it is static at trace time.
    """

    placement = "device"

    def __init__(self, field_names: Union[str, Iterable[str]]):
        super().__init__()
        if isinstance(field_names, str):
            field_names = [field_names]
        self._field_names = list(field_names)
        if not self._field_names:
            raise ValueError("WirePlaneUnpacker needs at least one field name")

    @staticmethod
    def _decode(bp, excp, excv, mode_field):
        import jax.numpy as jnp

        mode = mode_field.shape[0]
        b, h, wb = bp.shape
        wr = wb * 8
        # trailing layout: the row (horizontal-cumsum) axis is derived from
        # bp's width; dims beyond it ride in the mode field's shape
        import math

        rest = tuple(mode_field.shape[1:])
        trailing = (wr // math.prod(rest),) + rest
        # bytes -> bits: big bit-order (np.packbits default): bit 7 first
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (bp[..., None] >> shifts) & 1  # (b, H, Wr/8, 8)
        bits = bits.reshape(b, h, wr).astype(jnp.int32)
        if b > 0:
            weights = (1 << jnp.arange(b, dtype=jnp.int32))[:, None, None]
            zz = jnp.sum(bits * weights, axis=0)
        else:
            zz = jnp.zeros((h, wr), jnp.int32)
        # exception patch (padding indices are out of range -> dropped)
        zz = zz.reshape(-1).at[excp].set(excv, mode="drop").reshape(h, wr)
        res = (zz >> 1) ^ -(zz & 1)
        res = res.reshape((h,) + trailing)
        # inverse predictor: horizontal cumsum along axis 1 (row 0 only for
        # the vertical mode, every row for the plane mode), then a vertical
        # cumsum down the columns — both fully parallel
        if mode == _MODE_PLANE:
            x = jnp.cumsum(res, axis=1)
        else:
            x = jnp.concatenate(
                [jnp.cumsum(res[:1], axis=1), res[1:]], axis=0
            )
        plane = jnp.cumsum(x, axis=0).astype(jnp.uint8)
        return plane

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        for name in self._field_names:
            for ip in data.find_all_occurrences(f"{name}_wire_bp"):
                parent = data.get_parent_of_path(list(ip))
                plane = self._decode(
                    parent[f"{name}_wire_bp"],
                    parent[f"{name}_wire_excp"],
                    parent[f"{name}_wire_excv"],
                    parent[f"{name}_wire_mode"],
                )
                for sfx in _SUFFIXES:
                    parent.remove_field(f"{name}{sfx}")
                parent.add_data_field(name, DType.UINT8)
                parent[name] = plane
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        found_any = False
        for name in self._field_names:
            for ip in data_empty.find_all_occurrences(f"{name}_wire_bp"):
                found_any = True
                parent = data_empty.get_parent_of_path(list(ip))
                for sfx, t in zip(
                    _SUFFIXES, (DType.UINT8, DType.INT32, DType.INT16, DType.UINT8)
                ):
                    fname = f"{name}{sfx}"
                    if not parent.path_exists(fname):
                        raise KeyError(
                            f"WirePlaneUnpacker expects '{fname}' (produced "
                            "by WirePlanePacker) next to the plane at "
                            f"{list(ip)[:-1]}"
                        )
                    if parent.get_type_of_field(fname) != t:
                        raise TypeError(
                            f"WirePlaneUnpacker: '{fname}' must be {t}, got "
                            f"{parent.get_type_of_field(fname)}"
                        )
                for sfx in _SUFFIXES:
                    parent.remove_field(f"{name}{sfx}")
                parent.add_data_field(name, DType.UINT8)
        if not found_any:
            raise KeyError(
                f"WirePlaneUnpacker: no '<name>_wire_bp' fields for any of "
                f"{self._field_names} — is WirePlanePacker ahead of this step?"
            )
        return data_empty
