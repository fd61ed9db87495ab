"""Coefficient-domain ("DCT") host->device wire for JPEG image fields.

The TPU-first split of JPEG decode. The pixel wires (RGB, YUV 4:2:0 — see
:mod:`image_decoder` / :mod:`wire_compression`) run the FULL decode on the
host and ship pixels; this wire stops host decoding after the entropy
(Huffman) half and ships the **quantized DCT coefficients** — the file's
actual information content. The device half runs inside the fused batched
XLA program:

    bit-unpack -> exception patch -> dequantize -> scaled IDCT
    (8x8-block matmuls, MXU-native) -> crop -> bilinear resize
    -> planar Y + subsampled CbCr (feeding :class:`YCbCrToRGBConverter`)

Why this wins twice on a wire-bound pipeline:

* **Bytes.** Quantized coefficients are mostly zeros/small integers; a
  per-frequency-band bitplane code carries them in ~2 bits/value where the
  best pixel-domain predictor needs ~5.6 bits/px (measured on the headline
  bench content: ~126 KB/frame vs ~189 KB packed-YUV vs 270 KB raw-YUV).
* **Host CPU.** The host skips the IDCT, chroma upsample, resize, and all
  pixel-domain packing — entropy decode + coefficient re-layout only.

The quality contract is tolerance-based, like the reference's own decoder
tests (OpenCV oracle with ``diff_tolerance=21``,
``on_demand_video_decoder/tests/utils.py:7-42``): luma matches the pixel
path within +-1 (float IDCT vs libjpeg's fixed-point ISLOW); chroma is
resampled from the TRUE half-resolution chroma plane instead of a
replication-upsampled copy, so it differs by a few LSBs from the pixel
path while being closer to the continuous signal.

Wire format, per image field ``F`` and component set ``cs`` in ``y`` (luma)
and ``c`` (Cb and Cr, concatenated along the block-row axis):

* ``F_dct{cs}{g}_bp``  uint8 ``(b_g, nb_g*bh, bwp/8)`` — bitplanes of the
  zigzag-mapped values of band group ``g`` (bands in JPEG zigzag order,
  grouped by frequency diagonal; ``nb_g`` static per (m, grouping)).
* ``F_dct{cs}_excw``  uint32 ``(E,)`` — ONE unified patched-exception list
  per component set, one packed word per slot: flat index into the
  concatenated ``(m*m, bh, bwp)`` band array ``<< 14`` | full zigzag
  value; padded with the out-of-range index (device scatter
  ``mode='drop'``). On geometries whose flat index needs more than 18
  bits the list splits into ``F_dct{cs}_excp`` / ``_excv`` (int32 pos +
  int16 zigzag) — static per geometry, both halves derive it identically.
* ``F_dct{cs}_mode``  uint8 zeros — SHAPE ``(mode+1,)`` carries the DC
  band's spatial predictor (0 none, 1 vertical, 2 plane; AC bands are
  never predicted — quantized AC coefficients are block-independent).
* ``F_dct_quant``  int32 ``(2, m, m)`` — luma/chroma quantization tables
  (natural order); its shape also carries ``m``.

``b_g`` and the DC mode are chosen per batch (summed-histogram optimum over
all samples/cameras, exactly like :class:`WirePlanePacker`), and the
exception capacity is bucketed, so device-program shapes are batch-uniform
and stable across batches of similar content.

Reference anchors: NVJPEG/NVDEC hardware decode feeding DALI's fused
decoder+resize (``processing_steps/image_decoder.py:28``) and the
GPU-side color split (``ColorSpace.cu:227-283``) — here the accelerator
side starts two stages earlier, at the coefficients.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple, Union

import numpy as np

from .pipeline_step_base import BatchLevelStepBase, PipelineStepBase
from .wire_compression import _EXC_BITS, _zigzag
from ..dtypes import DType
from ..sample_data_group import SampleDataGroup
#: zigzag of the DC plane-predictor residual (+-4*2047) needs 14 bits
_MAX_BITS = 14
#: exceptions pack into ONE uint32 word (``pos << 14 | zigzag``) when every
#: flat position of the concatenated band array fits the remaining 18 bits
_PACKED_EXC_POS_LIMIT = 1 << (32 - _MAX_BITS)
_MIN_EXC_BUCKET = 64

_MODE_NONE, _MODE_VERTICAL, _MODE_PLANE = 0, 1, 2
_COMPSETS = ("y", "c")

#: a named partition or an explicit (start, end) sequence (see band_groups)
Grouping = Union[str, Iterable[Tuple[int, int]]]


# --------------------------------------------------------------------------- #
# static layout helpers (shared by packer and unpacker — both derive the
# SAME band order / grouping / crop geometry from (source_hw, out_hw))
# --------------------------------------------------------------------------- #


def select_m(source_hw, out_hw) -> int:
    """Smallest M in 1..8 whose M/8-scaled size covers ``out_hw`` — the
    ONE scale-selection rule (:func:`native_jpeg.select_scale_m`, mirroring
    ``jpegdec.cpp select_scale``)."""
    from ..native_jpeg import select_scale_m

    return select_scale_m(source_hw, out_hw)


def band_order(m: int) -> List[Tuple[int, int]]:
    """The ``m*m`` (u, v) frequency pairs in zigzag (by-diagonal) order."""
    out = []
    for s in range(2 * m - 1):
        for u in range(max(0, s - m + 1), min(s, m - 1) + 1):
            out.append((u, s - u))
    return out


def band_groups(m: int, grouping: Grouping) -> List[Tuple[int, int]]:
    """Static partition of the zigzag band order into groups that share one
    bit width: ``(start, end)`` index pairs.

    * ``"band"``  — one group per band (best bytes; most wire fields).
    * ``"split12"`` — DC and first diagonal individually, diagonals 2-5
      split in half, tails merged (good bytes, ~1/3 the fields).
    * ``"diag8"`` — first six diagonals individually, tails merged.
    * an explicit sequence of ``(start, end)`` pairs — e.g. the output of
      :func:`optimize_band_groups`, a content-tuned partition at a chosen
      field budget. Must start with the lone DC group ``(0, 1)`` (the DC
      band carries the spatial predictor) and tile ``[0, m*m)`` contiguously.
    """
    if not isinstance(grouping, str):
        groups = [(int(a), int(b)) for a, b in grouping]
        if not groups or groups[0] != (0, 1):
            raise ValueError(
                "custom band grouping must start with the DC group (0, 1), "
                f"got {groups[:1]}"
            )
        prev = 0
        for a, b in groups:
            if a != prev or b <= a:
                raise ValueError(
                    f"custom band grouping must tile [0, {m * m}) with "
                    f"contiguous (start, end) pairs; got {groups}"
                )
            prev = b
        if prev != m * m:
            raise ValueError(
                f"custom band grouping covers [0, {prev}) but m={m} has "
                f"{m * m} bands"
            )
        return groups
    diag_sizes = [
        min(s, m - 1) - max(0, s - m + 1) + 1 for s in range(2 * m - 1)
    ]
    bounds = np.cumsum([0] + diag_sizes)  # diagonal d = bands[bounds[d]:bounds[d+1]]
    nd = len(diag_sizes)
    if grouping == "band":
        return [(i, i + 1) for i in range(m * m)]
    if grouping == "diag8":
        cut = min(6, nd)
        groups = [(int(bounds[d]), int(bounds[d + 1])) for d in range(cut)]
        if nd > cut:
            mid = min(cut + 2, nd)
            groups.append((int(bounds[cut]), int(bounds[mid])))
            if mid < nd:
                groups.append((int(bounds[mid]), int(bounds[nd])))
        return groups
    if grouping == "split12":
        groups = []
        for d in range(min(2, nd)):
            groups.append((int(bounds[d]), int(bounds[d + 1])))
        for d in range(2, min(6, nd)):
            a, b = int(bounds[d]), int(bounds[d + 1])
            h = (b - a + 1) // 2
            groups.append((a, a + h))
            if a + h < b:
                groups.append((a + h, b))
        if nd > 6:
            mid = min(8, nd)
            groups.append((int(bounds[6]), int(bounds[mid])))
            if mid < nd:
                groups.append((int(bounds[mid]), int(bounds[nd])))
        return groups
    raise ValueError(
        "grouping must be 'band', 'split12', 'diag8' or a sequence of "
        f"(start, end) pairs, got {grouping!r}"
    )


def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


class _Geometry:
    """Everything both halves must agree on, derived from constructor args.

    ``bh/bwp`` are the PACKED compset grids: luma ``(bh_y, pad8(bw_y))``,
    chroma ``(2*bh_c, pad8(bw_c))`` (Cb stacked on Cr along block rows; the
    column pad adds zero blocks whose pixels land beyond the crop).
    """

    def __init__(self, source_hw, out_hw):
        self.source_hw = (int(source_hw[0]), int(source_hw[1]))
        self.out_hw = (int(out_hw[0]), int(out_hw[1]))
        if (self.out_hw[0] | self.out_hw[1]) & 1:
            raise ValueError(
                f"out_hw must be even (4:2:0 chroma), got {self.out_hw}"
            )
        self.m = select_m(self.source_hw, self.out_hw)
        sh, sw = self.source_hw
        m = self.m
        # libjpeg block grids (jdinput.c): ceil(dim * samp / (max_samp * 8))
        # = ceil(dim/8) for luma, ceil(dim/16) for 4:2:0 chroma
        self.blocks_y = ((sh + 7) // 8, (sw + 7) // 8)
        self.blocks_c = ((sh + 15) // 16, (sw + 15) // 16)
        # packed compset grids
        self.grid = {
            "y": (self.blocks_y[0], _pad8(self.blocks_y[1])),
            "c": (2 * self.blocks_c[0], _pad8(self.blocks_c[1])),
        }
        # pixel crops of the M/8-scaled planes (per COMPONENT, not compset)
        ch, cw = (sh + 1) // 2, (sw + 1) // 2
        self.crop = {
            "y": ((sh * m + 7) // 8, (sw * m + 7) // 8),
            "c": ((ch * m + 7) // 8, (cw * m + 7) // 8),
        }
        self.out = {
            "y": self.out_hw,
            "c": (self.out_hw[0] // 2, self.out_hw[1] // 2),
        }
        # exception wire format, static per geometry (both halves derive the
        # same decision): one packed uint32 word per exception when every
        # flat band-array position fits in 18 bits, else pos32 + val16
        self.total = {
            cs: self.m * self.m * g[0] * g[1] for cs, g in self.grid.items()
        }
        self.packed_exc = {
            cs: t < _PACKED_EXC_POS_LIMIT for cs, t in self.total.items()
        }
        self.exc_bits = {
            cs: 32 if p else _EXC_BITS for cs, p in self.packed_exc.items()
        }


def _field_names(name: str, groups, geo: "_Geometry") -> List[str]:
    return list(_field_types(name, groups, geo))


def _field_types(name: str, groups, geo: "_Geometry") -> dict:
    t = {}
    for cs in _COMPSETS:
        for g in range(len(groups)):
            t[f"{name}_dct{cs}{g}_bp"] = DType.UINT8
        if geo.packed_exc[cs]:
            t[f"{name}_dct{cs}_excw"] = DType.UINT32
        else:
            t[f"{name}_dct{cs}_excp"] = DType.INT32
            t[f"{name}_dct{cs}_excv"] = DType.INT16
        t[f"{name}_dct{cs}_mode"] = DType.UINT8
    t[f"{name}_dct_quant"] = DType.INT32
    return t


# --------------------------------------------------------------------------- #
# host encode
# --------------------------------------------------------------------------- #


def _dc_residual(dc: np.ndarray, mode: int) -> np.ndarray:
    """Spatial predictor residuals of the DC band plane (int16 in/out) —
    the same residual/inverse pair as the pixel codec
    (:mod:`wire_compression`), reused here for the DC coefficient image."""
    d = dc.astype(np.int16)
    if mode == _MODE_NONE:
        return d
    rv = d.copy()
    rv[1:] -= d[:-1]
    if mode == _MODE_VERTICAL:
        rv[0, 1:] -= d[0, :-1]
        return rv
    r2 = rv.copy()
    r2[:, 1:] -= rv[:, :-1]
    return r2


class _CompsetEncoder:
    """Per-(sample, occurrence, compset) encode state between the two
    batch passes, behind one interface for two backends.

    The native engine (``pipeline/csrc/dctpack.cpp``, built lazily) does
    zigzag + per-group histograms (all three DC predictor variants in one
    sweep) and the bitplane/exception emit in single cache-friendly passes
    with no intermediate arrays; the numpy fallback materializes the
    zigzag band array and the DC residual candidates. Both produce
    byte-identical wire fields (tested)."""

    def __init__(self, bands: np.ndarray, groups):
        # bands: (m*m, bh, bwp) int16, zigzag band order; group 0 is the
        # DC band alone (diagonal 0) in every grouping style
        assert groups[0] == (0, 1)
        bands = np.ascontiguousarray(bands, np.int16)
        self.n_per_group = [
            int((b - a) * bands.shape[1] * bands.shape[2]) for a, b in groups
        ]
        self._bands = bands
        self._groups = groups
        from .. import dct_native

        bounds = [a for a, _ in groups] + [groups[-1][1]]
        res = dct_native.analyze(bands, bounds)
        self._f: dict = {}  # (g, mode) -> int64 (15,): count(zigzag < 2^b)
        if res is not None:
            self._native = True
            fits, dc3 = res
            for g in range(1, len(groups)):
                self._f[(g, _MODE_NONE)] = fits[g].astype(np.int64)
            for mode in (_MODE_NONE, _MODE_VERTICAL, _MODE_PLANE):
                self._f[(0, mode)] = dc3[mode].astype(np.int64)
            self.zz = None
            self.dc_zz = None
        else:
            self._build_numpy_state()

    def _build_numpy_state(self):
        """The numpy backend's encode state (also the mid-run fallback if
        the native library ever vanishes between analyze and pack)."""
        self._native = False
        bands, groups = self._bands, self._groups
        self.zz = _zigzag(bands)  # uint16; band 0 = mode-NONE DC
        self.dc_zz = {
            mode: _zigzag(_dc_residual(bands[0], mode))
            for mode in (_MODE_VERTICAL, _MODE_PLANE)
        }
        self.dc_zz[_MODE_NONE] = self.zz[0]

        def to_fits(zz):
            cum = np.cumsum(
                np.bincount(zz.ravel(), minlength=1 << _MAX_BITS),
                dtype=np.int64,
            )
            return cum[(1 << np.arange(_MAX_BITS + 1)) - 1]

        for mode, dz in self.dc_zz.items():
            self._f[(0, mode)] = to_fits(dz)
        for g, (a, b) in enumerate(groups[1:], start=1):
            self._f[(g, _MODE_NONE)] = to_fits(self.zz[a:b])

    def group_zz(self, g: int, dc_mode: int) -> np.ndarray:
        a, b = self._groups[g]
        if a == 0:  # group containing the DC band
            zz = self.zz[a:b]
            if dc_mode != _MODE_NONE:
                zz = zz.copy()
                zz[0] = self.dc_zz[dc_mode]
            return zz
        return self.zz[a:b]

    def fits(self, g: int, dc_mode: int) -> np.ndarray:
        """``fits[b] = count(zigzag < 2**b)`` for b in 0..14 — everything
        the width/mode optimizer needs from this group's values."""
        return self._f[(g, dc_mode if g == 0 else _MODE_NONE)]

    def exceptions_at(self, g: int, dc_mode: int, b: int) -> int:
        return self.n_per_group[g] - int(self.fits(g, dc_mode)[b])

    def pack_group_into(
        self, g: int, dc_mode: int, b: int, excp, excv, ne: int
    ):
        """Pack group ``g`` -> new bitplane array; exceptions (positions in
        the concatenated band space) append to the unified list at ``ne``.
        Returns ``(bp, new_ne)``; new_ne is the TRUE count (caller errors
        if it exceeds the capacity — sized from the same histograms)."""
        a, b_end = self._groups[g]
        bh, bwp = self._bands.shape[1], self._bands.shape[2]
        bp = np.empty((b, (b_end - a) * bh, bwp // 8), np.uint8)
        if self._native:
            from .. import dct_native

            new_ne = dct_native.pack_group(
                self._bands, a, b_end, dc_mode, b, bp, excp, excv, ne
            )
            if new_ne is not None:
                return bp, new_ne
            # library vanished between analyze and pack (never observed):
            # rebuild the NUMPY state directly and fall through
            self._build_numpy_state()  # pragma: no cover
        zz = self.group_zz(g, dc_mode)
        bp[...] = _pack_group(zz, b)
        pos = np.flatnonzero(zz >= (1 << b))
        take = min(pos.size, max(0, excp.size - ne))
        offset = a * bh * bwp
        excp[ne : ne + take] = pos[:take].astype(np.int32) + offset
        excv[ne : ne + take] = zz.reshape(-1)[pos[:take]].astype(np.int16)
        return bp, ne + pos.size


def _optimal_width(
    fits: np.ndarray, n: int, exc_bits: int = _EXC_BITS
) -> Tuple[int, int]:
    """DCT-band entry to the shared width-cost model
    (:func:`wire_compression.optimal_width_from_fits`); ``exc_bits`` is 32
    on packed-exception geometries (``_Geometry.exc_bits``)."""
    from .wire_compression import optimal_width_from_fits

    return optimal_width_from_fits(fits, n, _MAX_BITS, exc_bits)


def _exc_bucket(n: int) -> int:
    """Exception-list capacity bucket: powers of two up to 1024 (variant
    churn control), then multiples of 512 (pow2 would waste kilobytes)."""
    cap = _MIN_EXC_BUCKET
    while cap < n and cap < 1024:
        cap *= 2
    if n > cap:
        cap = (n + 511) // 512 * 512
    return cap


def _pack_group(zz: np.ndarray, b: int) -> np.ndarray:
    """Bitplanes ``(b, rows, cols/8)`` of one group, flattened to 2-D rows."""
    nb, bh, bwp = zz.shape
    flat = zz.reshape(nb * bh, bwp)
    planes = np.empty((b, nb * bh, bwp // 8), np.uint8)
    for k in range(b):
        planes[k] = np.packbits(((flat >> k) & 1).astype(np.uint8), axis=-1)
    return planes


class DCTWirePacker(BatchLevelStepBase):
    """Host batch-level step: JPEG bytes -> quantized-coefficient wire.

    Replaces the ``ImageDecoder`` + ``WirePlanePacker`` pair for JPEG
    sources: consumes the encoded-bytes field ``image_name`` and emits the
    ``<image_name>_dct*`` wire fields described in the module docstring.
    Pair with :class:`DCTWireUnpacker` (same constructor arguments)
    followed by :class:`YCbCrToRGBConverter`.

    Requirements (falls back are the pixel wires): native libjpeg
    available; baseline/progressive JPEGs in grayscale or YCbCr 4:2:0 (the
    JPEG default); every image in the pipeline has the same source size
    ``source_hw`` (batch-uniform shapes — the same contract every stacked
    pipeline already has).

    Args:
        image_name: encoded-JPEG field name.
        source_hw: (height, width) every source JPEG must have.
        out_hw: final even (height, width) the unpacker reconstructs —
            the analog of ``ImageDecoder(decode_resize_hw=...)``.
        grouping: band-group partition — ``"band"`` (fewest bytes),
            ``"split12"`` (default; ~1/3 the wire fields of ``"band"`` for
            ~10% more bytes), ``"diag8"``, or an explicit sequence of
            ``(start, end)`` pairs such as the content-tuned output of
            :func:`optimize_band_groups` (recovers most of ``"band"``'s
            byte win at a chosen field budget).
        num_threads: per-image encode parallelism (the entropy decode and
            the native analyze/pack calls release the GIL). Default
            ``min(4, cpu_count)``; 1 disables the pool. Order-preserving —
            the wire is byte-identical to the serial path.
    """

    def __init__(
        self,
        image_name: str,
        source_hw,
        out_hw,
        grouping: Grouping = "split12",
        num_threads: Optional[int] = None,
    ):
        super().__init__()
        if not isinstance(image_name, str):
            raise ValueError("DCTWirePacker needs a string image_name")
        from .. import native_jpeg

        if not native_jpeg.available():
            raise RuntimeError(
                "DCTWirePacker needs the native libjpeg engine (libjpeg "
                "headers at build time); use ImageDecoder(wire_format="
                "'yuv420') + WirePlanePacker as the pixel-wire fallback"
            )
        self._image_name = image_name
        self._geo = _Geometry(source_hw, out_hw)
        self._grouping = grouping
        self._groups = band_groups(self._geo.m, grouping)
        self._order = band_order(self._geo.m)
        import os

        # per-image encode parallelism (GIL-releasing native calls);
        # 1 on single-core hosts -> the pool is never created
        if num_threads is None:
            num_threads = min(4, os.cpu_count() or 1)
        self._num_threads = max(1, int(num_threads))
        self._pool = None
        #: observability (producer-thread-written, monitoring only):
        #: {"m", "dc_mode", "widths": {cs: [b_g]}, "exc_capacity": {cs},
        #:  "raw_bytes", "packed_bytes"} of the most recent batch
        self.last_batch_stats: dict = {}

    def __getstate__(self):
        # process workers pickle host steps; the thread pool is per-process
        d = self.__dict__.copy()
        d["_pool"] = None
        return d

    # ------------------------------------------------------------------ #

    def _read_bands(self, encoded: np.ndarray) -> dict:
        """Entropy-decode one JPEG into zigzag-ordered band arrays per
        compset (+ the quant field)."""
        from .. import native_jpeg

        geo = self._geo
        info = native_jpeg.dct_info(encoded)
        if info["src_hw"] != geo.source_hw:
            raise ValueError(
                f"DCTWirePacker: source is {info['src_hw']}, constructed "
                f"for {geo.source_hw} (batch-uniform source sizes required)"
            )
        y, cb, cr, quant = native_jpeg.read_dct(encoded, geo.m, info)
        m = geo.m
        uu = np.array([u for u, _ in self._order])
        vv = np.array([v for _, v in self._order])

        def to_bands(comp, grid):
            # (bh, bw, m, m) -> (m*m, bh, bwp), zigzag band order + col pad
            bands = np.ascontiguousarray(
                comp.reshape(comp.shape[0], comp.shape[1], m * m)
                .transpose(2, 0, 1)[uu * m + vv]
            )
            bh, bwp = grid
            if bands.shape[2] < bwp:
                bands = np.pad(
                    bands, ((0, 0), (0, 0), (0, bwp - bands.shape[2]))
                )
            return bands

        return {
            "y": to_bands(y, geo.grid["y"]),
            "c": to_bands(np.concatenate([cb, cr], axis=0), geo.grid["c"]),
            "quant": quant.astype(np.int32),
        }

    def _process_batch(
        self, samples: List[SampleDataGroup]
    ) -> List[SampleDataGroup]:
        geo, groups = self._geo, self._groups
        # pass 1: entropy decode + per-group width summaries, summed over
        # the batch (per compset; and per DC-mode candidate for group 0) so
        # widths/mode minimize the TOTAL batch cost with batch-uniform shapes.
        # The per-image work (libjpeg entropy decode + native analyze) runs
        # on a small thread pool — both release the GIL — mirroring the
        # reference decoder's demux/decode runner pools
        # (PyNvGopDecoder.hpp:680-682); order is preserved, so the wire is
        # byte-identical to the serial path.
        jobs = []  # (sample_idx, path, encoded)
        for si, sdg in enumerate(samples):
            for ip in sdg.find_all_occurrences(self._image_name):
                jobs.append(
                    (si, tuple(ip),
                     np.asarray(sdg.get_item_in_path(ip), np.uint8))
                )

        def encode_one(job):
            si, ip, encoded = job
            data = self._read_bands(encoded)
            ce = {cs: _CompsetEncoder(data[cs], groups) for cs in _COMPSETS}
            return si, ip, ce, data["quant"]

        if self._num_threads > 1 and len(jobs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            if self._pool is None:
                self._pool = ThreadPoolExecutor(
                    self._num_threads, thread_name_prefix="dct-wire"
                )
            encs = list(self._pool.map(encode_one, jobs))
        else:
            encs = [encode_one(j) for j in jobs]
        fits_sum = {}
        for _, _, ce, _ in encs:
            for cs in _COMPSETS:
                for g in range(len(groups)):
                    modes = (
                        (_MODE_NONE, _MODE_VERTICAL, _MODE_PLANE)
                        if groups[g][0] == 0
                        else (_MODE_NONE,)
                    )
                    for mode in modes:
                        key = (cs, g, mode)
                        f = ce[cs].fits(g, mode)
                        fits_sum[key] = (
                            f if key not in fits_sum else fits_sum[key] + f
                        )
        if not encs:
            raise KeyError(
                f"DCTWirePacker: no occurrences of '{self._image_name}'"
            )
        n_imgs = len(encs)
        # choose DC mode (joint over the DC-containing group) and widths
        widths = {}
        dc_mode = {}
        for cs in _COMPSETS:
            best = None
            for mode in (_MODE_NONE, _MODE_VERTICAL, _MODE_PLANE):
                b, cost = _optimal_width(
                    fits_sum[(cs, 0, mode)],
                    encs[0][2][cs].n_per_group[0] * n_imgs,
                    geo.exc_bits[cs],
                )
                if best is None or cost < best[0]:
                    best = (cost, mode, b)
            _, dc_mode[cs], b0 = best
            ws = [b0]
            for g in range(1, len(groups)):
                b, _ = _optimal_width(
                    fits_sum[(cs, g, _MODE_NONE)],
                    encs[0][2][cs].n_per_group[g] * n_imgs,
                    geo.exc_bits[cs],
                )
                ws.append(b)
            widths[cs] = ws
        # batch-uniform unified exception capacity per compset
        cap = {cs: 0 for cs in _COMPSETS}
        for _, _, ce, _ in encs:
            for cs in _COMPSETS:
                n = sum(
                    ce[cs].exceptions_at(g, dc_mode[cs], b)
                    for g, b in enumerate(widths[cs])
                )
                cap[cs] = max(cap[cs], n)
        cap = {cs: _exc_bucket(n) for cs, n in cap.items()}

        # pass 2: pack and write fields
        stats = {
            "m": geo.m,
            "dc_mode": dict(dc_mode),
            "widths": {cs: list(widths[cs]) for cs in _COMPSETS},
            "exc_capacity": dict(cap),
            "exc_format": {
                cs: "packed32" if geo.packed_exc[cs] else "pos32+val16"
                for cs in _COMPSETS
            },
            "raw_bytes": 0,
            "packed_bytes": 0,
        }
        # the byte-heavy emit runs on the same pool as pass 1 (native pack
        # releases the GIL); only the SampleDataGroup field assignment stays
        # on the caller thread
        def pack_one(enc_entry):
            si, ip, ce, quant = enc_entry
            fields = {}
            for cs in _COMPSETS:
                enc = ce[cs]
                total = geo.total[cs]
                e = cap[cs]
                excp = np.full((e,), total, np.int32)  # out of range -> drop
                excv = np.zeros((e,), np.int16)
                ne = 0
                for g, b in enumerate(widths[cs]):
                    planes, ne = enc.pack_group_into(
                        g, dc_mode[cs], b, excp, excv, ne
                    )
                    fields[f"dct{cs}{g}_bp"] = planes
                if ne > e:
                    raise RuntimeError(
                        f"DCT wire: {ne} exceptions exceed the sized "
                        f"capacity {e} (capacity comes from the same "
                        "histograms — this is a bug)"
                    )
                if geo.packed_exc[cs]:
                    # one uint32 word per slot: pos << 14 | zigzag (zigzag
                    # < 2^14 by _MAX_BITS; padding slots carry pos == total,
                    # whose scatter index still lands out of range -> drop)
                    fields[f"dct{cs}_excw"] = (
                        excp.astype(np.uint32) << _MAX_BITS
                    ) | excv.astype(np.uint32)
                else:
                    fields[f"dct{cs}_excp"] = excp
                    fields[f"dct{cs}_excv"] = excv
                fields[f"dct{cs}_mode"] = np.zeros((dc_mode[cs] + 1,), np.uint8)
            fields["dct_quant"] = quant
            return si, ip, fields

        if self._pool is not None and len(encs) > 1:
            packed = list(self._pool.map(pack_one, encs))
        else:
            packed = [pack_one(e) for e in encs]
        for si, ip, fields in packed:
            sdg = samples[si]
            parent = sdg.get_parent_of_path(list(ip))
            name = ip[-1]
            parent.remove_field(name)
            for fname, t in _field_types(name, groups, geo).items():
                parent.add_data_field(fname, t)
            for sfx, arr in fields.items():
                parent[f"{name}_{sfx}"] = arr
                stats["packed_bytes"] += arr.nbytes
            for cs in _COMPSETS:
                stats["raw_bytes"] += geo.out[cs][0] * geo.out[cs][1] * (
                    1 if cs == "y" else 2
                )
        self.last_batch_stats = stats
        return samples

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        paths = data_empty.find_all_occurrences(self._image_name)
        if len(paths) == 0:
            raise KeyError(
                f"DCTWirePacker: no occurrences of '{self._image_name}'"
            )
        for ip in paths:
            t = data_empty.get_type_of_item_in_path(ip)
            if t != DType.UINT8:
                raise TypeError(
                    f"Encoded image field at {ip} must be UINT8, got {t}"
                )
            parent = data_empty.get_parent_of_path(list(ip))
            parent.remove_field(ip[-1])
            for fname, ft in _field_types(ip[-1], self._groups, self._geo).items():
                parent.add_data_field(fname, ft)
        return data_empty


# --------------------------------------------------------------------------- #
# device decode
# --------------------------------------------------------------------------- #


def _idct_basis(m: int) -> np.ndarray:
    """m-point scaled-IDCT basis ``B[x, u] = (c_u/2) cos((2x+1)u pi/(2m))``
    — the float form of libjpeg's M/8 scaled IDCT (validated within +-1 of
    ISLOW in the tests). ``plane = B @ coeff @ B.T`` per block."""
    x = np.arange(m)[:, None].astype(np.float64)
    u = np.arange(m)[None, :].astype(np.float64)
    b = 0.5 * np.cos((2 * x + 1) * u * np.pi / (2 * m))
    b[:, 0] *= 1.0 / np.sqrt(2.0)
    return b.astype(np.float32)


class DCTWireUnpacker(PipelineStepBase):
    """Device step: reconstruct Y + CbCr fields from the DCT wire.

    Pure XLA, fused into the batched device program (runs per sample under
    the pipeline's ``jit(vmap(...))``): bit-unpack each band group, patch
    the unified exception list with one bounded scatter, invert the DC
    band's spatial predictor (cumsums), inverse-zigzag (static gather),
    dequantize, IDCT via two small matmuls per 8x8 block (``einsum`` — the
    MXU path), crop the libjpeg-scaled size, bilinear-resize to ``out_hw``.

    Constructor arguments must match the paired :class:`DCTWirePacker`.
    Outputs: ``image_name`` as uint8 ``(out_h, out_w)`` luma plus
    ``<image_name>_cbcr`` uint8 ``(out_h/2, out_w/2, 2)`` — exactly the
    YUV-4:2:0 wire layout, so :class:`YCbCrToRGBConverter` follows
    unchanged.
    """

    placement = "device"

    def __init__(
        self,
        image_name: str,
        source_hw,
        out_hw,
        grouping: Grouping = "split12",
    ):
        super().__init__()
        if not isinstance(image_name, str):
            raise ValueError("DCTWireUnpacker needs a string image_name")
        self._image_name = image_name
        self._geo = _Geometry(source_hw, out_hw)
        self._groups = band_groups(self._geo.m, grouping)
        order = band_order(self._geo.m)
        m = self._geo.m
        inv = np.empty(m * m, np.int32)
        for p, (u, v) in enumerate(order):
            inv[u * m + v] = p
        self._inv_perm = inv
        self._basis = _idct_basis(m)

    @property
    def chroma_field_name(self) -> str:
        return f"{self._image_name}_cbcr"

    # ------------------------------------------------------------------ #

    def _unpack_groups(self, get, cs: str):
        """Bitplanes -> zigzag values: concatenated ``(m*m, bh, bwp)``.
        ``get`` maps a field suffix (e.g. ``"dcty0_bp"``) to its array."""
        import jax.numpy as jnp

        bh, bwp = self._geo.grid[cs]
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        parts = []
        for g, (a, b_end) in enumerate(self._groups):
            bp = get(f"dct{cs}{g}_bp")
            nb = b_end - a
            b = bp.shape[0]
            if bp.shape[1] != nb * bh or bp.shape[2] * 8 != bwp:
                raise ValueError(
                    f"DCTWireUnpacker: 'dct{cs}{g}_bp' is "
                    f"{tuple(bp.shape)}, expected ({b}, {nb * bh}, {bwp // 8}) "
                    "— source_hw/out_hw/grouping must match the packer"
                )
            if b == 0:
                parts.append(jnp.zeros((nb, bh, bwp), jnp.int32))
                continue
            bits = ((bp[..., None] >> shifts) & 1).reshape(
                b, nb * bh, bwp
            ).astype(jnp.int32)
            weights = (1 << jnp.arange(b, dtype=jnp.int32))[:, None, None]
            parts.append(jnp.sum(bits * weights, axis=0).reshape(nb, bh, bwp))
        return jnp.concatenate(parts, axis=0)

    def _decode_compset(self, get, cs: str, quant):
        import jax.numpy as jnp

        geo = self._geo
        m = geo.m
        bh, bwp = geo.grid[cs]
        zz = self._unpack_groups(get, cs)
        if geo.packed_exc[cs]:
            w = get(f"dct{cs}_excw")
            excp = (w >> _MAX_BITS).astype(jnp.int32)
            excv = (w & ((1 << _MAX_BITS) - 1)).astype(jnp.int32)
        else:
            excp = get(f"dct{cs}_excp")
            excv = get(f"dct{cs}_excv")
        zz = (
            zz.reshape(-1)
            .at[excp]
            .set(excv.astype(jnp.int32), mode="drop")
            .reshape(m * m, bh, bwp)
        )
        res = (zz >> 1) ^ -(zz & 1)
        # DC band: invert the spatial predictor (mode rides in the SHAPE of
        # the mode field — static at trace time, one variant per mode)
        mode = get(f"dct{cs}_mode").shape[0] - 1
        dc = res[0]
        if mode == _MODE_PLANE:
            dc = jnp.cumsum(jnp.cumsum(dc, axis=1), axis=0)
        elif mode == _MODE_VERTICAL:
            dc = jnp.cumsum(
                jnp.concatenate([jnp.cumsum(dc[:1], axis=1), dc[1:]], axis=0),
                axis=0,
            )
        res = jnp.concatenate([dc[None], res[1:]], axis=0)
        # inverse zigzag (static gather) -> (m, m, bh, bwp); dequantize
        coef = res[self._inv_perm].reshape(m, m, bh, bwp) * quant[
            :, :, None, None
        ]
        # scaled IDCT: two small matmuls per block, batched over the grid.
        # precision=HIGHEST: on TPU the default lowers f32 dots to bf16 MXU
        # passes, whose 8-bit mantissa would break the +-1-of-ISLOW luma
        # contract (coefficients reach ~1000s); these are tiny m x m dots,
        # the f32 passes cost nothing
        import jax

        basis = jnp.asarray(self._basis)
        px = jnp.einsum(
            "xu,uvhw,yv->hxwy",
            basis,
            coef.astype(jnp.float32),
            basis,
            precision=jax.lax.Precision.HIGHEST,
        )
        plane = px.reshape(bh * m, bwp * m) + 128.0
        plane = jnp.clip(plane, 0.0, 255.0)
        return plane

    @staticmethod
    def _resize(plane, out_hw):
        import jax

        out = jax.image.resize(plane, out_hw, method="linear", antialias=False)
        import jax.numpy as jnp

        return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)

    def decode_fields(self, get):
        """Pure jit-compatible decode: ``get`` maps a field suffix (e.g.
        ``"dcty0_bp"``, ``"dct_quant"``) to its (unbatched) array. Returns
        ``(y, cbcr)`` uint8 arrays at ``out_hw`` / half ``out_hw``."""
        import jax.numpy as jnp

        geo = self._geo
        quant = get("dct_quant")
        y_plane = self._decode_compset(get, "y", quant[0])
        c_plane = self._decode_compset(get, "c", quant[1])
        ch, cw = geo.crop["y"]
        y = self._resize(y_plane[:ch, :cw], geo.out["y"])
        # chroma compset = Cb over Cr along block rows
        half = geo.blocks_c[0] * geo.m
        ch, cw = geo.crop["c"]
        cb = self._resize(c_plane[:ch, :cw], geo.out["c"])
        cr = self._resize(c_plane[half : half + ch, :cw], geo.out["c"])
        return y, jnp.stack([cb, cr], axis=-1)

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        name = self._image_name
        for ip in data.find_all_occurrences(f"{name}_dct_quant"):
            parent = data.get_parent_of_path(list(ip))
            y, cbcr = self.decode_fields(lambda sfx: parent[f"{name}_{sfx}"])
            for fname in _field_names(name, self._groups, self._geo):
                parent.remove_field(fname)
            parent.add_data_field(name, DType.UINT8)
            parent[name] = y
            parent.add_data_field(self.chroma_field_name, DType.UINT8)
            parent[self.chroma_field_name] = cbcr
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        name = self._image_name
        paths = data_empty.find_all_occurrences(f"{name}_dct_quant")
        if len(paths) == 0:
            raise KeyError(
                f"DCTWireUnpacker: no '{name}_dct_quant' fields — is "
                "DCTWirePacker (same arguments) ahead of this step?"
            )
        for ip in paths:
            parent = data_empty.get_parent_of_path(list(ip))
            types = _field_types(name, self._groups, self._geo)
            for fname, t in types.items():
                if not parent.path_exists(fname):
                    raise KeyError(
                        f"DCTWireUnpacker expects '{fname}' (produced by "
                        "DCTWirePacker with the same arguments)"
                    )
                if parent.get_type_of_field(fname) != t:
                    raise TypeError(
                        f"DCTWireUnpacker: '{fname}' must be {t}, got "
                        f"{parent.get_type_of_field(fname)}"
                    )
            for fname in types:
                parent.remove_field(fname)
            parent.add_data_field(name, DType.UINT8)
            parent.add_data_field(self.chroma_field_name, DType.UINT8)
        return data_empty


# --------------------------------------------------------------------------- #
# functional API (outside the pipeline) — the DCT-wire analog of
# wire_compression.compress_plane / decompress_plane
# --------------------------------------------------------------------------- #


def optimize_band_groups(
    jpeg_samples: Iterable[np.ndarray],
    source_hw,
    out_hw,
    max_groups: int = 12,
    field_cost_bits: int = 256,
) -> Tuple[Tuple[int, int], ...]:
    """Content-tuned static band partition: the best contiguous grouping of
    the ``m*m`` zigzag bands into at most ``max_groups`` groups, minimizing
    the same wire-cost model the packer's width chooser uses (bitplane bits
    + exception cost, summed over both component sets), plus
    ``field_cost_bits`` per group as a tie-breaker toward fewer wire fields.

    Offline tuning, exact-by-DP: per-band value histograms are additive, so
    the cost of any candidate group is the width-optimal cost of its summed
    histogram, and an O(bands^2 * max_groups) dynamic program over
    contiguous partitions is globally optimal for this model. Run it once
    on a handful of representative JPEGs and pass the result as the
    ``grouping`` of BOTH :class:`DCTWirePacker` and :class:`DCTWireUnpacker`
    — it is static geometry, exactly like ``source_hw``/``out_hw``.

    Measured on the headline bench content: ``"split12"`` ships ~1.13x the
    bytes of ``"band"`` (36 groups at m=6); the DP partition at the same
    12-field budget recovers most of that gap (see docs/performance.md).

    Args:
        jpeg_samples: a few encoded JPEGs (uint8 arrays) of the target
            content, all of size ``source_hw``.
        source_hw / out_hw: as for :class:`DCTWirePacker`.
        max_groups: field budget — groups per component set, including the
            fixed DC group. More groups = fewer bytes but more wire fields
            (each field has fixed per-transfer overhead on the real wire).
        field_cost_bits: modeled per-group-per-compset wire overhead; the
            default keeps zero-width tail bands merged instead of splitting
            them for 0 modeled gain.

    Returns:
        Tuple of ``(start, end)`` pairs, valid as a ``grouping`` argument.
    """
    geo = _Geometry(source_hw, out_hw)
    n_bands = geo.m * geo.m
    if max_groups < 2:
        raise ValueError(f"max_groups must be >= 2, got {max_groups}")
    if n_bands == 1:  # m=1: the DC band is the whole spectrum
        return ((0, 1),)
    per_band = band_groups(geo.m, "band")
    probe = DCTWirePacker(
        "image", source_hw, out_hw, grouping="band", num_threads=1
    )
    # summed per-band fits and value counts, per compset (bands >= 1 only:
    # the DC band is its own fixed group and cannot move)
    fits = {cs: None for cs in _COMPSETS}
    nval = {cs: 0 for cs in _COMPSETS}
    n_imgs = 0
    for jpeg in jpeg_samples:
        data = probe._read_bands(np.asarray(jpeg, np.uint8))
        n_imgs += 1
        for cs in _COMPSETS:
            enc = _CompsetEncoder(data[cs], per_band)
            f = np.stack(
                [enc.fits(g, _MODE_NONE) for g in range(1, n_bands)]
            )
            fits[cs] = f if fits[cs] is None else fits[cs] + f
            nval[cs] = enc.n_per_group[1]  # same for every band
    if n_imgs == 0:
        raise ValueError("optimize_band_groups needs at least one JPEG")

    # cost of grouping bands [a, b) (1-based band indices -> rows a-1..b-1)
    pre = {cs: np.cumsum(fits[cs], axis=0) for cs in _COMPSETS}

    from functools import lru_cache

    @lru_cache(maxsize=None)  # the k loop revisits every (a, b) interval
    def group_cost(a: int, b: int) -> float:
        c = field_cost_bits * len(_COMPSETS)
        for cs in _COMPSETS:
            s = pre[cs][b - 2] - (pre[cs][a - 2] if a > 1 else 0)
            _, bits = _optimal_width(
                s, (b - a) * nval[cs] * n_imgs, geo.exc_bits[cs]
            )
            c += bits
        return c

    # DP over bands 1..n_bands-1 with at most max_groups-1 groups
    n = n_bands - 1
    k_max = min(max_groups - 1, n)
    inf = float("inf")
    best = [[inf] * (n + 1) for _ in range(k_max + 1)]
    back = [[0] * (n + 1) for _ in range(k_max + 1)]
    best[0][0] = 0.0
    for k in range(1, k_max + 1):
        for j in range(k, n + 1):
            for i in range(k - 1, j):
                if best[k - 1][i] == inf:
                    continue
                c = best[k - 1][i] + group_cost(i + 1, j + 1)
                if c < best[k][j]:
                    best[k][j] = c
                    back[k][j] = i
    k_best = min(range(1, k_max + 1), key=lambda k: (best[k][n], k))
    bounds = [n]
    k, j = k_best, n
    while k > 0:
        j = back[k][j]
        bounds.append(j)
        k -= 1
    bounds.reverse()  # [0, ..., n] in band-1-based coordinates
    groups = [(0, 1)] + [
        (bounds[i] + 1, bounds[i + 1] + 1) for i in range(len(bounds) - 1)
    ]
    return tuple((int(a), int(b)) for a, b in groups)


def compress_jpeg_dct(jpeg_bytes, out_hw, grouping: Grouping = "split12"):
    """One-shot host-side encode of one JPEG to the DCT wire format.

    Returns a dict of wire arrays keyed by field SUFFIX (``"dcty0_bp"``,
    ..., ``"dct_quant"``) plus ``"source_hw"`` — feed the arrays (after
    transfer) to :func:`decompress_jpeg_dct` inside a jitted program.
    Widths/mode are chosen per call, so calls on different content may
    produce different shapes (= separate jit variants); batch through
    :class:`DCTWirePacker` for batch-uniform shapes.
    """
    from .. import native_jpeg

    jpeg_bytes = np.asarray(jpeg_bytes, np.uint8)
    source_hw = native_jpeg.probe(jpeg_bytes)
    packer = DCTWirePacker("image", source_hw, out_hw, grouping=grouping)
    s = SampleDataGroup()
    s.add_data_field("image", DType.UINT8)
    s["image"] = jpeg_bytes
    (out,) = packer._process_batch([s])
    fields = {
        fname[len("image_"):]: np.asarray(out[fname])
        for fname in _field_names("image", packer._groups, packer._geo)
    }
    fields["source_hw"] = source_hw
    return fields


def decompress_jpeg_dct(fields, out_hw, grouping: Grouping = "split12"):
    """Functional jit-compatible decode of :func:`compress_jpeg_dct` output.

    ``fields`` is the suffix-keyed mapping (``"source_hw"`` may ride along
    as a plain tuple — it is static geometry, not a traced array). Returns
    ``(y, cbcr)``: the uint8 luma plane at ``out_hw`` and the half-
    resolution CbCr, exactly the YUV 4:2:0 wire layout
    (:func:`accvlab_tpu.color.ycbcr420_to_rgb` completes the decode).
    """
    unpacker = DCTWireUnpacker(
        "image", fields["source_hw"], out_hw, grouping=grouping
    )
    return unpacker.decode_fields(lambda sfx: fields[sfx])
