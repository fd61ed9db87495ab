"""Lossless wire compression (WirePlanePacker / WirePlaneUnpacker).

The wire codec ships uint8 planes as bitplane-packed vertical-predictor
residuals with a PFOR exception list; the decoder is pure XLA inside the
fused device program. The contract under test: decode(encode(x)) == x
BITWISE for any uint8 plane, the packed wire is smaller than raw on smooth
content, and the pipeline integration (YUV wire + packer + unpacker +
color convert) is bit-identical to the uncompressed pipeline.
"""

import numpy as np
import pytest

from accvlab_tpu.pipeline import DType, PipelineDefinition, SampleDataGroup
from accvlab_tpu.pipeline.inputs import ShuffledShardedInputCallable
from accvlab_tpu.pipeline.processing_steps import (
    ImageDecoder,
    WirePlanePacker,
    WirePlaneUnpacker,
    YCbCrToRGBConverter,
)
from accvlab_tpu.pipeline.processing_steps.wire_compression import (
    _bit_lengths,
    _optimal_width,
    _zigzag,
)

from test_yuv_wire import JpegProvider, make_jpeg


# ------------------------- codec roundtrip ----------------------------- #


def pack_one(plane):
    """Encode a single plane through the batch-level step machinery."""
    sdg = SampleDataGroup()
    sdg.add_data_field("p", DType.UINT8)
    sdg["p"] = plane
    packer = WirePlanePacker("p")
    (out,) = packer._process_batch([sdg])
    return {
        sfx: np.asarray(out[f"p_wire_{sfx}"])
        for sfx in ("bp", "excp", "excv", "mode")
    }


def decode_one(fields, jit=False):
    import jax

    f = WirePlaneUnpacker._decode
    if jit:
        f = jax.jit(f)
    return np.asarray(
        f(fields["bp"], fields["excp"], fields["excv"], fields["mode"])
    )


PLANES = [
    ("smooth", None),
    ("noise", None),
    ("constant", None),
    ("gradient", None),
    ("spikes", None),
]


def make_plane(kind, shape=(24, 32), seed=0):
    rng = np.random.default_rng(seed)
    if kind == "smooth":
        # genuinely smooth: moderate-amplitude content upsampled 8x ->
        # vertical deltas of a few counts (photographic-like statistics)
        base = rng.integers(96, 192, (shape[0] // 8, shape[1] // 8), np.uint8)
        from PIL import Image

        return np.asarray(
            Image.fromarray(base).resize(shape[::-1], Image.BILINEAR), np.uint8
        )
    if kind == "noise":
        return rng.integers(0, 256, shape, np.uint8)
    if kind == "constant":
        return np.full(shape, 137, np.uint8)
    if kind == "gradient":
        return (
            (np.arange(shape[0])[:, None] + np.arange(shape[1])[None, :]) % 256
        ).astype(np.uint8)
    if kind == "spikes":
        p = np.full(shape, 100, np.uint8)
        idx = rng.integers(0, shape[0] * shape[1], 7)
        p.reshape(-1)[idx] = rng.integers(0, 256, 7)
        return p
    raise AssertionError(kind)


@pytest.mark.parametrize("kind", [k for k, _ in PLANES])
@pytest.mark.parametrize("jit", [False, True])
def test_roundtrip_bitwise(kind, jit):
    plane = make_plane(kind)
    fields = pack_one(plane)
    got = decode_one(fields, jit=jit)
    np.testing.assert_array_equal(got, plane)


def test_roundtrip_3d_chroma_like_field():
    # CbCr travels as (H/2, W/2, 2); vertical predictor over axis 0, the
    # interleaved channels ride along in the flattened row
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 256, (12, 16, 2), np.uint8)
    fields = pack_one(plane)
    # the mode field ships only the trailing dims BEYOND the row axis
    # (the row axis is derived from bp's width)
    assert fields["mode"].shape[1:] == (2,)
    got = decode_one(fields)
    assert got.shape == plane.shape
    np.testing.assert_array_equal(got, plane)


def test_constant_plane_needs_zero_bitplanes():
    fields = pack_one(make_plane("constant"))
    assert fields["bp"].shape[0] == 0
    # one real exception: the raw top-left value (both predictors keep it)
    n_res = 24 * 32
    assert int((fields["excp"] < n_res).sum()) <= 1


def test_spike_plane_uses_exceptions():
    plane = make_plane("spikes")
    fields = pack_one(plane)
    n_res = plane.shape[0] * plane.shape[1]
    n_exc = int((fields["excp"] < n_res).sum())
    # <= 4 per spike (each predictor touches up to 4 neighbors) + top-left
    assert 0 < n_exc <= 29
    assert fields["bp"].shape[0] <= 2  # base width stays tiny
    np.testing.assert_array_equal(decode_one(fields), plane)


def test_smooth_content_compresses():
    # realistic plane size: the fixed exception-bucket padding (>=64
    # entries) is noise at real sizes, dominant on toy ones
    plane = make_plane("smooth", shape=(192, 256))
    fields = pack_one(plane)
    wire = sum(a.nbytes for a in fields.values())
    assert wire < plane.nbytes * 0.8


def test_noise_content_never_explodes():
    # worst case: pure noise. The wire must stay close to raw (bounded by
    # 9 bitplanes + bucketed exception padding), never pathological.
    plane = make_plane("noise", shape=(64, 96))
    fields = pack_one(plane)
    # noise must select the VERTICAL predictor (the 2-D second difference
    # doubles noise) and stay bounded by 9 bitplanes + fixed paddings
    assert fields["mode"].shape[0] == 1
    wire = sum(a.nbytes for a in fields.values())
    assert wire < plane.nbytes * 9 / 8 + 96 + 64 * 8 + 2048


def test_batch_uniform_shapes_across_samples():
    """Samples with different content (different optimal widths / exception
    counts) must pack to identical shapes within one batch — the pipeline
    stacks per-sample leaves."""
    samples = []
    for kind in ("constant", "smooth", "noise"):
        sdg = SampleDataGroup()
        sdg.add_data_field("p", DType.UINT8)
        sdg["p"] = make_plane(kind)
        samples.append(sdg)
    out = WirePlanePacker("p")._process_batch(samples)
    shapes = [
        tuple(np.asarray(s[f"p_wire_{sfx}"]).shape for sfx in ("bp", "excp", "excv", "mode"))
        for s in out
    ]
    assert shapes[0] == shapes[1] == shapes[2]
    for s, kind in zip(out, ("constant", "smooth", "noise")):
        got = decode_one(
            {sfx: np.asarray(s[f"p_wire_{sfx}"]) for sfx in ("bp", "excp", "excv", "mode")}
        )
        np.testing.assert_array_equal(got, make_plane(kind))


def test_optimal_width_cost_model():
    # operates on zigzag VALUES (not bit lengths); returns (b, cost)
    # all-zero residuals -> b = 0
    assert _optimal_width(np.zeros((100,), np.uint16))[0] == 0
    # uniform 5-bit values (31 needs 5 bits) -> b = 5
    assert _optimal_width(np.full((100,), 31, np.uint16))[0] == 5
    # mostly 3-bit values with a few 9-bit outliers -> keep b = 3, pay
    # exceptions (cheaper than widening every value)
    zz = np.full((1000,), 7, np.uint16)
    zz[:5] = 510
    assert _optimal_width(zz)[0] == 3


def test_zigzag_mapping():
    r = np.array([0, -1, 1, -2, 2, -255, 255], np.int16)
    np.testing.assert_array_equal(
        _zigzag(r), np.array([0, 1, 2, 3, 4, 509, 510], np.uint16)
    )
    assert _bit_lengths(_zigzag(r)).max() == 9


# ------------------------- validation ---------------------------------- #


def test_packer_rejects_bad_inputs():
    sdg = SampleDataGroup()
    sdg.add_data_field("p", DType.UINT8)
    sdg["p"] = np.zeros((8, 9), np.uint8)  # width not divisible by 8
    with pytest.raises(ValueError, match="divisible by 8"):
        WirePlanePacker("p")._process_batch([sdg])
    sdg2 = SampleDataGroup()
    sdg2.add_data_field("p", DType.UINT8)
    sdg2["p"] = np.zeros((8,), np.uint8)  # 1-D
    with pytest.raises(ValueError, match=">=2-D"):
        WirePlanePacker("p")._process_batch([sdg2])


def test_packer_blueprint_rejects_non_uint8():
    bp = SampleDataGroup()
    bp.add_data_field("p", DType.FLOAT)
    with pytest.raises(TypeError, match="UINT8"):
        WirePlanePacker("p").check_input_data_format_and_set_output_data_format(bp)


def test_unpacker_without_packer_raises():
    bp = SampleDataGroup()
    bp.add_data_field("p", DType.UINT8)
    with pytest.raises(KeyError, match="WirePlanePacker ahead"):
        WirePlaneUnpacker("p").check_input_data_format_and_set_output_data_format(bp)


def test_blueprint_roundtrip():
    bp = SampleDataGroup()
    bp.add_data_field("p", DType.UINT8)
    mid = WirePlanePacker("p").check_input_data_format_and_set_output_data_format(bp)
    assert mid.find_all_occurrences("p") == ()
    assert len(mid.find_all_occurrences("p_wire_bp")) == 1
    out = WirePlaneUnpacker("p").check_input_data_format_and_set_output_data_format(mid)
    assert len(out.find_all_occurrences("p")) == 1
    assert out.find_all_occurrences("p_wire_bp") == ()


# --------------------- pipeline integration ---------------------------- #


def _run(steps, jpegs, batch_size=2):
    inp = ShuffledShardedInputCallable(
        JpegProvider(jpegs), batch_size=batch_size, shuffle=False
    )
    defn = PipelineDefinition(inp, steps)
    pipe = defn.get_pipeline(batch_size=batch_size, num_threads=2, seed=0)
    try:
        return pipe.run()
    finally:
        pipe.stop()


def test_pipeline_compressed_yuv_wire_bit_identical():
    """YUV wire + wire compression end to end: the delivered RGB must be
    bit-identical to the uncompressed YUV pipeline."""
    jpegs = [make_jpeg(seed=s) for s in range(4)]
    base = _run(
        [
            ImageDecoder("image", wire_format="yuv420"),
            YCbCrToRGBConverter("image"),
        ],
        jpegs,
    )
    packed = _run(
        [
            ImageDecoder("image", wire_format="yuv420"),
            WirePlanePacker(["image", "image_cbcr"]),
            WirePlaneUnpacker(["image", "image_cbcr"]),
            YCbCrToRGBConverter("image"),
        ],
        jpegs,
    )
    assert base.keys() == packed.keys()
    for k in base:
        np.testing.assert_array_equal(
            np.asarray(base[k]), np.asarray(packed[k]), err_msg=f"field {k}"
        )


def test_packed_wire_with_echo_mid_resume_bitwise():
    """Wire compression x data echoing x checkpoint/resume: replays reuse
    the transferred PACKED buffers (decode re-runs per replay with its own
    augmentation key), donation applies only on the final replay, and a
    mid-echo resume continues bit-identically."""
    from accvlab_tpu.pipeline.processing_steps import PhotoMetricDistorter

    jpegs = [make_jpeg(seed=s) for s in range(8)]

    def build():
        inp = ShuffledShardedInputCallable(
            JpegProvider(jpegs), batch_size=2, shuffle=True
        )
        defn = PipelineDefinition(
            inp,
            [
                ImageDecoder("image", wire_format="yuv420"),
                WirePlanePacker(["image", "image_cbcr"]),
                WirePlaneUnpacker(["image", "image_cbcr"]),
                YCbCrToRGBConverter("image"),
                PhotoMetricDistorter(
                    "image",
                    min_max_brightness=(-10.0, 10.0),
                    min_max_hue=(-5.0, 5.0),
                    min_max_contrast=(0.9, 1.1),
                    min_max_saturation=(0.9, 1.1),
                ),
            ],
            copy_external_source_passthrough_outputs=False,
        )
        return defn.get_pipeline(
            batch_size=2, num_threads=2, seed=3, echo_factor=2
        )

    ref = build()
    try:
        stream = [
            {k: np.asarray(v) for k, v in ref.run().items()} for _ in range(6)
        ]
    finally:
        ref.stop()

    # replays of one host batch differ only by augmentation (same source)
    assert not np.array_equal(stream[0]["image"], stream[1]["image"])

    # mid-echo checkpoint (after the first replay of host batch 1)
    pipe = build()
    try:
        for i in range(3):
            got = {k: np.asarray(v) for k, v in pipe.run().items()}
            for k in got:
                np.testing.assert_array_equal(got[k], stream[i][k])
        state = pipe.get_state()
        assert state["echo"] == {"factor": 2, "next": 1}
    finally:
        pipe.stop()

    fresh = build()
    try:
        fresh.set_state(state)
        for i in range(3, 6):
            got = {k: np.asarray(v) for k, v in fresh.run().items()}
            for k in got:
                np.testing.assert_array_equal(
                    got[k], stream[i][k], err_msg=f"batch {i} field {k}"
                )
    finally:
        fresh.stop()


def test_functional_api_roundtrip():
    """compress_plane / decompress_plane: the codec outside the pipeline
    (e.g. hand-built video-frame transfer paths)."""
    import jax

    from accvlab_tpu.pipeline.processing_steps import (
        compress_plane,
        decompress_plane,
    )

    for kind in ("smooth", "noise", "constant"):
        plane = make_plane(kind, shape=(40, 64))
        fields = compress_plane(plane)
        got = np.asarray(jax.jit(decompress_plane)(fields))
        np.testing.assert_array_equal(got, plane)


def test_roundtrip_fuzz_random_shapes_and_content():
    """Randomized roundtrip: shapes (2-D/3-D/4-D), content mixes, both
    predictor modes — decode must be bit-identical every time."""
    import jax

    rng = np.random.default_rng(42)
    from accvlab_tpu.pipeline.processing_steps import (
        compress_plane,
        decompress_plane,
    )

    decode = jax.jit(decompress_plane)  # fuzz the COMPILED path

    for trial in range(30):
        ndim = int(rng.integers(2, 5))
        h = int(rng.integers(1, 20))
        if ndim == 2:
            shape = (h, int(rng.integers(1, 12)) * 8)
        elif ndim == 3:
            w = int(rng.integers(1, 10))
            c = int(rng.integers(1, 5))
            while (w * c) % 8 != 0:
                c += 1
            shape = (h, w, c)
        else:
            shape = (h, 4, 2, int(rng.integers(1, 4)))
        kind = trial % 4
        if kind == 0:
            plane = rng.integers(0, 256, shape, np.uint8)
        elif kind == 1:
            plane = np.full(shape, int(rng.integers(0, 256)), np.uint8)
        elif kind == 2:  # smooth ramp + sparse spikes
            ramp = np.arange(np.prod(shape)) % 256
            plane = ramp.reshape(shape).astype(np.uint8)
            flat = plane.reshape(-1)
            idx = rng.integers(0, flat.size, max(1, flat.size // 50))
            flat[idx] = rng.integers(0, 256, idx.size)
        else:  # low-amplitude noise around a level
            plane = (128 + rng.integers(-6, 7, shape)).astype(np.uint8)
        fields = compress_plane(plane)
        got = np.asarray(decode(fields))
        np.testing.assert_array_equal(
            got, plane, err_msg=f"trial {trial} shape {shape} kind {kind}"
        )


def test_packed_wire_on_mesh_pipeline():
    """Wire compression composed with a sharded (mesh) pipeline: the packed
    fields shard over the data axis, the device decode runs inside the
    sharded program, and the delivered RGB matches the unsharded packed
    pipeline bit for bit."""
    from jax.sharding import PartitionSpec as P

    from accvlab_tpu.parallel import make_mesh

    jpegs = [make_jpeg(seed=s) for s in range(8)]

    def build(mesh):
        inp = ShuffledShardedInputCallable(
            JpegProvider(jpegs), batch_size=8, shuffle=False
        )
        defn = PipelineDefinition(
            inp,
            [
                ImageDecoder("image", wire_format="yuv420"),
                WirePlanePacker(["image", "image_cbcr"]),
                WirePlaneUnpacker(["image", "image_cbcr"]),
                YCbCrToRGBConverter("image"),
            ],
            copy_external_source_passthrough_outputs=False,
        )
        return defn.get_pipeline(batch_size=8, num_threads=2, seed=0, mesh=mesh)

    ref = build(mesh=None)
    try:
        expected = np.asarray(ref.run()["image"])
    finally:
        ref.stop()

    mesh = make_mesh()
    pipe = build(mesh=mesh)
    try:
        img = pipe.run()["image"]
        from jax.sharding import NamedSharding

        assert img.sharding.is_equivalent_to(
            NamedSharding(mesh, P("data", None, None, None)), img.ndim
        )
        np.testing.assert_array_equal(np.asarray(img), expected)
    finally:
        pipe.stop()


def test_packer_last_batch_stats():
    """Observability: the packer records mode/width/bytes of its most
    recent batch per field."""
    samples = []
    for kind in ("smooth", "smooth"):
        sdg = SampleDataGroup()
        sdg.add_data_field("p", DType.UINT8)
        sdg["p"] = make_plane(kind, shape=(64, 96))
        samples.append(sdg)
    packer = WirePlanePacker("p")
    packer._process_batch(samples)
    st = packer.last_batch_stats["p"]
    assert st["mode"] in ("vertical", "plane")
    assert 0 <= st["width"] <= 10
    assert st["exc_capacity"] >= 64
    assert st["raw_bytes"] == 2 * 64 * 96
    assert 0 < st["packed_bytes"] < st["raw_bytes"]


def test_native_encoder_matches_numpy_bytewise():
    """The C++ single-pass encoder must produce byte-identical wire fields
    to the numpy reference path (histograms, bitplanes, exception lists)."""
    from accvlab_tpu.pipeline import wire_native
    from accvlab_tpu.pipeline.processing_steps.wire_compression import (
        _MODE_PLANE,
        _MODE_VERTICAL,
        _hist_cum,
        _pack_fields,
        _residuals,
    )

    assert wire_native.get_lib() is not None  # g++ is baked into the image

    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 256, (24, 32), np.uint8),
        rng.integers(0, 256, (9, 8, 2), np.uint8),
        make_plane("smooth", shape=(40, 64)),
        np.full((5, 16), 77, np.uint8),
        rng.integers(0, 256, (1, 24), np.uint8),  # H=1
    ]
    for plane in cases:
        group = int(np.prod(plane.shape[2:], dtype=np.int64))
        p2d = np.ascontiguousarray(plane.reshape(plane.shape[0], -1))
        h1, h2 = wire_native.analyze(p2d, group)
        zz1, zz2 = _residuals(plane)
        np.testing.assert_array_equal(np.cumsum(h1), _hist_cum(zz1))
        np.testing.assert_array_equal(np.cumsum(h2), _hist_cum(zz2))
        for mode, zz in ((_MODE_VERTICAL, zz1), (_MODE_PLANE, zz2)):
            for b in (0, 2, 5, 9):
                cap = max(64, int((zz >= (1 << b)).sum()))
                got = wire_native.pack(p2d, group, mode, b, cap)
                ref = _pack_fields(zz, b, cap)
                for g, r, what in zip(got, ref, ("bp", "excp", "excv")):
                    np.testing.assert_array_equal(
                        g, r, err_msg=f"{plane.shape} mode={mode} b={b} {what}"
                    )


def test_packed_wire_with_process_workers():
    """Wire compression composes with worker_mode='process': per-sample
    host work (decode) runs in spawned workers, the batch-level packer in
    the producer thread; output matches the thread-mode pipeline bitwise."""
    jpegs = [make_jpeg(seed=s) for s in range(4)]

    def build(worker_mode):
        inp = ShuffledShardedInputCallable(
            JpegProvider(jpegs), batch_size=2, shuffle=False
        )
        defn = PipelineDefinition(
            inp,
            [
                ImageDecoder("image", wire_format="yuv420"),
                WirePlanePacker(["image", "image_cbcr"]),
                WirePlaneUnpacker(["image", "image_cbcr"]),
                YCbCrToRGBConverter("image"),
            ],
            copy_external_source_passthrough_outputs=False,
        )
        return defn.get_pipeline(
            batch_size=2, num_threads=2, seed=0, worker_mode=worker_mode
        )

    ref = build("thread")
    try:
        expected = np.asarray(ref.run()["image"])
    finally:
        ref.stop()

    pipe = build("process")
    try:
        got = np.asarray(pipe.run()["image"])
    finally:
        pipe.stop()
    np.testing.assert_array_equal(got, expected)


def test_definition_checker_matches_executor_phase_order():
    """A per-sample host step listed AFTER a batch-level step still runs
    BEFORE it at runtime (the executor hoists batch-level steps to the end
    of the host stage) — the definition-level format checker must validate
    in that same order instead of rejecting a runnable pipeline."""
    from accvlab_tpu.pipeline.processing_steps import PipelineStepBase

    class TouchImage(PipelineStepBase):
        """Per-sample host step that requires the raw 'image' field."""

        placement = "host"

        def _check_and_adjust_data_format_input_to_output(self, bp):
            if not bp.find_all_occurrences("image"):
                raise KeyError("TouchImage needs 'image'")
            return bp

        def _process(self, data):
            return data

    jpegs = [make_jpeg(seed=0)]

    def build():
        inp = ShuffledShardedInputCallable(
            JpegProvider(jpegs), batch_size=1, shuffle=False
        )
        return PipelineDefinition(
            inp,
            [
                ImageDecoder("image", wire_format="yuv420"),
                WirePlanePacker(["image", "image_cbcr"]),  # batch-level
                TouchImage(),  # listed after, but RUNS before the packer
                WirePlaneUnpacker(["image", "image_cbcr"]),
                YCbCrToRGBConverter("image"),
            ],
            copy_external_source_passthrough_outputs=False,
        )

    out = build().check_and_get_output_data_structure()
    assert len(out.find_all_occurrences("image")) == 1
    # and the pipeline actually runs in that order
    pipe = build().get_pipeline(batch_size=1, num_threads=1, seed=0)
    try:
        img = np.asarray(pipe.run()["image"])
        assert img.ndim == 4 and img.shape[-1] == 3
    finally:
        pipe.stop()
