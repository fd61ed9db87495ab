"""YUV 4:2:0 wire format: host subsample + device color-convert.

Model: the reference ships NV12 to the accelerator and converts there
(``VideoCodecSDKUtils/.../Utils/ColorSpace.cu:227-283``); these tests cover
the TPU rebuild's equivalent split (``accvlab_tpu.color`` +
``ImageDecoder(wire_format='yuv420')`` + ``YCbCrToRGBConverter``) against a
scalar numpy oracle and against the established RGB-wire path.
"""

import io

import numpy as np
import pytest

from accvlab_tpu.color import (
    subsample_chroma_420,
    ycbcr420_to_rgb,
    ycbcr_coefficients,
    yuv420p_planes_to_wire,
)
from accvlab_tpu.pipeline import DType, PipelineDefinition, SampleDataGroup
from accvlab_tpu.pipeline.inputs import DataProvider, ShuffledShardedInputCallable
from accvlab_tpu.pipeline.processing_steps import (
    ImageDecoder,
    ImageRange01Normalizer,
    YCbCrToRGBConverter,
)


# ------------------------- scalar oracle ------------------------------ #


def oracle_ycbcr420_to_rgb(y, cbcr, matrix="bt601", color_range="full"):
    """Order-faithful scalar re-statement of the conversion contract."""
    ys, yo, c_rr, c_gb, c_gr, c_bb = ycbcr_coefficients(matrix, color_range)
    h, w = y.shape
    out = np.empty((h, w, 3), np.uint8)
    for i in range(h):
        for j in range(w):
            yf = (np.float32(y[i, j]) - yo) * ys
            cb = np.float32(cbcr[i // 2, j // 2, 0]) - np.float32(128.0)
            cr = np.float32(cbcr[i // 2, j // 2, 1]) - np.float32(128.0)
            px = (yf + c_rr * cr, yf - c_gb * cb - c_gr * cr, yf + c_bb * cb)
            for k, v in enumerate(px):
                out[i, j, k] = np.uint8(np.clip(np.floor(v + np.float32(0.5)), 0, 255))
    return out


# ------------------------- unit tests ---------------------------------- #


def test_subsample_chroma_420_matches_scalar_box_filter():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (8, 12, 3), np.uint8)
    y, cbcr = subsample_chroma_420(img)
    np.testing.assert_array_equal(y, img[..., 0])
    assert cbcr.shape == (4, 6, 2)
    for i in range(4):
        for j in range(6):
            for c in range(2):
                block = img[2 * i : 2 * i + 2, 2 * j : 2 * j + 2, c + 1].astype(int)
                assert cbcr[i, j, c] == (block.sum() + 2) // 4


def test_subsample_chroma_rejects_odd_sizes():
    with pytest.raises(ValueError, match="even"):
        subsample_chroma_420(np.zeros((7, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="even"):
        subsample_chroma_420(np.zeros((8, 9, 3), np.uint8))
    with pytest.raises(ValueError, match="YCbCr"):
        subsample_chroma_420(np.zeros((8, 8, 4), np.uint8))


@pytest.mark.parametrize("matrix", ["bt601", "bt709"])
@pytest.mark.parametrize("color_range", ["full", "limited"])
def test_ycbcr420_to_rgb_matches_scalar_oracle(matrix, color_range):
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (6, 8), np.uint8)
    cbcr = rng.integers(0, 256, (3, 4, 2), np.uint8)
    got = ycbcr420_to_rgb(y, cbcr, matrix=matrix, color_range=color_range)
    np.testing.assert_array_equal(
        got, oracle_ycbcr420_to_rgb(y, cbcr, matrix, color_range)
    )


def test_ycbcr420_to_rgb_under_jit_matches_numpy():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    y = rng.integers(0, 256, (2, 6, 8), np.uint8)  # leading batch dim
    cbcr = rng.integers(0, 256, (2, 3, 4, 2), np.uint8)
    host = ycbcr420_to_rgb(y, cbcr)
    dev = jax.jit(lambda a, b: ycbcr420_to_rgb(a, b))(jnp.asarray(y), jnp.asarray(cbcr))
    np.testing.assert_array_equal(host, np.asarray(dev))


def test_gray_image_round_trips_exactly():
    # chroma == 128 -> RGB == Y replicated; conversion must be lossless
    y = np.arange(256, dtype=np.uint8).reshape(16, 16)
    cbcr = np.full((8, 8, 2), 128, np.uint8)
    rgb = ycbcr420_to_rgb(y, cbcr)
    for c in range(3):
        np.testing.assert_array_equal(rgb[..., c], y)


def test_limited_range_maps_studio_swing():
    # Y=16 -> 0, Y=235 -> 255 in limited range
    y = np.array([[16, 235]] * 2, np.uint8)
    cbcr = np.full((1, 1, 2), 128, np.uint8)
    rgb = ycbcr420_to_rgb(y, cbcr, color_range="limited")
    assert rgb[0, 0].tolist() == [0, 0, 0]
    assert rgb[0, 1].tolist() == [255, 255, 255]


def test_yuv420p_planes_to_wire_layout():
    u = np.arange(6, dtype=np.uint8).reshape(2, 3)
    v = (np.arange(6, dtype=np.uint8) + 100).reshape(2, 3)
    w = yuv420p_planes_to_wire(u, v)
    np.testing.assert_array_equal(w[..., 0], u)
    np.testing.assert_array_equal(w[..., 1], v)


def test_bad_matrix_and_range_raise():
    with pytest.raises(ValueError, match="matrix"):
        ycbcr_coefficients("smpte240m")
    with pytest.raises(ValueError, match="color_range"):
        ycbcr_coefficients("bt601", "extended")


def test_bt2020_coefficients():
    # Kr=0.2627, Kb=0.0593 (non-constant-luminance): spot-check the derived
    # full-range cross terms
    ys, yo, c_rr, c_gb, c_gr, c_bb = ycbcr_coefficients("bt2020", "full")
    assert abs(c_rr - 2 * (1 - 0.2627)) < 1e-6
    assert abs(c_bb - 2 * (1 - 0.0593)) < 1e-6
    kg = 1 - 0.2627 - 0.0593
    assert abs(c_gb - 2 * 0.0593 * (1 - 0.0593) / kg) < 1e-6
    assert abs(c_gr - 2 * 0.2627 * (1 - 0.2627) / kg) < 1e-6


# --------------------- pipeline integration ---------------------------- #


def make_jpeg(hw=(32, 48), seed=0, smooth=True):
    from PIL import Image

    rng = np.random.default_rng(seed)
    if smooth:
        base = rng.integers(0, 255, (hw[0] // 8, hw[1] // 8, 3), np.uint8)
        img = np.asarray(
            Image.fromarray(base).resize((hw[1], hw[0]), Image.BILINEAR), np.uint8
        )
    else:
        img = rng.integers(0, 255, (*hw, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    return np.frombuffer(buf.getvalue(), np.uint8).copy()


class JpegProvider(DataProvider):
    def __init__(self, jpegs):
        self._jpegs = jpegs

    @property
    def sample_data_structure(self):
        root = SampleDataGroup()
        root.add_data_field("image", DType.UINT8)
        return root

    def get_data(self, sample_index):
        sdg = self.sample_data_structure
        sdg["image"] = self._jpegs[sample_index % len(self._jpegs)]
        return sdg

    def get_number_of_samples(self):
        return len(self._jpegs)


def run_pipeline(steps, jpegs, batch_size=2):
    inp = ShuffledShardedInputCallable(
        JpegProvider(jpegs), batch_size=batch_size, shuffle=False
    )
    defn = PipelineDefinition(inp, steps)
    pipe = defn.get_pipeline(batch_size=batch_size, num_threads=2, seed=0)
    try:
        return pipe.run()
    finally:
        pipe.stop()


def test_yuv_wire_blueprint_propagation():
    inp = ShuffledShardedInputCallable(
        JpegProvider([make_jpeg()]), batch_size=1, shuffle=False
    )
    defn = PipelineDefinition(
        inp, [ImageDecoder("image", wire_format="yuv420"), YCbCrToRGBConverter("image")]
    )
    out_bp = defn.check_and_get_output_data_structure()
    # chroma field added by the decoder, consumed by the converter
    assert out_bp.find_all_occurrences("image_cbcr") == ()
    defn_no_conv = PipelineDefinition(inp, [ImageDecoder("image", wire_format="yuv420")])
    bp2 = defn_no_conv.check_and_get_output_data_structure()
    assert len(bp2.find_all_occurrences("image_cbcr")) == 1


def test_converter_without_decoder_chroma_raises():
    inp = ShuffledShardedInputCallable(
        JpegProvider([make_jpeg()]), batch_size=1, shuffle=False
    )
    defn = PipelineDefinition(inp, [ImageDecoder("image"), YCbCrToRGBConverter("image")])
    with pytest.raises(KeyError, match="image_cbcr"):
        defn.check_and_get_output_data_structure()


def test_decoder_yuv_param_validation():
    with pytest.raises(ValueError, match="as_bgr"):
        ImageDecoder("image", as_bgr=True, wire_format="yuv420")
    with pytest.raises(ValueError, match="string"):
        ImageDecoder(0, wire_format="yuv420")
    with pytest.raises(ValueError, match="wire_format"):
        ImageDecoder("image", wire_format="nv12")


def test_yuv_host_stage_ships_half_the_bytes():
    jpeg = make_jpeg(hw=(32, 48))
    dec = ImageDecoder("image", wire_format="yuv420")
    bp = JpegProvider([jpeg]).sample_data_structure
    bp = dec.check_input_data_format_and_set_output_data_format(bp)
    sdg = bp.get_empty_like_self()
    sdg["image"] = jpeg
    out = dec._process(sdg)
    y = out["image"]
    cbcr = out["image_cbcr"]
    assert y.shape == (32, 48) and y.dtype == np.uint8
    assert cbcr.shape == (16, 24, 2) and cbcr.dtype == np.uint8
    wire = y.nbytes + cbcr.nbytes
    assert wire * 2 == 32 * 48 * 3  # exactly half of RGB


def test_yuv_pipeline_matches_rgb_pipeline_within_chroma_tolerance():
    """Full pipeline parity: decode->convert via the YUV wire vs the RGB
    wire. Differences come only from (a) chroma subsample/upsample (bounded
    by the image's chroma gradient; the JPEG stored 4:2:0 chroma anyway) and
    (b) float vs PIL integer matrix rounding."""
    jpegs = [make_jpeg(seed=s) for s in range(2)]
    rgb_out = run_pipeline([ImageDecoder("image")], jpegs)
    yuv_out = run_pipeline(
        [ImageDecoder("image", wire_format="yuv420"), YCbCrToRGBConverter("image")],
        jpegs,
    )
    a = np.asarray(rgb_out["image"], np.int32)
    b = np.asarray(yuv_out["image"], np.int32)
    assert a.shape == b.shape
    diff = np.abs(a - b)
    # the synthetic image has near-worst-case chroma gradients (8x8 block
    # noise); PIL "fancy" chroma upsampling vs the device's nearest upsample
    # (the reference GPU kernels' sampling) differ by a few codes there —
    # measured ~4. Natural images sit far lower.
    assert diff.mean() < 6.0, f"mean |diff| {diff.mean():.2f}"
    # luma channel-average is chroma-free to first order -> tight
    assert np.abs(a.mean() - b.mean()) < 1.0


def test_yuv_pipeline_with_fused_resize_and_normalize():
    jpegs = [make_jpeg(hw=(40, 64), seed=7)]
    out = run_pipeline(
        [
            ImageDecoder("image", wire_format="yuv420", decode_resize_hw=(24, 32)),
            YCbCrToRGBConverter("image"),
            ImageRange01Normalizer("image"),
        ],
        jpegs,
        batch_size=1,
    )
    img = np.asarray(out["image"])
    assert img.shape == (1, 24, 32, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0

    rgb = run_pipeline(
        [
            ImageDecoder("image", decode_resize_hw=(24, 32)),
            ImageRange01Normalizer("image"),
        ],
        jpegs,
        batch_size=1,
    )
    ref = np.asarray(rgb["image"])
    # resize order differs too (YCbCr-space resize + subsample vs RGB-space
    # resize after fancy upsample) on a block-noise image; measured ~8/255
    assert np.abs(img - ref).mean() < 12.0 / 255.0


# --------------------- video engine YUV wire --------------------------- #


@pytest.fixture(scope="module")
def vclip(tmp_path_factory):
    from accvlab_tpu.video import write_video
    from accvlab_tpu.video.encode import make_moving_shape_frames

    base = tmp_path_factory.mktemp("yuvclip")
    frames = make_moving_shape_frames(24, hw=(64, 96), seed=11)
    path = str(base / "clip.mp4")
    write_video(path, frames, fps=12, gop_size=8)
    return path, frames


def test_video_decode_yuv_matches_rgb_path(vclip):
    from accvlab_tpu.video import GopDecoder

    path, frames = vclip
    dec = GopDecoder()
    ids = [0, 5, 13]
    rgb = dec.Decode([path] * len(ids), ids)
    yuv = dec.DecodeYUV([path] * len(ids), ids)
    for r, f in zip(yuv, ids):
        assert r.y.shape == (64, 96) and r.cbcr.shape == (32, 48, 2)
        assert r.y.nbytes + r.cbcr.nbytes == 64 * 96 * 3 // 2  # half of RGB
        assert r.matrix == "bt601" and r.color_range == "limited"
    for r, g in zip(yuv, rgb):
        # our float matrix + nearest chroma upsample vs swscale's fixed-point
        # path on the same decoded frame
        d = np.abs(r.to_rgb().astype(np.int32) - g.astype(np.int32))
        assert d.mean() < 4.0, f"mean |diff| {d.mean():.2f}"
    # both must be the actual content, not just mutually close
    for r, f in zip(yuv, ids):
        d = np.abs(r.to_rgb().astype(np.int32) - frames[f].astype(np.int32))
        assert d.mean() < 24.0


def test_video_decode_yuv_list(vclip):
    from accvlab_tpu.video import GopDecoder

    path, _ = vclip
    dec = GopDecoder()
    packets, firsts, lens = dec.GetGOP([path, path], [3, 9])
    ids = [[firsts[0], 3], [9]]  # keyframe placement is encoder-dependent
    out = dec.DecodeFromGOPListYUV(packets, ids)
    assert len(out) == 2 and len(out[0]) == 2 and len(out[1]) == 1
    rgb = dec.DecodeFromGOPListRGB(packets, ids)
    for yrow, grow in zip(out, rgb):
        for r, g in zip(yrow, grow):
            assert np.abs(
                r.to_rgb().astype(np.int32) - g.astype(np.int32)
            ).mean() < 4.0


def test_stream_reader_read_yuv(vclip):
    from accvlab_tpu.video.readers import _StreamReader

    path, frames = vclip
    r = _StreamReader(path)
    try:
        for fid in (0, 7, 2):  # forward then re-seek
            yf = r.read_yuv(fid)
            g = r.read(fid)
            assert np.abs(
                yf.to_rgb().astype(np.int32) - g.astype(np.int32)
            ).mean() < 4.0
    finally:
        r.close()


def test_converter_as_bgr():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (4, 4), np.uint8)
    cbcr = rng.integers(0, 256, (2, 2, 2), np.uint8)
    bp = SampleDataGroup()
    bp.add_data_field("image", DType.UINT8)
    bp.add_data_field("image_cbcr", DType.UINT8)
    step_rgb = YCbCrToRGBConverter("image")
    step_bgr = YCbCrToRGBConverter("image", as_bgr=True)

    def run(step):
        sdg = bp.get_empty_like_self()
        sdg["image"], sdg["image_cbcr"] = y, cbcr
        return np.asarray(step(sdg)["image"])

    np.testing.assert_array_equal(run(step_rgb), run(step_bgr)[..., ::-1])


# ---------------------- native libjpeg fast path ------------------------ #


def _native_available():
    from accvlab_tpu.pipeline import native_jpeg

    return native_jpeg.available()


@pytest.mark.skipif(not _native_available(), reason="libjpeg dev unavailable")
def test_native_decoder_matches_pil_path():
    from accvlab_tpu.pipeline import native_jpeg
    from accvlab_tpu.color import subsample_chroma_420
    from PIL import Image

    jpeg = make_jpeg(hw=(372, 512), seed=5)
    assert native_jpeg.probe(jpeg) == (372, 512)
    y, cbcr = native_jpeg.decode_yuv420(jpeg, (256, 352))
    assert y.shape == (256, 352) and cbcr.shape == (128, 176, 2)

    im = Image.open(io.BytesIO(jpeg.tobytes()))
    im.draft("YCbCr", (352, 256))
    im = im.convert("YCbCr")
    if im.size != (352, 256):
        im = im.resize((352, 256), Image.BILINEAR)
    py, pcbcr = subsample_chroma_420(np.asarray(im, np.uint8))
    # different DCT scale (M/8 vs PIL's power-of-2) + resize path: tolerance
    assert np.abs(y.astype(int) - py.astype(int)).mean() < 2.0
    assert np.abs(cbcr.astype(int) - pcbcr.astype(int)).mean() < 4.0


@pytest.mark.skipif(not _native_available(), reason="libjpeg dev unavailable")
def test_native_decoder_identity_size_and_gray():
    from accvlab_tpu.pipeline import native_jpeg
    from PIL import Image

    # exact-size decode (no resize)
    jpeg = make_jpeg(hw=(32, 48), seed=6)
    y, cbcr = native_jpeg.decode_yuv420(jpeg, (32, 48))
    ref = np.asarray(
        Image.open(io.BytesIO(jpeg.tobytes())).convert("YCbCr"), np.uint8
    )
    assert np.abs(y.astype(int) - ref[..., 0].astype(int)).mean() < 1.5

    # grayscale JPEG -> neutral chroma
    g = np.asarray(
        Image.open(io.BytesIO(jpeg.tobytes())).convert("L"), np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(g).save(buf, format="JPEG", quality=92)
    gj = np.frombuffer(buf.getvalue(), np.uint8).copy()
    gy, gcbcr = native_jpeg.decode_yuv420(gj, (32, 48))
    assert (gcbcr == 128).all()
    assert np.abs(gy.astype(int) - g.astype(int)).mean() < 2.0


@pytest.mark.skipif(not _native_available(), reason="libjpeg dev unavailable")
def test_native_decoder_error_paths():
    from accvlab_tpu.pipeline import native_jpeg

    with pytest.raises(ValueError):
        native_jpeg.probe(np.zeros(16, np.uint8))
    jpeg = make_jpeg()
    with pytest.raises(ValueError):
        native_jpeg.decode_yuv420(jpeg, (31, 48))  # odd target
    with pytest.raises(ValueError):
        native_jpeg.decode_yuv420(jpeg[: jpeg.nbytes // 4], (32, 48))  # truncated


def test_yuv_decoder_png_falls_back_to_pil():
    """Non-JPEG bytes in yuv420 mode must still decode (PIL fallback)."""
    from PIL import Image

    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (16, 20, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png = np.frombuffer(buf.getvalue(), np.uint8).copy()
    dec = ImageDecoder("image", wire_format="yuv420")
    bp = JpegProvider([png]).sample_data_structure
    bp = dec.check_input_data_format_and_set_output_data_format(bp)
    sdg = bp.get_empty_like_self()
    sdg["image"] = png
    out = dec._process(sdg)
    assert out["image"].shape == (16, 20)
    assert out["image_cbcr"].shape == (8, 10, 2)


def test_sample_reader_yuv_sync_and_async(vclip):
    from accvlab_tpu.video import CreateSampleReader

    path, frames = vclip
    r = CreateSampleReader(max_readers=4, num_workers=2)
    try:
        out = r.run_yuv_out([path, path], [3, 10])
        for yf, fid in zip(out, (3, 10)):
            assert yf.y.shape == (64, 96) and yf.cbcr.shape == (32, 48, 2)
            d = np.abs(yf.to_rgb().astype(np.int32) - frames[fid].astype(np.int32))
            assert d.mean() < 24.0
        # async with the single-in-flight contract; key includes yuv
        r.DecodeAsync([path], [5], yuv=True)
        with pytest.raises(RuntimeError, match="does not match"):
            r.GetBuffer([path], [5])  # rgb key != yuv key
        (yf,) = r.GetBuffer([path], [5], yuv=True)
        rgb_ref = r.run_rgb_out([path], [5])[0]
        assert np.abs(
            yf.to_rgb().astype(np.int32) - rgb_ref.astype(np.int32)
        ).mean() < 4.0
    finally:
        r.ReleaseResources()


def test_batch_async_reader_yuv(vclip):
    from accvlab_tpu.video import CreateBatchAsyncStreamReader

    path, frames = vclip
    r = CreateBatchAsyncStreamReader(max_readers=4, num_workers=2)
    try:
        ids = [[2, 3], [8, 9]]
        r.Decode([path, path], ids, yuv=True)
        out = r.GetBuffer([path, path], ids, yuv=True)
        assert len(out) == 2 and len(out[0]) == 2
        for row, id_row in zip(out, ids):
            for yf, fid in zip(row, id_row):
                d = np.abs(
                    yf.to_rgb().astype(np.int32) - frames[fid].astype(np.int32)
                )
                assert d.mean() < 24.0
    finally:
        r.ReleaseResources()


def test_cmyk_jpeg_falls_back_to_pil():
    """CMYK JPEGs can't convert to YCbCr inside libjpeg — the native path
    must decline and the PIL fallback must still produce wire planes."""
    from PIL import Image

    rng = np.random.default_rng(12)
    img = rng.integers(0, 255, (16, 20, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).convert("CMYK").save(buf, format="JPEG", quality=90)
    cmyk_jpeg = np.frombuffer(buf.getvalue(), np.uint8).copy()
    dec = ImageDecoder("image", wire_format="yuv420")
    bp = JpegProvider([cmyk_jpeg]).sample_data_structure
    bp = dec.check_input_data_format_and_set_output_data_format(bp)
    sdg = bp.get_empty_like_self()
    sdg["image"] = cmyk_jpeg
    out = dec._process(sdg)
    assert out["image"].shape == (16, 20)
    assert out["image_cbcr"].shape == (8, 10, 2)


def test_video_fused_decode_resize_yuv(vclip):
    """out_hw fuses an SWS_AREA resize into the decode pass — the video
    analog of ImageDecoder(decode_resize_hw=...): wire bytes drop by the
    area ratio, content matches an area-average of the full-res planes."""
    from accvlab_tpu.video import GopDecoder
    from accvlab_tpu.video.readers import BatchAsyncStreamReader, SampleReader

    path, frames = vclip
    dec = GopDecoder()
    ids = [0, 5, 13]
    full = dec.DecodeYUV([path] * len(ids), ids)
    half = dec.DecodeYUV([path] * len(ids), ids, out_hw=(32, 48))
    for h, f in zip(half, full):
        assert h.y.shape == (32, 48) and h.cbcr.shape == (16, 24, 2)
        assert h.y.nbytes + h.cbcr.nbytes == (64 * 96 * 3 // 2) // 4
        # luma ~ 2x2 area average of the full-res plane (SWS_AREA)
        ref = f.y.reshape(32, 2, 48, 2).mean(axis=(1, 3))
        assert np.abs(ref - h.y.astype(np.float64)).mean() < 4.0
        assert h.matrix == f.matrix and h.color_range == f.color_range
    # content check against the source frames
    for h, fid in zip(half, ids):
        src = frames[fid].reshape(32, 2, 48, 2, 3).mean(axis=(1, 3))
        d = np.abs(h.to_rgb().astype(np.float64) - src)
        assert d.mean() < 24.0

    # explicit native size == default path, bit-identical
    same = dec.DecodeYUV([path] * len(ids), ids, out_hw=(64, 96))
    for a, b in zip(same, full):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cbcr, b.cbcr)

    # GOP-list + reader paths agree with the bundle path
    bundles, _, _ = dec.GetGOP([path] * len(ids), ids)
    lst = dec.DecodeFromGOPListYUV(bundles, [[i] for i in ids], out_hw=(32, 48))
    r = SampleReader()
    try:
        via_reader = r.run_yuv_out([path] * len(ids), ids, out_hw=(32, 48))
        for (a,), b, c in zip(lst, half, via_reader):
            np.testing.assert_array_equal(a.y, b.y)
            np.testing.assert_array_equal(c.y, b.y)
            np.testing.assert_array_equal(a.cbcr, b.cbcr)
            np.testing.assert_array_equal(c.cbcr, b.cbcr)
        # async request key includes out_hw: mismatched collect rejected
        r.DecodeAsync([path], [3], yuv=True, out_hw=(32, 48))
        with pytest.raises(RuntimeError, match="does not match"):
            r.GetBuffer([path], [3], yuv=True, out_hw=(16, 24))
        [yf] = r.GetBuffer([path], [3], yuv=True, out_hw=(32, 48))
        assert yf.y.shape == (32, 48)
    finally:
        r.ReleaseResources()

    b = BatchAsyncStreamReader()
    try:
        b.Decode([path], [[2, 7]], yuv=True, out_hw=(16, 24))
        [row] = b.GetBuffer([path], [[2, 7]], yuv=True, out_hw=(16, 24))
        assert [f.y.shape for f in row] == [(16, 24), (16, 24)]
    finally:
        b.ReleaseResources()

    # invalid targets rejected before any native call
    with pytest.raises(ValueError, match="even"):
        dec.DecodeYUV([path], [0], out_hw=(33, 48))
    with pytest.raises(ValueError, match="even"):
        r2 = SampleReader()
        try:
            r2.run_yuv_out([path], [0], out_hw=(0, 48))
        finally:
            r2.ReleaseResources()


def test_video_fused_decode_resize_rgb(vclip):
    """out_hw on the RGB paths (Decode/DecodeFromGOP*RGB/readers): same
    fused swscale resize as the YUV wire, no 4:2:0 even-dims constraint."""
    from accvlab_tpu.video import GopDecoder
    from accvlab_tpu.video.readers import BatchAsyncStreamReader, SampleReader

    path, frames = vclip
    dec = GopDecoder()
    ids = [0, 5, 13]
    full = dec.Decode([path] * len(ids), ids)
    half = dec.Decode([path] * len(ids), ids, out_hw=(32, 48))
    for h, f in zip(half, full):
        assert h.shape == (32, 48, 3) and h.dtype == np.uint8
        # SWS_AREA downscale ~ 2x2 area average of the full-res decode
        ref = f.reshape(32, 2, 48, 2, 3).astype(np.float64).mean(axis=(1, 3))
        assert np.abs(ref - h.astype(np.float64)).mean() < 4.0
    for h, fid in zip(half, ids):
        src = frames[fid].reshape(32, 2, 48, 2, 3).mean(axis=(1, 3))
        assert np.abs(h.astype(np.float64) - src).mean() < 24.0

    # explicit native size == default path, bit-identical
    same = dec.Decode([path] * len(ids), ids, out_hw=(64, 96))
    for a, b in zip(same, full):
        np.testing.assert_array_equal(a, b)

    # odd targets are fine on the RGB path (no 4:2:0 constraint)
    odd = dec.Decode([path], [5], out_hw=(31, 47))
    assert odd[0].shape == (31, 47, 3)

    # GOP-list path agrees with the one-shot path
    bundles, _, _ = dec.GetGOP([path] * len(ids), ids)
    lst = dec.DecodeFromGOPListRGB(bundles, [[i] for i in ids], out_hw=(32, 48))
    for (a,), b in zip(lst, half):
        np.testing.assert_array_equal(a, b)

    r = SampleReader()
    try:
        via_reader = r.run_rgb_out([path] * len(ids), ids, out_hw=(32, 48))
        for a, b in zip(via_reader, half):
            np.testing.assert_array_equal(a, b)
        # async request key includes out_hw on the RGB path too
        r.DecodeAsync([path], [3], out_hw=(32, 48))
        with pytest.raises(RuntimeError, match="does not match"):
            r.GetBuffer([path], [3])  # native-size key != resized key
        [rf] = r.GetBuffer([path], [3], out_hw=(32, 48))
        assert rf.shape == (32, 48, 3)
    finally:
        r.ReleaseResources()

    b = BatchAsyncStreamReader()
    try:
        b.Decode([path], [[2, 7]], out_hw=(16, 24))
        [row] = b.GetBuffer([path], [[2, 7]], out_hw=(16, 24))
        assert [f.shape for f in row] == [(16, 24, 3), (16, 24, 3)]
        # as_bgr composes with the fused resize (swscale's RGB24 and BGR24
        # converters round independently: channel-swapped outputs agree to
        # within a couple of codes, not bitwise)
        b.Decode([path], [[2]], as_bgr=True, out_hw=(16, 24))
        [[bgr]] = b.GetBuffer([path], [[2]], as_bgr=True, out_hw=(16, 24))
        d_bgr = np.abs(
            bgr[..., ::-1].astype(np.int32) - row[0].astype(np.int32)
        )
        assert d_bgr.mean() < 2.0 and d_bgr.max() <= 8
    finally:
        b.ReleaseResources()

    # invalid targets rejected before any native call
    with pytest.raises(ValueError, match="positive"):
        dec.Decode([path], [0], out_hw=(0, 48))


def test_yuv_odd_decode_sizes_edge_padded():
    """Odd decoded sizes (odd sources; DCT-scale-hint decodes) must not
    crash the 4:2:0 wire mid-epoch: the decoder edge-replicates one
    row/column to even before subsampling."""
    # odd-dimension source, no resize target
    jpeg = make_jpeg(hw=(33, 47), seed=9)
    dec = ImageDecoder("image", wire_format="yuv420")
    bp = JpegProvider([jpeg]).sample_data_structure
    bp = dec.check_input_data_format_and_set_output_data_format(bp)
    sdg = bp.get_empty_like_self()
    sdg["image"] = jpeg
    out = dec._process(sdg)
    assert out["image"].shape == (34, 48)
    assert out["image_cbcr"].shape == (17, 24, 2)
    # padded strip replicates the border row/column
    np.testing.assert_array_equal(out["image"][33], out["image"][32])
    np.testing.assert_array_equal(out["image"][:, 47], out["image"][:, 46])

    # scale-hint decode landing on an odd DCT scale (372x512 at ~1/4)
    jpeg2 = make_jpeg(hw=(372, 512), seed=10)
    dec2 = ImageDecoder(
        "image", wire_format="yuv420", decode_scale_hint_hw=(93, 128)
    )
    bp2 = JpegProvider([jpeg2]).sample_data_structure
    bp2 = dec2.check_input_data_format_and_set_output_data_format(bp2)
    sdg2 = bp2.get_empty_like_self()
    sdg2["image"] = jpeg2
    out2 = dec2._process(sdg2)
    h, w = out2["image"].shape
    assert h % 2 == 0 and w % 2 == 0
    assert out2["image_cbcr"].shape == (h // 2, w // 2, 2)


def test_reader_yuv_rejects_as_bgr(vclip):
    """yuv=True ships YCbCr planes — as_bgr would be silently dropped, so
    the combination is rejected (parity: ImageDecoder rejects as_bgr with
    wire_format='yuv420')."""
    from accvlab_tpu.video import CreateBatchAsyncStreamReader, CreateSampleReader

    path, _ = vclip
    r = CreateSampleReader(max_readers=2, num_workers=1)
    try:
        with pytest.raises(ValueError, match="as_bgr with yuv"):
            r.DecodeAsync([path], [0], as_bgr=True, yuv=True)
    finally:
        r.ReleaseResources()
    b = CreateBatchAsyncStreamReader(max_readers=2, num_workers=1)
    try:
        with pytest.raises(ValueError, match="as_bgr with yuv"):
            b.Decode([path], [[0]], as_bgr=True, yuv=True)
    finally:
        b.ReleaseResources()


# ---------------------- native libjpeg RGB fast path -------------------- #


@pytest.mark.skipif(not _native_available(), reason="libjpeg dev unavailable")
def test_native_rgb_decoder_matches_pil_path():
    from accvlab_tpu.pipeline import native_jpeg
    from PIL import Image

    jpeg = make_jpeg(hw=(96, 128), seed=21)
    # native-size decode vs PIL
    rgb = native_jpeg.decode_rgb(jpeg, (96, 128))
    ref = np.asarray(Image.open(io.BytesIO(jpeg.tobytes())).convert("RGB"))
    assert rgb.shape == ref.shape == (96, 128, 3)
    assert np.abs(rgb.astype(int) - ref.astype(int)).mean() < 2.0
    # fused resize (non-power-of-two target: PIL can't DCT-scale there)
    half = native_jpeg.decode_rgb(jpeg, (72, 96))
    pil_half = np.asarray(
        Image.open(io.BytesIO(jpeg.tobytes())).convert("RGB").resize(
            (96, 72), Image.BILINEAR
        )
    )
    assert np.abs(half.astype(int) - pil_half.astype(int)).mean() < 4.0
    # BGR = channel-swapped RGB, bitwise (same decode, swapped write order)
    bgr = native_jpeg.decode_rgb(jpeg, (96, 128), as_bgr=True)
    np.testing.assert_array_equal(bgr[..., ::-1], rgb)


@pytest.mark.skipif(not _native_available(), reason="libjpeg dev unavailable")
def test_native_rgb_through_image_decoder():
    from accvlab_tpu.pipeline import native_jpeg

    jpeg = make_jpeg(hw=(64, 96), seed=22)

    def run_decoder(**kw):
        dec = ImageDecoder("image", **kw)
        bp = JpegProvider([jpeg]).sample_data_structure
        bp = dec.check_input_data_format_and_set_output_data_format(bp)
        sdg = bp.get_empty_like_self()
        sdg["image"] = jpeg
        return np.asarray(dec._process(sdg)["image"])

    out = run_decoder()
    assert out.shape == (64, 96, 3)
    np.testing.assert_array_equal(out, native_jpeg.decode_rgb(jpeg, (64, 96)))
    # exact fused resize
    assert run_decoder(decode_resize_hw=(32, 48)).shape == (32, 48, 3)
    # scale hint: decode lands at the M/8 size covering the hint
    hinted = run_decoder(decode_scale_hint_hw=(20, 30))
    assert hinted.shape == native_jpeg.scaled_size((64, 96), (20, 30)) + (3,)
    # as_bgr composes
    np.testing.assert_array_equal(
        run_decoder(as_bgr=True)[..., ::-1], out
    )


@pytest.mark.skipif(not _native_available(), reason="libjpeg dev unavailable")
def test_native_rgb_fallbacks():
    from PIL import Image

    # grayscale JPEG: libjpeg expands to RGB natively
    g = np.random.default_rng(23).integers(0, 255, (32, 40), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(g).save(buf, format="JPEG", quality=92)
    gj = np.frombuffer(buf.getvalue(), np.uint8).copy()
    dec = ImageDecoder("image")
    bp = JpegProvider([gj]).sample_data_structure
    bp = dec.check_input_data_format_and_set_output_data_format(bp)
    sdg = bp.get_empty_like_self()
    sdg["image"] = gj
    out = np.asarray(dec._process(sdg)["image"])
    assert out.shape == (32, 40, 3)
    assert np.abs(out.astype(int) - g[..., None].astype(int)).mean() < 4.0

    # CMYK JPEG: native path declines, PIL fallback decodes
    img = np.random.default_rng(24).integers(0, 255, (16, 20, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).convert("CMYK").save(buf, format="JPEG", quality=90)
    cj = np.frombuffer(buf.getvalue(), np.uint8).copy()
    sdg = bp.get_empty_like_self()
    sdg["image"] = cj
    out = np.asarray(dec._process(sdg)["image"])
    assert out.shape == (16, 20, 3)

    # PNG bytes: native path declines on magic, PIL decodes
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png = np.frombuffer(buf.getvalue(), np.uint8).copy()
    sdg = bp.get_empty_like_self()
    sdg["image"] = png
    out = np.asarray(dec._process(sdg)["image"])
    assert out.shape == (16, 20, 3)


def test_out_hw_validation_contracts(vclip):
    """Review-pass regressions: out_hw is validated STRICTLY (no float
    truncation, no extra elements, bounded) and EAGERLY (a bad target
    raises at DecodeAsync/Decode, not later out of GetBuffer)."""
    from accvlab_tpu.video import CreateSampleReader
    from accvlab_tpu.video.decoder import _check_out_hw

    path, _frames = vclip
    for bad in [(224.6, 224.6), (32, 48, 3), (0, 4), (4, 1 << 21), (32,)]:
        with pytest.raises(ValueError, match="out_hw"):
            _check_out_hw(bad, require_even=False)
    r = CreateSampleReader(max_readers=2, num_workers=1)
    try:
        # odd dims on the YUV wire: rejected at the CALL, nothing in flight
        with pytest.raises(ValueError, match="out_hw"):
            r.DecodeAsync([path], [0], yuv=True, out_hw=(33, 48))
        with pytest.raises(ValueError, match="out_hw"):
            r.DecodeAsync([path], [0], out_hw=(16.5, 24))
        # the failed calls left no in-flight request behind
        r.DecodeAsync([path], [0], yuv=True, out_hw=(32, 48))
        out = r.GetBuffer([path], [0], yuv=True, out_hw=(32, 48))
        assert out[0].y.shape == (32, 48)
    finally:
        r.ReleaseResources()
