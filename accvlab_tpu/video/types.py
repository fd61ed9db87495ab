"""Types for the video package (parity: reference
``on_demand_video_decoder/accvlab/.../_internal/types.py``)."""

from __future__ import annotations

from enum import IntEnum
from typing import NamedTuple


class Codec(IntEnum):
    """Codec ids (values match cudaVideoCodec for drop-in compatibility;
    parity: reference ``types.py:44-54``)."""

    h264 = 4
    hevc = 8
    av1 = 11

    @classmethod
    def from_avcodec_id(cls, avcodec_id: int) -> "Codec":
        """Map a libavcodec ``AVCodecID`` (as reported by the engine's stream
        probe / bundle headers) to the reference-compatible :class:`Codec`
        value. The reference receives cudaVideoCodec from NVDEC; on TPU hosts
        the demuxer reports AVCodecID, so this is the bridge."""
        mapping = {27: cls.h264, 173: cls.hevc, 226: cls.av1}
        try:
            return mapping[int(avcodec_id)]
        except KeyError:
            raise ValueError(f"unsupported AVCodecID {avcodec_id}") from None


class GopRef(NamedTuple):
    """Tiny picklable reference to a GOP stored in a :class:`SharedGopStore`
    segment — passed through worker IPC instead of the packet payload
    (parity: reference ``types.py:23-41``)."""

    shm_name: str
    filepath: str
    first_frame_id: int
    gop_len: int
    size: int


class FastStreamInfo(NamedTuple):
    """One-time stream probe result, reusable across decoder inits so workers
    skip the per-call avformat probe (parity: ``FFmpegDemuxer.h:70-87``;
    produced by :func:`accvlab_tpu.video.GetFastInitInfo`)."""

    codec_type: int
    codec_id: int
    width: int
    height: int
    format: int
    time_base_num: int
    time_base_den: int
    avg_frame_rate_num: int
    avg_frame_rate_den: int
    r_frame_rate_num: int
    r_frame_rate_den: int
    start_time: int
    duration: int


class RGBFrame:
    """Decoded RGB frame view (parity: ``PyRGBFrame.hpp:31-60``).

    The reference's RGBFrame is a CUDA-array-interface view over NVDEC output
    in device memory. On TPU the decode engine produces host RGB24, so this
    is a zero-copy view over a numpy array with the same attribute surface
    (``shape``/``stride``/``typestr``/``isBGR``/``is_of_size``) plus
    ``__array__`` so it drops into numpy/JAX code directly. The stream
    readers return plain numpy arrays for convenience; wrap in RGBFrame where
    reference-typed code expects the view object.
    """

    __slots__ = ("data", "isBGR")

    def __init__(self, data, isBGR: bool = False):
        self.data = data
        self.isBGR = bool(isBGR)

    @property
    def shape(self):
        return tuple(self.data.shape)

    @property
    def stride(self):
        return tuple(self.data.strides)

    @property
    def typestr(self) -> str:
        return self.data.dtype.str

    @property
    def dtype(self):
        return self.data.dtype

    def is_of_size(self, height: int, width: int) -> bool:
        return self.data.shape[0] == height and self.data.shape[1] == width

    def __array__(self, dtype=None, copy=None):
        import numpy as np

        arr = np.asarray(self.data)
        return arr.astype(dtype) if dtype is not None else arr

    def __repr__(self):
        return f"RGBFrame(shape={self.shape}, isBGR={self.isBGR})"


class DecodedFrameExt:
    """Decoded-surface metadata carrier (parity: ``PyDecodedFrameExt.hpp:26``).

    On TPU every frame is converted to RGB24 on the host, so the NVDEC
    surface-format details are fixed; the fields exist so reference-typed
    code keeps working. Color range/chroma enums use the reference's values.
    """

    class VideoSurfaceFormat(IntEnum):
        UNSPECIFIED = 0
        NV12 = 1
        P016 = 2
        YUV444 = 3
        YUV444_16Bit = 4

    class VideoChromaFormat(IntEnum):
        UNSPECIFIED = 0
        MONOCHROME = 1
        YUV420 = 2
        YUV422 = 3
        YUV444 = 4

    class ColorRange(IntEnum):
        UNSPECIFIED = 0
        LIMITED = 1
        FULL = 2

    def __init__(self, color_range: int = 0, chroma_format: int = 0, surface_format: int = 0):
        self.color_range = self.ColorRange(color_range)
        self.chroma_format = self.VideoChromaFormat(chroma_format)
        self.surface_format = self.VideoSurfaceFormat(surface_format)
