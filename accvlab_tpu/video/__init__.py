"""accvlab_tpu.video — random-access GOP video decoding for TPU hosts.

TPU-native equivalent of ACCV-Lab's ``accvlab.on_demand_video_decoder``
(NVDEC replaced by libavcodec software decode on the host — TPU hosts have no
hardware decoder; SURVEY §7.5 / BASELINE.json north star). Same API surface:

* :func:`CreateGopDecoder` / :class:`CachedGopDecoder` / :class:`GopDecoder`
  — random-access GOP demux + decode with LRU packet caching and serialized
  packet bundles (demuxer-free workflow via ``SavePacketsToFile`` /
  ``LoadGOPFromFiles``).
* :func:`CreateSampleReader` / :class:`SampleReader`,
  :func:`CreateBatchAsyncStreamReader` / :class:`BatchAsyncStreamReader` —
  sequential stream readers with decoder-state continuity and async
  single-in-flight contracts.
* :class:`SharedGopStore` / :class:`GopRef` — cross-process GOP cache in
  POSIX shared memory.
* :class:`Codec`, :func:`drop_videos_cache`.
* :func:`write_video` — test-asset encoder (the reference commits
  pre-generated clips; we generate them on demand).
"""

from .decoder import CachedGopDecoder, CreateGopDecoder, GopDecoder, YuvFrame
from .encode import write_video
from .gop_storage import GOPStorageManager
from .gop_store import SharedGopStore
from .readers import (
    BatchAsyncStreamReader,
    CreateBatchAsyncStreamReader,
    CreateSampleReader,
    FixedSizeReaderMap,
    SampleReader,
)
from .types import Codec, DecodedFrameExt, FastStreamInfo, GopRef, RGBFrame
from .utils import (
    DropCacheStatus,
    GetFastInitInfo,
    SavePacketsToFile,
    drop_videos_cache,
)

__all__ = [
    "DecodedFrameExt",
    "FastStreamInfo",
    "GetFastInitInfo",
    "RGBFrame",
    "SavePacketsToFile",
    "BatchAsyncStreamReader",
    "CachedGopDecoder",
    "Codec",
    "CreateBatchAsyncStreamReader",
    "CreateGopDecoder",
    "CreateSampleReader",
    "DropCacheStatus",
    "FixedSizeReaderMap",
    "GOPStorageManager",
    "GopDecoder",
    "GopRef",
    "SampleReader",
    "SharedGopStore",
    "YuvFrame",
    "drop_videos_cache",
    "write_video",
]
