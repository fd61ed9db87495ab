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


class GopRef(NamedTuple):
    """Tiny picklable reference to a GOP stored in a :class:`SharedGopStore`
    segment — passed through worker IPC instead of the packet payload
    (parity: reference ``types.py:23-41``)."""

    shm_name: str
    filepath: str
    first_frame_id: int
    gop_len: int
    size: int
