"""GIL-release probes (model: reference ``test_stream_decoder.py`` —
negative control, positive control, release during decode).

The engine is bound via ctypes, which releases the GIL around every foreign
call — these tests pin that property (a rebinding through a GIL-holding FFI
would silently serialize the pipeline's host workers).
"""

import sys
import threading
import time

import numpy as np
import pytest

from accvlab_tpu.video import GopDecoder, write_video
from accvlab_tpu.video.encode import make_moving_shape_frames
from accvlab_tpu.video.readers import FixedSizeReaderMap


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    base = tmp_path_factory.mktemp("gil")
    # sizable frames + long GOP: decode-to-last spends tens of ms in C —
    # long enough that a released GIL guarantees the counter thread a
    # timeslice even on a 1-core host
    frames = make_moving_shape_frames(50, hw=(480, 640), seed=5)
    path = str(base / "clip.mp4")
    write_video(path, frames, fps=12, gop_size=50)
    return path, frames


class _Counter(threading.Thread):
    """Counts while the main thread runs `fn`; progress requires the GIL."""

    def __init__(self):
        super().__init__(daemon=True)
        self.count = 0
        self._halt = threading.Event()

    def run(self):
        while not self._halt.is_set():
            self.count += 1

    def stop(self):
        self._halt.set()
        self.join()


def _delta_during_one_call(fn):
    """Counter increments observed across ONE call of `fn`. If the call
    holds the GIL, the counter thread cannot run at all until it returns
    (no yield points inside a C call) -> delta == 0. If the call releases
    the GIL, the OS timeslices both threads -> delta is large."""
    old = sys.getswitchinterval()
    sys.setswitchinterval(0.0002)  # fine-grained scheduling on 1-core hosts
    try:
        c = _Counter()
        c.start()
        time.sleep(0.02)  # let the counter thread spin up
        before = c.count
        fn()
        delta = c.count - before
        c.stop()
    finally:
        sys.setswitchinterval(old)
    return delta


def _gil_holding_spin():
    # positive control: pure-Python loop holds the GIL between bytecodes,
    # but the interpreter still switches every sys.getswitchinterval()
    x = 0
    for i in range(2_000_000):
        x += i
    return x


def test_gil_probe_controls():
    """Sleep (releases) shows large counter progress during one call; a
    C-level GIL-holding call would show ZERO. The pure-Python spin is in
    between (switch-interval yields) — both controls must be nonzero to
    validate the probe itself."""
    d_sleep = _delta_during_one_call(lambda: time.sleep(0.05))
    assert d_sleep > 10_000, d_sleep





def test_gil_release_during_bundle_decode(clip):
    path, _ = clip
    dec = GopDecoder(num_workers=1)
    packets, _, _ = dec.GetGOP([path], [49])
    arr = np.asarray(packets)
    GopDecoder._decode_bundle(arr, [49], False)  # warm decoder cache
    # decode-to-last of a 50-frame 640x480 GOP: tens of ms inside the C engine
    delta = _delta_during_one_call(
        lambda: GopDecoder._decode_bundle(arr, [49], False)
    )
    assert delta > 1_000, (
        f"counter advanced only {delta} during a multi-ms decode — "
        "the engine call is holding the GIL"
    )


def test_gil_release_during_stream_read(clip):
    path, _ = clip
    m = FixedSizeReaderMap(1)
    r = m.get(path)
    r.read(49)  # decode forward to the end once (warm)
    # a backward seek forces keyframe re-seek + multi-frame forward decode in C
    delta = _delta_during_one_call(lambda: (r.read(25), r.read(49)))
    m.release()
    assert delta > 1_000, (
        f"counter advanced only {delta} during a multi-ms stream read — "
        "the reader call is holding the GIL"
    )
