"""Video-frame training input vs JPEG-still training input (throughput).

Reproduces the reference's headline comparison
(``packages/on_demand_video_decoder/docs/evaluation.rst:73-107``): training
directly from video must not be slower than training from extracted stills.
Two pipelines produce the SAME frames — one decodes per-frame JPEGs
(``ImageDecoder``), one reads a video stream with decoder-state continuity
(``FixedSizeReaderMap`` over the FFmpeg engine) — and run the same device
stage. Steady-state frames/sec are printed for both.

Run: ``python examples/video_vs_image_benchmark.py``
"""

from __future__ import annotations

import io
import os
import tempfile
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from accvlab_tpu.pipeline import DType, PipelineDefinition, SampleDataGroup
from accvlab_tpu.pipeline.inputs import DataProvider, ShuffledShardedInputCallable
from accvlab_tpu.pipeline.processing_steps import ImageDecoder, ImageRange01Normalizer
from accvlab_tpu.video import write_video
from accvlab_tpu.video.encode import make_moving_shape_frames
from accvlab_tpu.video.readers import FixedSizeReaderMap

HW = (240, 320)
NUM_FRAMES = 192
GOP = 16


def encode_jpeg(arr: np.ndarray) -> np.ndarray:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return np.frombuffer(buf.getvalue(), np.uint8).copy()


class JpegProvider(DataProvider):
    def __init__(self, frames):
        self._jpegs = [encode_jpeg(f) for f in frames]

    @property
    def sample_data_structure(self):
        sdg = SampleDataGroup()
        sdg.add_data_field("image", DType.UINT8)
        return sdg

    def get_data(self, i):
        sdg = self.sample_data_structure
        sdg["image"] = self._jpegs[i]
        return sdg

    def get_number_of_samples(self):
        return len(self._jpegs)


class VideoFrameProvider(DataProvider):
    """Serves decoded frames from the video via persistent stream readers
    (sequential access uses forward decode, not per-frame keyframe seeks)."""

    def __init__(self, path, num_frames):
        self._path = path
        self._n = num_frames
        self._readers = None  # lazy per-process (reference: lazy worker init)

    @property
    def sample_data_structure(self):
        sdg = SampleDataGroup()
        sdg.add_data_field("image", DType.UINT8)
        return sdg

    def get_data(self, i):
        if self._readers is None:
            self._readers = FixedSizeReaderMap(4)
        frame = self._readers.get(self._path).read(i)
        sdg = self.sample_data_structure
        sdg["image"] = frame
        return sdg

    def get_number_of_samples(self):
        return self._n


def run_pipeline(provider, steps, batch_size=16, batches=8, label=""):
    inp = ShuffledShardedInputCallable(provider, batch_size=batch_size, shuffle=False)
    pipe = PipelineDefinition(inp, steps).get_pipeline(
        batch_size=batch_size, num_threads=max(2, os.cpu_count() or 2), seed=0
    )
    next(pipe)  # warmup (compiles the device stage)
    t0 = time.time()
    done = 1
    for _ in range(batches):
        try:
            next(pipe)
            done += 1
        except StopIteration:
            break
    dt = time.time() - t0
    fps = (done - 1) * batch_size / dt if dt > 0 else float("inf")
    pipe.stop()
    print(f"{label}: {fps:.1f} frames/s ({done} batches)")
    return fps


def main():
    frames = make_moving_shape_frames(NUM_FRAMES, hw=HW)
    d = tempfile.mkdtemp()
    clip = os.path.join(d, "clip.mp4")
    write_video(clip, frames, fps=12, gop_size=GOP)

    fps_img = run_pipeline(
        JpegProvider(frames),
        [ImageDecoder("image"), ImageRange01Normalizer("image")],
        label="image (JPEG decode)",
    )
    fps_vid = run_pipeline(
        VideoFrameProvider(clip, NUM_FRAMES),
        [ImageRange01Normalizer("image")],  # frames arrive decoded
        label="video (stream read) ",
    )
    print(f"video/image throughput ratio: x{fps_vid / fps_img:.2f} "
          f"(reference bar: >= ~0.97x, up to 1.28x)")
    return fps_img, fps_vid


if __name__ == "__main__":
    main()
