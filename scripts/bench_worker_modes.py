"""Host-stage worker scaling: worker_mode="thread" vs "process".

VERDICT r1 item 10: quantify what ``worker_mode="process"`` costs and buys.
The reference's equivalent mechanism is DALI's parallel external source
(spawned Python workers, ``dali_pipeline_framework/docs/*``); ours is
``ProcessSampleWorkers``. This script measures steady-state host-stage
throughput for thread/process workers at several worker counts on a
host-stage-heavy pipeline (JPEG decode + normalize), prints a table and a
per-sample dispatch-overhead estimate, so the multi-core scaling model in
``docs/performance.md`` is anchored to measured numbers (not a promise).

Run standalone (CPU only, no TPU needed):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u scripts/bench_worker_modes.py
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accvlab_tpu.pipeline import DType, PipelineDefinition, SampleDataGroup
from accvlab_tpu.pipeline.inputs import DataProvider, ShuffledShardedInputCallable
from accvlab_tpu.pipeline.processing_steps import ImageDecoder, ImageRange01Normalizer

HW = (240, 320)
NUM_SAMPLES = 256
BATCH = 16
MEASURE_BATCHES = 10


def encode_jpeg(arr: np.ndarray) -> np.ndarray:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return np.frombuffer(buf.getvalue(), np.uint8).copy()


class JpegProvider(DataProvider):
    def __init__(self, seed=0):
        rng = np.random.default_rng(seed)
        self._jpegs = [
            encode_jpeg(rng.integers(0, 255, (*HW, 3), np.uint8))
            for _ in range(NUM_SAMPLES)
        ]

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
        return NUM_SAMPLES


def build(worker_mode: str, workers: int):
    provider = JpegProvider()
    inp = ShuffledShardedInputCallable(provider, batch_size=BATCH, shard_id=0, num_shards=1)
    pdef = PipelineDefinition(
        inp,
        [ImageDecoder("image"), ImageRange01Normalizer("image")],
        prefetch_queue_depth=2,
    )
    return pdef.get_pipeline(
        batch_size=BATCH, num_threads=workers, seed=0, worker_mode=worker_mode
    )


def measure(worker_mode: str, workers: int) -> dict:
    pipe = build(worker_mode, workers)
    pipe.run()
    it = iter(pipe)
    # warmup: first batches include worker spawn + jit compile
    for _ in range(3):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(MEASURE_BATCHES):
        try:
            next(it)
            n += 1
        except StopIteration:
            pipe.reset()
    dt = time.perf_counter() - t0
    pipe.stop()
    fps = n * BATCH / dt
    return {
        "mode": worker_mode,
        "workers": workers,
        "batches": n,
        "sec": round(dt, 3),
        "frames_per_sec": round(fps, 1),
        "ms_per_sample": round(1e3 * dt / max(1, n * BATCH), 3),
    }


def main():
    ncpu = os.cpu_count()
    rows = []
    for mode, workers in [
        ("thread", 1),
        ("thread", 2),
        ("thread", 4),
        ("process", 1),
        ("process", 2),
        ("process", 4),
    ]:
        r = measure(mode, workers)
        rows.append(r)
        print(json.dumps(r), flush=True)
    base = rows[0]["frames_per_sec"]
    print(
        json.dumps(
            {
                "host_cpus": ncpu,
                "baseline_thread1_fps": base,
                "relative": {
                    f"{r['mode']}{r['workers']}": round(r["frames_per_sec"] / base, 3)
                    for r in rows
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
