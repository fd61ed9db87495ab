"""Video-based training input example: random-access stream decode feeding a
TPU training step, with async double buffering and the demuxer-free workflow.

Parity: reference ``on_demand_video_decoder/examples/dataloader_stream_decode/
main.py`` (lazy per-worker decoder init, clip-batched sampler, Decode/GetBuffer
double buffering) and ``examples/demuxer_free_decode/gop_storage.py``
(pre-stored GOP bundles + SharedGopStore).

Run:  python examples/video_stream_training.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from accvlab_tpu.pipeline.inputs import SequenceSampler
from accvlab_tpu.video import (
    CreateBatchAsyncStreamReader,
    CreateGopDecoder,
    SharedGopStore,
    write_video,
)
from accvlab_tpu.video.encode import make_moving_shape_frames


def make_clips(directory, num_clips=4, frames_per_clip=60):
    paths = []
    for i in range(num_clips):
        frames = make_moving_shape_frames(frames_per_clip, hw=(96, 128), seed=i)
        p = os.path.join(directory, f"clip_{i}.mp4")
        write_video(p, frames, fps=12, gop_size=30)
        paths.append(p)
    return paths


def main():
    import jax
    import jax.numpy as jnp

    with tempfile.TemporaryDirectory() as tmp:
        clips = make_clips(tmp)
        batch_videos = 2  # videos per batch slot
        frames_per_sample = 3  # temporal window

        # sequence sampler: each batch slot walks one clip forward in time ->
        # the stream readers decode forward without re-seeking
        sampler = SequenceSampler(
            total_batch_size=batch_videos,
            sequence_lengths=[60] * len(clips),
            seed=0,
        )

        reader = CreateBatchAsyncStreamReader(max_readers=4)

        def indices_to_request():
            flat = sampler.get_next_batch_indices()
            paths, ids = [], []
            for idx in flat:
                clip = idx // 60
                frame = idx % 60
                paths.append(clips[clip])
                ids.append([max(0, frame - d) for d in range(frames_per_sample)][::-1])
            return paths, ids

        train_step = jax.jit(lambda x: (x.astype(jnp.float32) / 255.0).mean())

        # double buffering: decode batch N+1 while the TPU consumes batch N
        paths, ids = indices_to_request()
        reader.Decode(paths, ids)
        t0 = time.perf_counter()
        for step in range(6):
            frames = reader.GetBuffer(paths, ids)
            next_req = indices_to_request()
            reader.Decode(*next_req)  # overlap with device work
            batch = np.stack([np.stack(f) for f in frames])  # (V, F, H, W, 3)
            loss = train_step(jnp.asarray(batch))
            jax.block_until_ready(loss)
            paths, ids = next_req
            print(f"step {step}: batch {batch.shape}, loss {float(loss):.4f}")
        reader.GetBuffer(paths, ids)  # drain
        print(f"6 steps in {time.perf_counter() - t0:.2f}s")
        reader.ReleaseResources()

        # ---- demuxer-free workflow: pre-store GOP bundles + shared cache ---
        dec = CreateGopDecoder()
        merged, firsts, lens = dec.GetGOP([clips[0]], [35])
        store = SharedGopStore.create(capacity=8, store_id=7)
        try:
            ref = store.put(clips[0], firsts[0], lens[0], merged)
            hit = store.lookup(clips[0], 40)  # same GOP -> served from shm
            frames = dec.DecodeFromGOPRGB(store.read(hit), [], [40])
            print(f"demuxer-free decode from SharedGopStore: frame {frames[0].shape}")
        finally:
            store.cleanup()


if __name__ == "__main__":
    main()
