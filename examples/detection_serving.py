"""Detection serving: checkpoint -> jitted forward+decode -> ragged results.

The production inference path: restore trained CenterNet params with orbax,
compile ONE program that runs the forward pass AND the NMS-free decode
(`accvlab_tpu.models.decode_detections`), and serve batches with static
shapes end to end — the variable number of detections per image is a
RaggedBatch, so downstream code gets exact per-image results without dynamic
shapes ever entering the compiled program.

Run: ``python examples/detection_serving.py``
"""

from __future__ import annotations

import tempfile
import time

import jax
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from accvlab_tpu.models import CenterNetDetector, decode_detections
from accvlab_tpu.models.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def main(batch_size: int = 8, hw=(256, 320), num_classes: int = 10):
    model = CenterNetDetector(num_classes=num_classes, width=64)
    images = np.random.default_rng(0).uniform(0, 1, (batch_size, *hw, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), images[:1])

    # --- train-side: persist a checkpoint (stand-in for a training run) --- #
    ckpt_dir = tempfile.mkdtemp()
    save_checkpoint(ckpt_dir, step=1000, params=params, opt_state=None,
                    pipeline_state={"model_classes": num_classes})

    # --- serving side: restore + compile the full inference program ------ #
    path = latest_checkpoint(ckpt_dir)
    restored_params, _, meta = restore_checkpoint(
        path, {"params": params, "opt_state": None}
    )
    print(f"restored step-{meta['step']} checkpoint (pipeline meta: {meta['pipeline']})")

    @jax.jit
    def serve(params, images):
        outputs = model.apply(params, images)
        return decode_detections(outputs, max_detections=100, score_threshold=0.3)

    # warmup / compile
    out = serve(restored_params, images)
    jax.block_until_ready(out["scores"].tensor)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = serve(restored_params, images)
    jax.block_until_ready(out["scores"].tensor)
    ms = (time.perf_counter() - t0) / iters * 1e3
    sizes = np.asarray(out["boxes"].sample_sizes)
    print(
        f"serve({batch_size}x{hw[0]}x{hw[1]}): {ms:.2f} ms/batch "
        f"({batch_size / ms * 1e3:.0f} img/s), detections per image: {sizes.tolist()} "
        f"(untrained params -> every peak clears the threshold; counts drop "
        f"as training sharpens the heatmap)"
    )

    # --- deployment artifact: weights + program in ONE file --------------- #
    # The serving fleet loads this with accvlab_tpu.models.serving only —
    # no flax, no model class, no checkpoint directory (and the artifact is
    # batch-polymorphic: any batch size without re-export).
    from accvlab_tpu.models.serving import (
        load_inference,
        read_artifact_info,
        save_inference,
    )

    art_path = os.path.join(ckpt_dir, "detector.accvserve")
    info = save_inference(
        art_path,
        lambda p, imgs: model.apply(p, imgs),
        restored_params,
        images,
        batch_polymorphic=True,
        # lowered for BOTH targets: the TPU fleet and CPU staging/canaries
        # serve the same file (export needs no TPU attached)
        platforms=("tpu", "cpu"),
    )
    served = load_inference(art_path)
    art_out = served(images[:3])  # an unseen batch size, no re-export
    ref_out = model.apply(restored_params, images[:3])
    drift = float(
        np.abs(np.asarray(art_out["heatmap"]) - np.asarray(ref_out["heatmap"])).max()
    )
    print(
        f"exported {os.path.getsize(art_path) / 1e6:.2f} MB artifact "
        f"(format v{info['format_version']}, platforms {info['platforms']}, "
        f"batch-polymorphic); reload drift vs live apply: {drift:.2e} "
        f"(bf16 backbone -> few-ulp rounding differences are expected)"
    )

    # --- serving runtime: micro-batched request serving -------------------- #
    # Production traffic arrives one request at a time; the InferenceServer
    # gathers concurrent requests into static-bucket batches (each bucket is
    # one XLA compile of the batch-polymorphic artifact), pads, runs, and
    # fans results back out to per-request futures.
    import threading

    from accvlab_tpu.models import InferenceServer

    server = InferenceServer.from_artifact(
        art_path, batch_sizes=(1, 2, 4, 8), max_delay_ms=3.0
    )
    server.warmup(images[0])  # compile all four buckets before traffic

    n_clients, per_client = 4, 6
    results = {}

    def client(cid):
        for i in range(per_client):
            results[(cid, i)] = server.infer(images[(cid + i) % batch_size])

    threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    st = server.stats()
    server.close()
    assert len(results) == n_clients * per_client
    print(
        f"served {st['requests']} concurrent requests in {wall * 1e3:.0f} ms "
        f"as {st['batches']} batches (bucket histogram {st['batch_size_counts']}, "
        f"{st['padded_samples']} padded); exec p50 {st['exec'].get('p50_ms', 0):.1f} ms, "
        f"queue-wait p95 {st['queue_wait'].get('p95_ms', 0):.1f} ms"
    )
    return ms


if __name__ == "__main__":
    main()
