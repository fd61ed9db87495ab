"""The full end-to-end slice: pipeline -> sharded batches -> pjit training.

This is SURVEY §7's "minimum end-to-end slice" assembled from every layer:
ShuffledShardedInputCallable -> SampleDataGroup blueprint -> host JPEG decode
-> jit-fused augment + CenterNet heatmap targets -> ragged GT batching ->
packed transfer -> mesh-sharded batch -> CenterNet train step under pjit.

Run (single chip or CPU mesh):
    python examples/train_centernet_e2e.py
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/train_centernet_e2e.py     # 8-device data-parallel
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from accvlab_tpu.models.centernet import CenterNetDetector, make_train_step
from accvlab_tpu.parallel import make_mesh, shard_batch
from accvlab_tpu.ragged import RaggedBatch
from object_detection_2d_pipeline import HEATMAP_HW, NUM_CLASSES, OUT_HW, build_pipeline


def batch_to_train_inputs(batch, max_targets=16):
    """Adapt the pipeline's flat outputs to the model's batch contract."""
    cam = 0  # train on camera 0 for the demo
    images = batch[f"cameras.[{cam}].image"]
    heatmap = jnp.transpose(
        batch[f"cameras.[{cam}].annotations.heatmap"], (0, 2, 3, 1)
    )  # (B, C, H, W) -> (B, H, W, C)
    centers = batch[f"cameras.[{cam}].annotations.center"]
    offsets = batch[f"cameras.[{cam}].annotations.offset"]
    active = batch[f"cameras.[{cam}].annotations.active"]
    hw = batch[f"cameras.[{cam}].annotations.hw"]
    categories = batch[f"cameras.[{cam}].annotations.categories"]
    act = active.astype(bool)
    sizes = jnp.sum(act, axis=1).astype(jnp.int32)
    # active objects are not necessarily front-compacted after filtering
    # steps; a RaggedBatch prefix mask needs them to be, so compact (stable
    # sort: active first, original order preserved)
    order = jnp.argsort(~act, axis=1, stable=True)
    compact = lambda a: jnp.take_along_axis(
        a, order[..., None] if a.ndim == 3 else order, axis=1
    )
    mk = lambda x: RaggedBatch(compact(x), sample_sizes=sizes)
    return {
        "images": images,
        "targets": {
            "heatmap": heatmap,
            "centers": mk(centers.astype(jnp.int32)),
            "offsets": mk(offsets),
            # the pipeline annotation is (h, w); the model/decode convention
            # is CenterNet's (w, h) — flip so decoded boxes carry the true
            # image-space extents
            "sizes": mk(hw[..., ::-1]),
            "classes": mk(categories.astype(jnp.int32)),
        },
    }


def main():
    devices = jax.devices()
    print(f"devices: {devices}")
    mesh = make_mesh()
    batch_size = max(4, mesh.devices.shape[0])

    loader, pipe = build_pipeline(batch_size=batch_size)
    model = CenterNetDetector(num_classes=NUM_CLASSES, width=32)
    init_fn, train_step = make_train_step(model)

    first = pipe.run()
    train_batch = batch_to_train_inputs(first)
    params, opt_state = init_fn(jax.random.PRNGKey(0), train_batch["images"])
    step = jax.jit(train_step)

    t0 = time.perf_counter()
    for i in range(4):
        with mesh:
            sharded = shard_batch(train_batch, mesh)
            params, opt_state, metrics = step(params, opt_state, sharded)
        loss = float(metrics["loss"])
        print(f"step {i}: loss {loss:.4f}")
        try:
            nxt = pipe.run()
        except StopIteration:
            pipe.reset()
            nxt = pipe.run()
        train_batch = batch_to_train_inputs(nxt)
    jax.block_until_ready(params)
    print(f"4 steps in {time.perf_counter() - t0:.2f}s over {len(devices)} device(s)")

    # --- evaluation: decode + streaming mAP (models/eval.py) -------------- #
    # GT boxes are reconstructed with the SAME arithmetic the decode applies
    # to predictions (center+offset, hw, stride), so the metric isolates
    # model quality; 4 demo steps -> expect ~0.
    from accvlab_tpu.models import DetectionEvaluator, decode_detections

    stride = OUT_HW[0] // HEATMAP_HW[0]
    outputs = model.apply(params, train_batch["images"])
    dets = decode_detections(
        outputs, max_detections=32, score_threshold=0.05, stride=stride
    )
    tg = train_batch["targets"]
    ctr = tg["centers"].tensor.astype(jnp.float32) + tg["offsets"].tensor
    w = tg["sizes"].tensor[..., 0] * stride
    h = tg["sizes"].tensor[..., 1] * stride
    cx, cy = ctr[..., 0] * stride, ctr[..., 1] * stride
    gt_boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    ev = DetectionEvaluator(iou_thresholds=(0.5,))
    ev.update(
        dets,
        {
            "boxes": RaggedBatch(gt_boxes, sample_sizes=tg["classes"].sample_sizes),
            "classes": tg["classes"],
        },
    )
    res = ev.compute()
    print(f"mAP@0.5 after 4 demo steps: {res['mAP@0.5']:.4f} "
          f"(per-class AP over {len(res['per_class'][0.5])} present classes)")
    pipe.stop()


if __name__ == "__main__":
    main()
