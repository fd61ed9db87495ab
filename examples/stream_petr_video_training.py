"""StreamPETR-style video training: multi-camera video streams -> temporal
frame windows -> PETR 3-D detector training with a batched ragged set loss.

This is the TPU-native analog of the reference's flagship use case
(``packages/dali_pipeline_framework/docs/examples/stream_petr`` +
``on_demand_video_decoder/examples/dataloader_stream_decode``): every
component that exists for StreamPETR's sake composes here —

* `SequenceSampler` walks each batch slot forward through one drive-log so
  the stream decoders never seek backward,
* `BatchAsyncStreamReader` double-buffers multi-camera decode (Decode for
  batch N+1 overlaps training step N),
* frames feed a jitted STREAMING PETR train step — temporal query
  propagation carries the top-k tracked queries from frame t-1 into frame t
  (fixed-size memory, one compile) — with the set loss fully batched over
  RaggedBatch ground truth (the x59.6 full-iteration speedup).

Run: ``python examples/stream_petr_video_training.py``
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from accvlab_tpu.models.petr import (
    PETRDetector,
    make_petr_example_batch,
    make_motion_petr_train_step,
)
from accvlab_tpu.pipeline.inputs import SequenceSampler
from accvlab_tpu.ragged import RaggedBatch
from accvlab_tpu.video import CreateBatchAsyncStreamReader, write_video
from accvlab_tpu.video.encode import make_moving_shape_frames

NUM_CAMS = 2
FRAMES_PER_CLIP = 48
HW = (64, 96)


def make_camera_clips(directory, num_drives=3):
    """num_drives drive-logs x NUM_CAMS camera clips each."""
    drives = []
    for d in range(num_drives):
        cams = []
        for c in range(NUM_CAMS):
            frames = make_moving_shape_frames(
                FRAMES_PER_CLIP, hw=HW, seed=d * 10 + c
            )
            p = os.path.join(directory, f"drive{d}_cam{c}.mp4")
            write_video(p, frames, fps=12, gop_size=12)
            cams.append(p)
        drives.append(cams)
    return drives


def synth_labels(rng, batch_size, num_classes):
    """Stand-in 3-D ground truth per temporal window (a real dataset would
    load these from the drive-log annotations)."""
    max_gt = 8
    sizes = rng.integers(1, max_gt + 1, (batch_size,)).astype(np.int32)
    mk = lambda x: RaggedBatch(jnp.asarray(x), sample_sizes=jnp.asarray(sizes))
    matches = np.stack([rng.permutation(max_gt) for _ in range(batch_size)]).astype(np.int32)
    return {
        "gt_boxes": mk(rng.normal(size=(batch_size, max_gt, 7)).astype(np.float32)),
        "gt_classes": mk(
            rng.integers(0, num_classes, (batch_size, max_gt)).astype(np.float32)
        ),
        "matches_gt": mk(matches),
        # indices range over ALL query slots (16 fresh + 8 memory)
        "matches_pred": mk(rng.integers(0, 24, (batch_size, max_gt)).astype(np.int32)),
    }


def main(num_steps: int = 6, batch_drives: int = 2):
    rng = np.random.default_rng(0)
    num_classes = 6
    # num_memory > 0 + motion_aware: temporal query propagation with
    # ego-compensated 3-D anchors (StreamPETR's defining feature) —
    # tracked queries from frame t-1 seed detection in frame t, their
    # reference points re-expressed in the new ego frame so a stationary
    # object's anchor does not drift by the ego's own motion
    model = PETRDetector(
        num_classes=num_classes, dim=32, num_queries=16, num_layers=2,
        num_memory=8, motion_aware=True,
    )
    init_fn, train_step = make_motion_petr_train_step(model)
    train_step = jax.jit(train_step)

    def ego_forward(b, dx=0.5):
        """Per-frame ego motion: constant forward translation (a real
        dataset supplies the odometry chain between consecutive frames)."""
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = dx
        return jnp.asarray(np.broadcast_to(m, (b, 4, 4)))

    with tempfile.TemporaryDirectory() as tmp:
        drives = make_camera_clips(tmp)
        sampler = SequenceSampler(
            total_batch_size=batch_drives,
            sequence_lengths=[FRAMES_PER_CLIP] * len(drives),
            seed=0,
        )
        reader = CreateBatchAsyncStreamReader(max_readers=NUM_CAMS * len(drives))

        def request_for(indices):
            """Sampler indices -> (paths, frame_ids) for all cameras."""
            paths, fids = [], []
            for idx in indices:
                drive, frame = idx // FRAMES_PER_CLIP, idx % FRAMES_PER_CLIP
                for cam_path in drives[drive]:
                    paths.append(cam_path)
                    fids.append([frame])
            return paths, fids

        # YUV 4:2:0 wire: the reader returns YuvFrame planes (1.5 B/px over
        # the host->device boundary — the reference's NVDEC->ColorSpace.cu
        # split); the color conversion + [0,1] normalize run as ONE jitted
        # device program per batch
        from accvlab_tpu.color import ycbcr420_to_rgb

        # lossless wire compression on top of the YUV wire (the functional
        # codec API): compress each batch's stacked planes as ONE plane —
        # (B*H, W) — so a single call gives uniform shapes (the image-
        # boundary rows just cost a handful of PFOR exceptions), and run
        # DECOMPRESSION + color convert + normalize as one jitted device
        # program. Output is bit-identical to shipping raw planes; the
        # host->device transfer shrinks ~1.4-2x on top of YUV's 2x.
        from accvlab_tpu.pipeline.processing_steps import (
            compress_plane,
            decompress_plane,
        )

        prep_cache = {}

        def _conv(key):
            # per-colorspace jitted program (retraces per codec shape
            # family — stable for homogeneous clip sets)
            if key not in prep_cache:
                mtx, crange = key

                @jax.jit
                def f(y_fields, cbcr_fields):
                    y = decompress_plane(y_fields).reshape(-1, *HW)
                    cbcr = decompress_plane(cbcr_fields).reshape(
                        y.shape[0], HW[0] // 2, HW[1] // 2, 2
                    )
                    return ycbcr420_to_rgb(y, cbcr, mtx, crange).astype(
                        jnp.float32
                    ) * (1.0 / 255.0)

                prep_cache[key] = f
            return prep_cache[key]

        def _pack(plane_stack):  # (B, H, W[, C]) uint8 -> wire field dict
            flat = plane_stack.reshape((-1,) + plane_stack.shape[2:])
            return {
                k: jnp.asarray(v)
                for k, v in compress_plane(np.ascontiguousarray(flat)).items()
            }

        def _conv_raw(key):
            if ("raw", key) not in prep_cache:
                mtx, crange = key
                prep_cache[("raw", key)] = jax.jit(
                    lambda yy, cc: ycbcr420_to_rgb(yy, cc, mtx, crange).astype(
                        jnp.float32
                    )
                    * (1.0 / 255.0)
                )
            return prep_cache[("raw", key)]

        def to_batch(frame_lists):
            # (batch*cams) x 1 YuvFrames -> (B, N_cam, H, W, 3) float in [0, 1].
            # Each frame reports its own colorspace; convert per distinct
            # (matrix, range) group so a batch mixing bt601/bt709 or
            # full/limited clips gets the right coefficients per frame (the
            # homogeneous case — one clip set, one colorspace — ships the
            # compressed wire through a single jitted call).
            flat = [f[0] for f in frame_lists]
            y = np.stack([f.y for f in flat])
            cbcr = np.stack([f.cbcr for f in flat])
            keys = sorted({(f.matrix, f.color_range) for f in flat})
            # the codec needs rows divisible by 8 (bit-packing granularity);
            # odd widths fall back to the raw YUV wire
            packable = HW[1] % 8 == 0
            if len(keys) == 1 and packable:
                rgb = _conv(keys[0])(_pack(y), _pack(cbcr))
            elif len(keys) == 1:
                rgb = _conv_raw(keys[0])(jnp.asarray(y), jnp.asarray(cbcr))
            else:
                rgb = jnp.zeros((len(flat), *HW, 3), jnp.float32)
                for key in keys:
                    idx = np.array(
                        [i for i, f in enumerate(flat)
                         if (f.matrix, f.color_range) == key]
                    )
                    rgb = rgb.at[idx].set(
                        _conv_raw(key)(jnp.asarray(y[idx]), jnp.asarray(cbcr[idx]))
                    )
            return rgb.reshape(batch_drives, NUM_CAMS, *HW, 3)

        # prime params + double buffering: issue Decode for batch 0
        example = make_petr_example_batch(
            batch_size=batch_drives, num_cams=NUM_CAMS, hw=HW, num_classes=num_classes
        )
        params, opt_state, memory, memory_ref = init_fn(
            jax.random.PRNGKey(0), example["images"]
        )

        indices = sampler.get_next_batch_indices()
        reader.Decode(*request_for(indices), yuv=True)

        losses = []
        t0 = time.time()
        for step in range(num_steps):
            frames = reader.GetBuffer(*request_for(indices), yuv=True)
            next_indices = sampler.get_next_batch_indices()
            reader.Decode(*request_for(next_indices), yuv=True)  # overlap with training

            batch = {
                "images": to_batch(frames),
                "ego_transform": ego_forward(batch_drives),
                **synth_labels(rng, batch_drives, num_classes),
            }
            # the memory INPUT for this batch (the post-step memory is the
            # input for frame t+1 — evaluating this batch with it would
            # apply the ego compensation twice)
            eval_memory, eval_memory_ref = memory, memory_ref
            params, opt_state, memory, memory_ref, metrics = train_step(
                params, opt_state, batch, memory, memory_ref
            )
            losses.append(float(metrics["loss"]))
            indices = next_indices
        dt = time.time() - t0

        # preemption-safe resume: the sampler position is a tiny JSON-able
        # dict — persist it next to the params/opt_state/memory/memory_ref
        # checkpoint
        # (e.g. in the orbax tree) and a restarted job continues the drive
        # walk exactly where training stopped (no repeated/skipped clips).
        # The stream readers need no state: they re-seek from any frame id.
        sampler_ckpt = sampler.get_state()
        resumed = SequenceSampler(
            total_batch_size=batch_drives,
            sequence_lengths=[FRAMES_PER_CLIP] * len(drives),
            seed=0,
        )
        resumed.set_state(sampler_ckpt)
        assert resumed.get_next_batch_indices() == sampler.get_next_batch_indices()
        print(
            f"{num_steps} stream-PETR steps in {dt:.1f}s "
            f"({num_steps * batch_drives * NUM_CAMS / dt:.1f} camera-frames/s); "
            f"loss {losses[0]:.3f} -> {losses[-1]:.3f}"
        )

        # --- evaluation: 3-D decode + nuScenes-protocol mAP -------------- #
        # One jitted forward -> NMS-free decode; the center-distance
        # evaluator implements the devkit matching (0.5/1/2/4 m ladder).
        from accvlab_tpu.models import DetectionEvaluator, decode_detections_3d

        outputs = model.apply(
            params, batch["images"], memory=eval_memory,
            memory_ref=eval_memory_ref, ego_transform=batch["ego_transform"],
        )
        dets = decode_detections_3d(outputs, max_detections=16,
                                    score_threshold=0.05)
        gt_classes = batch["gt_classes"]
        gt = {
            "boxes3d": batch["gt_boxes"],
            "classes": gt_classes.create_with_sample_sizes_like_self(
                gt_classes.tensor.astype(jnp.int32)
            ),
        }
        ev = DetectionEvaluator(metric="center_distance",
                                thresholds=(0.5, 1.0, 2.0, 4.0))
        ev.update(dets, gt)
        res = ev.compute()
        print(
            f"nuScenes-style mAP (0.5/1/2/4 m, synthetic gt, {num_steps} demo "
            f"steps): {res['mAP']:.4f}"
        )
        reader.ReleaseResources()
        return losses


if __name__ == "__main__":
    losses = main()
    assert losses[-1] < losses[0], "loss should decrease over the first steps"
    print("OK")
