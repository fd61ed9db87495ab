"""End-to-end 2-D detection input pipeline + training example.

Parity: reference ``dali_pipeline_framework/examples/pipeline_setup/
object_detection_2d_pipeline.py`` + ``example_pipeline_obj_det_2d.py`` —
multi-camera JPEG decode, augmentation, CenterNet heatmap target generation,
drop-in DataLoader-style iteration, Stopwatch instrumentation — re-targeted
at a TPU mesh.

Run (single chip, synthetic data):
    python examples/object_detection_2d_pipeline.py
"""

import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from accvlab_tpu.pipeline import (
    DType,
    PipelineDefinition,
    SampleDataGroup,
    StructuredOutputIterator,
)
from accvlab_tpu.pipeline.inputs import DataProvider, ShuffledShardedInputCallable
from accvlab_tpu.pipeline.processing_steps import (
    AffineTransformer,
    BoundingBoxToHeatmapConverter,
    DCTWirePacker,
    DCTWireUnpacker,
    ImageDecoder,
    ImageMeanStdDevNormalizer,
    PhotoMetricDistorter,
    TensorSizeAdder,
    WirePlanePacker,
    WirePlaneUnpacker,
    YCbCrToRGBConverter,
)
from accvlab_tpu.parallel import host_shard_info
from accvlab_tpu.tools import Stopwatch

NUM_CAMERAS = 2
NUM_CLASSES = 10
IMAGE_HW = (372, 512)
OUT_HW = (256, 512)
HEATMAP_HW = (64, 128)


class SyntheticNuScenesProvider(DataProvider):
    """Stand-in for the reference's NuScenes data provider (the real one
    would read the NuScenes metadata pickle + JPEG files)."""

    def __init__(self, num_samples=64):
        from PIL import Image

        self._n = num_samples

        rng = np.random.default_rng(0)
        self._jpegs = []
        for _ in range(8):
            img = rng.integers(0, 255, (*IMAGE_HW, 3), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=90)
            self._jpegs.append(np.frombuffer(buf.getvalue(), np.uint8).copy())

    @property
    def sample_data_structure(self) -> SampleDataGroup:
        cam = SampleDataGroup()
        cam.add_data_field("image", DType.UINT8)
        ann = SampleDataGroup()
        ann.add_data_field("bboxes", DType.FLOAT)
        ann.add_data_field("categories", DType.INT32)
        cam.add_data_group_field("annotations", ann)
        root = SampleDataGroup()
        root.add_data_group_field_array("cameras", cam, NUM_CAMERAS)
        root.add_data_field("token", DType.STRING)
        return root

    def get_data(self, sample_index: int) -> SampleDataGroup:
        rng = np.random.default_rng(sample_index)
        sdg = self.sample_data_structure
        n_obj = 16
        for cidx in range(NUM_CAMERAS):
            cam = sdg["cameras"][cidx]
            cam["image"] = self._jpegs[(sample_index + cidx) % len(self._jpegs)]
            x1 = rng.uniform(0, IMAGE_HW[1] - 40, (n_obj,))
            y1 = rng.uniform(0, IMAGE_HW[0] - 40, (n_obj,))
            cam["annotations"]["bboxes"] = np.stack(
                [x1, y1, x1 + rng.uniform(10, 120, n_obj), y1 + rng.uniform(10, 90, n_obj)],
                axis=1,
            ).astype(np.float32)
            cam["annotations"]["categories"] = rng.integers(
                0, NUM_CLASSES, (n_obj,)
            ).astype(np.int32)
        sdg["token"] = f"sample-{sample_index:06d}"
        return sdg

    def get_number_of_samples(self) -> int:
        return self._n


def build_pipeline(batch_size=4, wire="dct"):
    shard_id, num_shards = host_shard_info()  # DDP-equivalent input sharding
    provider = SyntheticNuScenesProvider()
    input_callable = ShuffledShardedInputCallable(
        provider, batch_size=batch_size, shard_id=shard_id, num_shards=num_shards,
        shuffle=True, seed=21,
    )
    if wire == "dct":
        from accvlab_tpu.pipeline import native_jpeg

        if not native_jpeg.available():
            print("native libjpeg unavailable -> using the YUV pixel wire")
            wire = "yuv"
    if wire == "dct":
        # DCT coefficient wire (default): the host runs only the entropy
        # half of JPEG decode and ships quantized DCT coefficients; the
        # device program does dequantize + IDCT (MXU matmuls) + the color
        # conversion — fewest host->device bytes AND least host CPU
        # (docs/guides.md "The DCT coefficient wire"). The band partition
        # is tuned offline to the content at a 16-field budget — the
        # optimizer is an exact DP over per-band histograms, and the
        # result is static geometry shared by both wire halves.
        from accvlab_tpu.pipeline.processing_steps import optimize_band_groups

        probe_jpegs = [
            provider.get_data(i)["cameras"][0]["image"] for i in range(3)
        ]
        groups = optimize_band_groups(
            probe_jpegs, IMAGE_HW, IMAGE_HW, max_groups=16
        )
        wire_steps = [
            DCTWirePacker("image", source_hw=IMAGE_HW, out_hw=IMAGE_HW,
                          grouping=groups),
            DCTWireUnpacker("image", source_hw=IMAGE_HW, out_hw=IMAGE_HW,
                            grouping=groups),
        ]
    else:
        # YUV 4:2:0 pixel wire: the host ships planar Y + subsampled CbCr
        # (1.5 B/px; native libjpeg M/8-scaled decode when available) — the
        # TPU analog of the reference's NVDEC->ColorSpace.cu split — plus
        # lossless wire compression: bitplane-packed predictor residuals,
        # decompressed INSIDE the jitted device program (bit-identical;
        # ~1.2-2x fewer bytes). Works for any image source, not just JPEG.
        wire_steps = [
            ImageDecoder("image", wire_format="yuv420"),
            WirePlanePacker(["image", "image_cbcr"]),
            WirePlaneUnpacker(["image", "image_cbcr"]),
        ]
    steps = wire_steps + [
        YCbCrToRGBConverter("image"),
        TensorSizeAdder("image", "_hw"),
        AffineTransformer(
            output_hw=OUT_HW,
            resizing_mode=AffineTransformer.ResizingMode.STRETCH,
            image_field_names="image",
            transformation_steps=[
                AffineTransformer.UniformScaling(0.5, 0.9, 1.1),
                AffineTransformer.Translation(0.5, [-20.0, -20.0], [20.0, 20.0]),
            ],
        ),
        PhotoMetricDistorter(
            "image",
            min_max_brightness=[-16.0, 16.0],
            min_max_hue=[-12.0, 12.0],
            min_max_contrast=[0.75, 1.25],
            min_max_saturation=[0.8, 1.2],
        ),
        BoundingBoxToHeatmapConverter(
            annotation_field_name="annotations",
            bboxes_in_name="bboxes",
            heatmap_out_name="heatmap",
            heatmap_hw=HEATMAP_HW,
            image_hw_field_name="image_hw",
            categories_in_name="categories",
            num_categories=NUM_CLASSES,
            is_active_opt_out_name="active",
            center_opt_out_name="center",
            center_offset_opt_out_name="offset",
            height_width_bboxes_heatmap_opt_out_name="hw",
        ),
        ImageMeanStdDevNormalizer(
            "image", mean=[103.5, 116.3, 123.7], std_dev=[57.4, 57.1, 58.4]
        ),
    ]
    definition = PipelineDefinition(
        input_callable, steps, check_data_format=False,
        copy_external_source_passthrough_outputs=False,
    )
    pipe = definition.get_pipeline(batch_size=batch_size, num_threads=4, seed=0)
    blueprint = definition.check_and_get_output_data_structure()
    loader = StructuredOutputIterator.CreateAsDataLoaderObject(
        num_batches_in_epoch=input_callable.length,
        pipeline=pipe,
        sample_data_structure_blueprint=blueprint,
    )
    return loader, pipe


def main():
    import os

    import jax

    sw = Stopwatch()
    sw.enable(num_warmup_iters=1, print_every_n_iters=None, do_device_sync=True)
    loader, pipe = build_pipeline()
    # optional phase timeline (chrome://tracing / Perfetto): per-batch
    # producer/consumer spans — see docs/guides.md "Pipeline observability"
    trace_path = os.environ.get("ACCVLAB_EXAMPLE_TRACE")
    if trace_path:
        pipe.start_trace()
    print(f"devices: {jax.devices()}  batches/epoch: {len(loader)}")
    for i, batch in enumerate(loader):
        sw.start_meas("batch")
        img = batch["cameras"][0]["image"]
        heat = batch["cameras"][0]["annotations"]["heatmap"]
        jax.block_until_ready(img)
        sw.end_meas("batch")
        sw.finish_iter()
        if i == 0:
            print(f"image {img.shape} {img.dtype} | heatmap {heat.shape}")
    sw.print_eval_times()
    if trace_path:
        trace = pipe.stop_trace(trace_path)
        print(f"phase timeline: {len(trace)} events -> {trace_path}")
    pipe.stop()


if __name__ == "__main__":
    main()
