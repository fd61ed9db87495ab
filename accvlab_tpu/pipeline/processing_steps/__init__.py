"""Processing steps for the pipeline framework.

TPU-native equivalents of the reference
``dali_pipeline_framework/accvlab/.../processing_steps`` (one class per DALI
step; see per-class docstrings for parity citations).
"""

from .pipeline_step_base import BatchLevelStepBase, PipelineStepBase
from .image_decoder import ImageDecoder
from .color_converter import YCbCrToRGBConverter
from .wire_compression import (
    WirePlanePacker,
    WirePlaneUnpacker,
    compress_plane,
    decompress_plane,
)
from .dct_wire import (
    DCTWirePacker,
    DCTWireUnpacker,
    compress_jpeg_dct,
    decompress_jpeg_dct,
    optimize_band_groups,
)
from .image_normalizers import ImageMeanStdDevNormalizer, ImageRange01Normalizer
from .padders import ImageToTileSizePadder, PaddingToUniform, optimize_size_buckets
from .field_utils import AxesLayoutSetter, TensorSizeAdder, UnneededFieldRemover
from .photo_metric_distorter import PhotoMetricDistorter
from .affine_transformer import AffineTransformer
from .selection_steps import (
    ConditionalElementRemover,
    CoordinateCropper,
    PointsInRangeCheck,
    VisibleBboxSelector,
)
from .bev_bboxes_transformer_3d import BEVBBoxesTransformer3D
from .bounding_box_to_heatmap_converter import BoundingBoxToHeatmapConverter
from .annotation_element_condition_eval import AnnotationElementConditionEval
from .applied_steps import (
    DataGroupArrayInPathElementsAppliedStep,
    DataGroupArrayWithNameElementsAppliedStep,
    DataGroupInPathAppliedStep,
    DataGroupsWithNameAppliedStep,
    GroupToApplyToSelectedStepBase,
)

__all__ = [
    "BEVBBoxesTransformer3D",
    "DCTWirePacker",
    "DCTWireUnpacker",
    "AffineTransformer",
    "AnnotationElementConditionEval",
    "AxesLayoutSetter",
    "BatchLevelStepBase",
    "BoundingBoxToHeatmapConverter",
    "ConditionalElementRemover",
    "CoordinateCropper",
    "DataGroupArrayInPathElementsAppliedStep",
    "DataGroupArrayWithNameElementsAppliedStep",
    "DataGroupInPathAppliedStep",
    "DataGroupsWithNameAppliedStep",
    "GroupToApplyToSelectedStepBase",
    "ImageDecoder",
    "ImageMeanStdDevNormalizer",
    "ImageRange01Normalizer",
    "ImageToTileSizePadder",
    "PaddingToUniform",
    "PhotoMetricDistorter",
    "PipelineStepBase",
    "PointsInRangeCheck",
    "TensorSizeAdder",
    "UnneededFieldRemover",
    "VisibleBboxSelector",
    "YCbCrToRGBConverter",
    "WirePlanePacker",
    "WirePlaneUnpacker",
    "compress_jpeg_dct",
    "compress_plane",
    "decompress_jpeg_dct",
    "optimize_band_groups",
    "optimize_size_buckets",
    "decompress_plane",
]
