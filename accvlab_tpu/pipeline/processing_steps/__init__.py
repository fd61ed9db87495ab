"""Processing steps for the pipeline framework.

TPU-native equivalents of the reference
``dali_pipeline_framework/accvlab/.../processing_steps`` (one class per DALI
step; see per-class docstrings for parity citations).
"""

from .pipeline_step_base import BatchLevelStepBase, PipelineStepBase
from .image_decoder import ImageDecoder
from .image_normalizers import ImageMeanStdDevNormalizer, ImageRange01Normalizer
from .padders import ImageToTileSizePadder, PaddingToUniform
from .field_utils import AxesLayoutSetter, TensorSizeAdder, UnneededFieldRemover

__all__ = [
    "AxesLayoutSetter",
    "BatchLevelStepBase",
    "ImageDecoder",
    "ImageMeanStdDevNormalizer",
    "ImageRange01Normalizer",
    "ImageToTileSizePadder",
    "PaddingToUniform",
    "PipelineStepBase",
    "TensorSizeAdder",
    "UnneededFieldRemover",
]
