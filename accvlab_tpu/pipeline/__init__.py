"""accvlab_tpu.pipeline — structured data-loading & preprocessing framework.

TPU-native equivalent of ACCV-Lab's ``accvlab.dali_pipeline_framework``: a
:class:`PipelineDefinition` composes an input source with an ordered list of
processing steps into an executable input pipeline. Host steps run per-sample
on worker threads (numpy); device steps are fused into ONE jit-compiled XLA
program per batch shape; a prefetch ring overlaps host work, transfer, and
device compute. Construction-time blueprint checking is preserved exactly
(it is the reference framework's best idea).
"""

from .dtypes import DType, dtype_for_numpy, numpy_dtype_for
from .sample_data_group import SampleDataGroup
from .pipeline import PipelineDefinition, TPUPipeline
from .random_context import (
    DeviceRandomContext,
    HostRandomContext,
    RandomContext,
    ScriptedRandomContext,
)
from .structured_output_iterator import (
    DALIStructuredOutputIterator,
    StructuredOutputIterator,
)

__all__ = [
    "DALIStructuredOutputIterator",
    "DType",
    "DeviceRandomContext",
    "HostRandomContext",
    "PipelineDefinition",
    "RandomContext",
    "SampleDataGroup",
    "ScriptedRandomContext",
    "StructuredOutputIterator",
    "TPUPipeline",
    "dtype_for_numpy",
    "numpy_dtype_for",
]
