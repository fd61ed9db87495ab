"""Input sources & samplers for the pipeline framework.

TPU-native equivalent of ``dali_pipeline_framework/accvlab/.../inputs``
(parity per class; ``SampleInfo`` replaces ``nvidia.dali.types.SampleInfo``).
"""

from .base import CallableBase, DataProvider, IterableBase, SampleInfo, SamplerBase
from .elastic_sharded_input_callable import (
    ElasticShardedInputCallable,
    elastic_reshard,
)
from .sampler_input_callable import SamplerInputCallable
from .sampler_input_iterable import SamplerInputIterable
from .sequence_sampler import SequenceSampler
from .shuffled_sharded_input_callable import ShuffledShardedInputCallable

__all__ = [
    "CallableBase",
    "DataProvider",
    "ElasticShardedInputCallable",
    "IterableBase",
    "SampleInfo",
    "SamplerBase",
    "SamplerInputCallable",
    "SamplerInputIterable",
    "SequenceSampler",
    "ShuffledShardedInputCallable",
    "elastic_reshard",
]
