"""accvlab_tpu.polyline — polyline arc-length ops for TPU.

TPU-native equivalent of ACCV-Lab's ``accvlab.lane_helpers`` polyline API.
"""

from .functions import (
    interpolate,
    interpolate_var_size_batch,
    lengths,
    lengths_var_size_batch,
)

__all__ = [
    "interpolate",
    "interpolate_var_size_batch",
    "lengths",
    "lengths_var_size_batch",
]
