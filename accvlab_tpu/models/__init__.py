"""accvlab_tpu.models — reference perception models driving the framework.

The reference toolkit feeds ADAS perception training (CenterNet-style 2-D
detection, StreamPETR-style multi-camera 3-D detection; see its examples).
This package provides the flagship TPU-native training target: a
CenterNet-style multi-camera detector whose target generation (heatmaps) and
loss (ragged masked reductions) exercise every accvlab_tpu layer.
"""

from .centernet import (
    CenterNetDetector,
    centernet_loss,
    decode_detections,
    make_train_step,
)
from .petr import (
    PETRDetector,
    compensate_ref_points,
    decode_detections_3d,
    make_motion_petr_train_step,
    make_petr_train_step,
    make_streaming_petr_train_step,
    petr_loss,
    propagate_queries,
    propagate_queries_with_motion,
)
from .train_utils import make_grad_accum_step

__all__ = [
    "make_grad_accum_step",
    "CenterNetDetector",
    "PETRDetector",
    "centernet_loss",
    "compensate_ref_points",
    "decode_detections_3d",
    "make_motion_petr_train_step",
    "make_petr_train_step",
    "make_streaming_petr_train_step",
    "propagate_queries",
    "propagate_queries_with_motion",
    "make_train_step",
    "petr_loss",
]
