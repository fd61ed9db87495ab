"""accvlab_tpu.models — reference perception models driving the framework.

The reference toolkit feeds ADAS perception training (CenterNet-style 2-D
detection, StreamPETR-style multi-camera 3-D detection; see its examples).
This package provides the flagship TPU-native training target: a
CenterNet-style multi-camera detector whose target generation (heatmaps) and
loss (ragged masked reductions) exercise every accvlab_tpu layer.

Submodules resolve lazily (PEP 562): a serving host that only needs
``models.serving``/``models.checkpoint`` never imports flax or the model
definitions — the deployment contract tested by
``tests/test_serving_export.py::test_artifact_is_self_contained_no_model_code``.
"""

_CENTERNET = ("CenterNetDetector", "centernet_loss", "decode_detections", "make_train_step")
_PETR = (
    "PETRDetector",
    "compensate_ref_points",
    "decode_detections_3d",
    "make_motion_petr_train_step",
    "make_petr_train_step",
    "make_streaming_petr_train_step",
    "petr_loss",
    "propagate_queries",
    "propagate_queries_with_motion",
)
_TRAIN_UTILS = ("make_grad_accum_step", "ema_init", "ema_update", "ema_params")
_SERVER = ("InferenceServer", "ServerClosed")
_EVAL = (
    "DetectionEvaluator", "box_iou_matrix", "match_detections",
    "match_detections_3d",
)

__all__ = (
    list(_CENTERNET) + list(_PETR) + list(_TRAIN_UTILS) + list(_SERVER)
    + list(_EVAL)
)

_SUBMODULES = (
    "centernet", "petr", "moe", "checkpoint", "serving", "quantize",
    "train_utils", "server", "eval",
)


def __getattr__(name):
    if name in _CENTERNET:
        from . import centernet as m
    elif name in _PETR:
        from . import petr as m
    elif name in _TRAIN_UTILS:
        from . import train_utils as m
    elif name in _SERVER:
        from . import server as m
    elif name in _EVAL:
        from . import eval as m
    elif name in _SUBMODULES:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    else:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    return getattr(m, name)


def __dir__():
    return sorted(__all__ + list(_SUBMODULES))
