"""accvlab_tpu.hostcopy — async packed multi-tensor host->device copy.

TPU-native equivalent of ACCV-Lab's ``accvlab.multi_tensor_copier``
(``start_copy`` / ``AsyncCopyHandle``; C++ parallel packing engine +
single-transfer-per-chunk device placement).
"""

from .async_copy import AsyncCopyHandle, start_copy

__all__ = ["AsyncCopyHandle", "start_copy"]
