"""accvlab_tpu.tools — dev-time profiling & numerical-observability tooling.

TPU-native equivalent of ACCV-Lab's ``accvlab.optim_test_tools``:
Stopwatch (iteration profiler), TraceRangeWrapper (profiler ranges; NVTX
equivalent), TensorDumper (dump & compare harness).
"""

from .singleton_base import SingletonBase
from .stopwatch import Stopwatch
from .tensor_dumper import TensorDumper
from .trace_range import NVTXRangeWrapper, TraceRangeWrapper

__all__ = [
    "NVTXRangeWrapper",
    "SingletonBase",
    "Stopwatch",
    "TensorDumper",
    "TraceRangeWrapper",
]
