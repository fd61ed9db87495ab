"""accvlab_tpu.tools — dev-time profiling & numerical-observability tooling.

TPU-native equivalent of ACCV-Lab's ``accvlab.optim_test_tools``:
Stopwatch (iteration profiler), TraceRangeWrapper (profiler ranges; NVTX
equivalent), TensorDumper (dump & compare harness).

Note on the reference's ``numba_nvtx`` component (NVTX ranges callable from
inside ``@njit`` DALI operators via llvmlite symbol registration): the
TPU-native pipeline has no numba layer — the numba operators became jnp
functions that trace into the fused device program, where
``jax.profiler``/``jax.named_scope`` annotations cover them. Host-side
per-sample code is ordinary Python, covered by :class:`TraceRangeWrapper`.
"""

from .chrome_trace import ChromeTraceRecorder
from .program_cache import clear_program_cache, program_cache_stats, shared_jit
from .singleton_base import SingletonBase
from .stopwatch import Stopwatch
from .tensor_dumper import TensorDumper
from .trace_range import (
    NVTXRangeWrapper,
    TraceRangeWrapper,
    range_pop,
    range_push,
    register_string,
)

__all__ = [
    "ChromeTraceRecorder",
    "NVTXRangeWrapper",
    "clear_program_cache",
    "program_cache_stats",
    "shared_jit",
    "SingletonBase",
    "Stopwatch",
    "TensorDumper",
    "TraceRangeWrapper",
    "range_pop",
    "range_push",
    "register_string",
]
