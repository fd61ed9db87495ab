"""Profiler trace ranges (TPU-native re-design of
``optim_test_tools/accvlab/optim_test_tools/nvtx_range_wrapper.py:26-252``).

NVTX push/pop maps to ``jax.profiler.TraceAnnotation`` ranges, which show up
in the XLA/TensorBoard profiler exactly like NVTX ranges do in Nsight. The
optional sync-on-push/pop (for making host ranges bound device work) maps to
draining the device queue, as in :mod:`.stopwatch`.

When disabled (default), ``range_push``/``range_pop`` are rebound to no-ops —
zero overhead in production code (reference ``:143-168``).
"""

from __future__ import annotations

from typing import List, Optional

from .singleton_base import SingletonBase
from .stopwatch import _device_sync


class TraceRangeWrapper(SingletonBase):
    """Singleton push/pop profiler-range wrapper.

    Usage::

        ranges = TraceRangeWrapper()
        ranges.enable(sync_on_push=False, sync_on_pop=False,
                      keep_track_of_range_order=True)
        ranges.range_push("augment")
        ...
        ranges.range_pop("augment")
    """

    def __init__(self, *args, **kwargs):
        if self._singleton_initialized:
            return
        self._singleton_initialized = True
        self._enabled = False
        self._sync_on_push = False
        self._sync_on_pop = False
        self._track_order = False
        self._stack: List[tuple] = []
        self._bind_disabled()

    def _bind_disabled(self):
        noop = lambda *a, **k: None
        self.range_push = noop
        self.range_pop = noop

    def _bind_enabled(self):
        self.range_push = self._range_push_enabled
        self.range_pop = self._range_pop_enabled

    def enable(
        self,
        sync_on_push: bool = False,
        sync_on_pop: bool = False,
        keep_track_of_range_order: bool = False,
    ):
        """Enable trace ranges.

        Args:
            sync_on_push: drain the device queue before opening a range.
            sync_on_pop: drain the device queue before closing a range.
            keep_track_of_range_order: verify pops match pushes (LIFO) and
                that the popped name (if given) matches the top of the stack.
        """
        self._enabled = True
        self._sync_on_push = sync_on_push
        self._sync_on_pop = sync_on_pop
        self._track_order = keep_track_of_range_order
        self._stack = []
        self._bind_enabled()

    def disable(self):
        assert not self._stack, "Cannot disable with open ranges"
        self._enabled = False
        self._bind_disabled()

    @property
    def is_enabled(self) -> bool:
        """Whether the wrapper is enabled (a property, parity: ``nvtx_range_wrapper.py:114``)."""
        return self._enabled

    def _range_push_enabled(self, range_name: str):
        if self._sync_on_push:
            _device_sync()
        from jax.profiler import TraceAnnotation

        ann = TraceAnnotation(range_name)
        ann.__enter__()
        self._stack.append((range_name, ann))

    def _range_pop_enabled(self, range_name: Optional[str] = None):
        assert self._stack, "range_pop without a matching range_push"
        name, ann = self._stack.pop()
        if self._track_order and range_name is not None:
            assert name == range_name, (
                f"Out-of-order range pop: expected '{name}', got '{range_name}'"
            )
        if self._sync_on_pop:
            _device_sync()
        ann.__exit__(None, None, None)


# API-compat alias for code written against the reference naming.
NVTXRangeWrapper = TraceRangeWrapper


# ---------------------------------------------------------------------- #
# numba_nvtx-style free functions                                        #
# ---------------------------------------------------------------------- #
#
# The reference ships handle-based free functions callable from numba @njit
# host loops (``optim_test_tools/numba_nvtx/nvtx.py:46-71``): register a
# string once, push by integer handle, pop. accvlab_tpu has no numba layer
# (host steps are ordinary Python; device code is traced), so these are plain
# Python bindings onto jax.profiler ranges with the same contract: handle 0
# is a safe no-op, pushes/pops nest LIFO.

_handle_names: dict = {}
_free_stack: List = []


def register_string(name: str) -> int:
    """Register a range name once and return an integer handle (never 0)."""
    for h, n in _handle_names.items():
        if n == name:
            return h
    handle = len(_handle_names) + 1
    _handle_names[handle] = name
    return handle


def range_push(handle: int) -> None:
    """Open a profiler range by handle. Handle 0 (or unknown) is a no-op."""
    name = _handle_names.get(int(handle))
    if name is None:
        _free_stack.append(None)
        return
    from jax.profiler import TraceAnnotation

    ann = TraceAnnotation(name)
    ann.__enter__()
    _free_stack.append(ann)


def range_pop() -> None:
    """Close the innermost range opened with :func:`range_push`."""
    if not _free_stack:
        return
    ann = _free_stack.pop()
    if ann is not None:
        ann.__exit__(None, None, None)
