"""Process-global compiled-program sharing (``shared_jit``).

XLA compiles are the dominant fixed cost of (re)starting a training process
on TPU: a checkpoint resume, a preemption restart, or an elastic reshard
re-creates pipelines and train steps whose device programs are structurally
identical to ones this process already compiled — but ``jax.jit`` caches per
function *object*, so a freshly constructed closure always pays a full
compile. ``shared_jit`` closes that gap: it traces the function once to a
jaxpr and keys a process-wide jitted ``eval_jaxpr`` wrapper on the program's
*structure* (jaxpr text, const avals, arg/out tree layout, donation split).
Two structurally identical builds share one compiled executable; the second
build starts executing immediately.

Trace-time constants (closure captures such as IDCT bases or lookup tables)
are hoisted into runtime arguments, so instances whose captured tables are
equal-shaped but distinct objects still share; consts are held host-side so
the shared program never pins itself to one device and mesh-sharded callers
coexist with single-device ones (jax's own dispatch cache keys the final
compile on the concrete arg shardings).

No reference analog: the reference's CUDA kernels are compiled ahead of time
(``setup.py`` extensions), so process restart costs nothing there — on
TPU/XLA the jit-compile cost is real and this is the TPU-native answer
(the on-disk JAX compilation cache does not cover the axon remote backend;
see ``docs/performance.md``).

Used by the pipeline executor for every fused device program
(``pipeline/pipeline.py``), and available directly for model train steps::

    step = shared_jit(train_step, (params, opt_state, batch))
    params, opt_state, metrics = step(params, opt_state, batch)

Disable globally with ``ACCVLAB_SHARE_PROGRAMS=0`` (every call falls back to
a plain ``jax.jit``).
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict

import numpy as np

__all__ = ["shared_jit", "program_cache_stats", "clear_program_cache"]

_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
_LOCK = threading.Lock()
# LRU-bounded so a long-lived trainer cycling through many batch-shape
# families doesn't pin every executable forever.
_CACHE_MAX = 64
# Host-resident consts re-ship per dispatch (a plain jax.jit bakes them
# into the executable once). 64 KB is negligible against any real batch
# (the DCT wire ships ~5.3 MB/batch; its decode consts are ~2 KB) — larger
# captures fall back to plain jit, which costs the compile but never the
# per-dispatch transfer.
_CONST_BYTES_MAX = 64 << 10

_stats = {"hits": 0, "misses": 0, "declined": 0}


def program_cache_stats() -> dict:
    """Counters + current size of the shared-program cache (observability)."""
    with _LOCK:
        return {**_stats, "size": len(_CACHE)}


def clear_program_cache() -> None:
    """Drop every shared program (frees the compiled executables)."""
    with _LOCK:
        _CACHE.clear()


class _SharedProgram:
    """One caller's handle on a shared jitted program: the process-wide
    ``eval_jaxpr`` wrapper plus this caller's trace-time constants."""

    __slots__ = ("_jitted", "_consts", "_out_tree", "_in_specs")

    def __init__(self, jitted, consts, out_tree, in_specs):
        self._jitted = jitted
        self._consts = consts
        self._out_tree = out_tree
        self._in_specs = in_specs

    def _check_leaves(self, flat):
        # evaluating a jaxpr with avals it was not traced for is at best a
        # confusing shape error deep inside eval_jaxpr and at worst a
        # silent dtype divergence — fail loudly at the boundary instead
        # (shardings are NOT part of the spec: the same program serves
        # single-device and mesh callers, jit recompiles per sharding)
        if len(flat) != len(self._in_specs):
            raise TypeError(
                f"shared program called with {len(flat)} array leaves, "
                f"traced with {len(self._in_specs)}"
            )
        for x, (shape, dtype) in zip(flat, self._in_specs):
            got_shape = tuple(getattr(x, "shape", np.shape(x)))
            got_dtype = getattr(x, "dtype", None)
            if got_dtype is None:
                # python scalar leaf: canonicalize the way tracing did
                # (python int traces as the default int, not int64)
                from jax.dtypes import canonicalize_dtype

                got_dtype = canonicalize_dtype(np.result_type(x))
            got = (got_shape, str(got_dtype))
            if got != (shape, dtype):
                raise TypeError(
                    f"shared program called with leaf {got}, traced with "
                    f"{(shape, dtype)} — build a new shared_jit for new "
                    "shapes/dtypes"
                )

    def __call__(self, *args):
        from jax.tree_util import tree_leaves, tree_unflatten

        flat = tree_leaves(args)
        self._check_leaves(flat)
        outs = self._jitted(self._consts, *flat)
        return tree_unflatten(self._out_tree, outs)

    def lower(self, *args):
        """Lower the shared program for these arg specs (audit surface)."""
        from jax.tree_util import tree_leaves

        return self._jitted.lower(self._consts, *tree_leaves(args))


def _try_share(fn, example_args, donate_argnums):
    import hashlib

    import jax
    from jax.tree_util import tree_flatten, tree_leaves, tree_structure

    try:
        closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    except Exception:
        return None  # exotic inputs the abstract trace can't handle
    consts = []
    const_bytes = 0
    for c in closed.consts:
        # normalize every const to a host numpy array: committed jax arrays
        # would pin the program to their device (conflicting with mesh-
        # sharded batch args), and jax 0.9's TypedNdArray consts don't
        # expose nbytes directly. Always COPY: a plain jax.jit bakes the
        # captured table's trace-time VALUE into the executable, so a
        # caller mutating the table afterwards must not change this
        # program's results either (np.asarray aliases numpy captures).
        try:
            arr = np.array(c, copy=True)
        except Exception:
            return None  # opaque capture: don't share
        if arr.dtype == object:
            return None
        const_bytes += arr.nbytes
        consts.append(arr)
    if const_bytes > _CONST_BYTES_MAX:
        return None
    # arg-level donate positions -> flat leaf positions (all leaves of a
    # donated argument are donated, matching jax.jit semantics — including
    # rejecting out-of-range positions, which must not be silently dropped)
    bad = [i for i in donate_argnums if not 0 <= i < len(example_args)]
    if bad:
        raise ValueError(
            f"shared_jit got donate_argnums={tuple(donate_argnums)}, but the "
            f"function only accepts {len(example_args)} positional arguments"
        )
    donate_flat = []
    pos = 0
    for i, a in enumerate(example_args):
        n = len(tree_leaves(a))
        if i in donate_argnums:
            donate_flat.extend(range(pos, pos + n))
        pos += n
    _, in_tree = tree_flatten(example_args)
    out_tree = tree_structure(out_shape)
    # Compile-affecting jax config (default matmul precision, x64) is
    # deliberately NOT in this key: the executable compiles at DISPATCH
    # time, and jax's own jit cache keys every dispatch on the then-active
    # trace context (verified: the same jitted wrapper grows one cache
    # entry per distinct precision/x64 context) — a build-time config
    # snapshot could neither enforce nor relax that, only split wrappers.
    key = (
        hashlib.sha256(str(closed.jaxpr).encode()).hexdigest(),
        tuple((tuple(c.shape), str(c.dtype)) for c in consts),
        str(in_tree),
        str(out_tree),
        tuple(donate_flat),
    )
    with _LOCK:
        jitted = _CACHE.get(key)
        if jitted is not None:
            _CACHE.move_to_end(key)
            _stats["hits"] += 1
        else:
            _stats["misses"] += 1
            jaxpr = closed.jaxpr

            def _run(consts, *flat):
                from jax.core import eval_jaxpr

                return eval_jaxpr(jaxpr, consts, *flat)

            jitted = jax.jit(
                _run, donate_argnums=tuple(i + 1 for i in donate_flat)
            )
            _CACHE[key] = jitted
            while len(_CACHE) > _CACHE_MAX:
                _CACHE.popitem(last=False)
    # str(dtype) rather than np.dtype: extended dtypes (typed PRNG keys)
    # have no numpy equivalent but stringify consistently on aval and array
    in_specs = tuple(
        (tuple(v.aval.shape), str(v.aval.dtype)) for v in closed.jaxpr.invars
    )
    return _SharedProgram(jitted, consts, out_tree, in_specs)


def shared_jit(fn, example_args, donate_argnums=()):
    """jit ``fn`` with process-global compiled-program sharing.

    Args:
        fn: a jit-compatible function of positional array-pytree arguments.
        example_args: a tuple of example arguments (concrete arrays or
            ``jax.ShapeDtypeStruct`` specs) used to trace the program once.
        donate_argnums: argument positions whose buffers the caller hands
            over (``jax.jit`` semantics; every leaf of the argument is
            donated).

    Returns a callable with the program's call signature (plus ``.lower``
    for the audit surface). When a structurally identical program was
    already built in this process, its compiled executable is reused and no
    XLA compile happens. When sharing is disabled
    (``ACCVLAB_SHARE_PROGRAMS=0``), the trace fails, or the function closes
    over constants too large to re-ship per dispatch, falls back to a plain
    ``jax.jit``.
    """
    if os.environ.get("ACCVLAB_SHARE_PROGRAMS", "1") != "0":
        shared = _try_share(fn, tuple(example_args), tuple(donate_argnums))
        if shared is not None:
            return shared
    with _LOCK:
        _stats["declined"] += 1
    import jax

    return jax.jit(fn, donate_argnums=tuple(donate_argnums))
