"""Async packed multi-tensor host->device copy.

TPU-native re-design of the reference's multi_tensor_copier
(``packages/multi_tensor_copier/accvlab/multi_tensor_copier/async_copy.py:27-169``
+ the C++ engine in ``csrc/multi_tensor_copier.cpp``). The performance
phenomenon is identical on TPU: per-transfer overhead dominates when a batch
contains hundreds of small meta-data arrays, so the win comes from packing
them into a few large contiguous transfers.

Mapping of the reference design onto the JAX runtime:

* Python-tree traversal -> ``jax.tree_util`` flatten (dict/list/tuple nesting
  preserved; opaque non-array leaves pass through; numpy scalars converted).
* pack planner (candidates <= 256 KB, alignment buckets, chunks <= 32 MB,
  ``compute_pack_plan``, ``multi_tensor_copier.cpp:553``) -> same thresholds,
  but chunks are built **per dtype** so the device-side views are plain
  slice+reshape (no byte aliasing needed — XLA arrays are typed).
* staging fill (parallel memcpy pool, ``:647``) -> the C++ packer in
  ``csrc/pack.cpp`` (ctypes, GIL released during the copy).
* one ``cudaMemcpyAsync`` per chunk (``:683``) -> one ``jax.device_put`` per
  chunk; JAX dispatch is asynchronous, the transfer overlaps Python.
* per-tensor path for large/non-packable tensors (``:775``) -> direct
  ``device_put``.
* completion events / future (``:841-965``) -> ``jax.Array.is_ready`` +
  a background-thread future.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, List, Optional

import numpy as np

from .native import parallel_pack

_PACK_CANDIDATE_MAX_BYTES = 256 * 1024  # reference: make_pack_candidate, :481
_DEFAULT_MAX_CHUNK = 32 * 1024 * 1024  # reference: max_packed_chunk_bytes

_background_pool: Optional[ThreadPoolExecutor] = None
_pool_lock = threading.Lock()

# Per-spec jitted helper programs are shape-specialized; a workload with
# varying trees would otherwise grow the cache (and XLA's) without bound.
# LRU-bound both sides symmetrically (reference analog: the fixed-size
# staging-buffer reuse in multi_tensor_copier.cpp:597).
_HELPER_CACHE_MAX = 256
_slicer_cache: "OrderedDict" = OrderedDict()
_d2h_packer_cache: "OrderedDict" = OrderedDict()
_slicer_lock = threading.Lock()


def _cached_program(cache: "OrderedDict", key, build):
    with _slicer_lock:
        fn = cache.get(key)
        if fn is not None:
            cache.move_to_end(key)
            return fn
    fn = build()
    with _slicer_lock:
        cache[key] = fn
        cache.move_to_end(key)
        while len(cache) > _HELPER_CACHE_MAX:
            cache.popitem(last=False)
    return fn


def _get_multi_slicer(spec):
    """One jitted program that carves the views of EVERY chunk (all dtypes)
    plus all zero-size leaves, in a single device dispatch.

    Carving in one compiled program means one device dispatch per BATCH
    instead of one per tensor or per chunk — with hundreds of packed
    tensors the per-dispatch overhead would otherwise dominate exactly like
    the per-``cudaMemcpyAsync`` overhead the reference's packing
    eliminates, and on a remote-attach tunnel each dispatch costs a fixed
    round trip (~20 ms measured 2026-08-20) on top.
    Zero-size leaves ride along as constants (they carry no bytes; shipping
    them as individual ``device_put`` calls cost the DCT wire ~28 round
    trips per batch for empty exception fields).

    ``spec`` = ``(chunk_specs, zero_specs)`` where ``chunk_specs`` is a tuple
    per chunk of ``(start_elem, num_elems, shape)`` triples and ``zero_specs``
    is a tuple of ``(dtype_str, shape)``.
    """

    def build():
        import jax
        import jax.numpy as jnp

        chunk_specs, zero_specs = spec

        def slicer(*chunks):
            outs = []
            for chunk, cs in zip(chunks, chunk_specs):
                for s, n, shape in cs:
                    outs.append(jax.lax.slice_in_dim(chunk, s, s + n).reshape(shape))
            for dt, shape in zero_specs:
                outs.append(jnp.zeros(shape, dt))
            return tuple(outs)

        return jax.jit(slicer)

    return _cached_program(_slicer_cache, spec, build)


def _get_byte_slicer(spec):
    """One jitted program that carves typed views out of RAW-BYTE chunks.

    The cross-dtype variant of :func:`_get_multi_slicer`: fields of every
    numeric dtype ride ONE uint8 chunk (byte offsets, host-side pack is a
    raw memcpy either way) and are re-typed device-side with
    ``lax.bitcast_convert_type`` — so the whole batch costs ONE transfer +
    ONE dispatch regardless of its dtype mix. On the remote-attach tunnel
    each round trip costs ~20 ms (docs/performance.md round 5a); a 4-dtype
    batch saves 3 of them per batch vs per-dtype chunks.

    ``spec`` = ``(chunk_specs, zero_specs)``; ``chunk_specs`` is a tuple per
    chunk of ``(start_byte, dtype_str, shape)`` triples.
    """

    def build():
        import jax
        import jax.numpy as jnp

        chunk_specs, zero_specs = spec

        def slicer(*chunks):
            outs = []
            for chunk, cs in zip(chunks, chunk_specs):
                for off, dt_str, shape in cs:
                    dt = np.dtype(dt_str)
                    n = int(np.prod(shape, dtype=np.int64))
                    raw = jax.lax.slice_in_dim(chunk, off, off + n * dt.itemsize)
                    if dt == np.uint8:
                        outs.append(raw.reshape(shape))
                    else:
                        arr = jax.lax.bitcast_convert_type(
                            raw.reshape(n, dt.itemsize), jnp.dtype(dt_str)
                        )
                        outs.append(arr.reshape(shape))
            for dt, shape in zero_specs:
                outs.append(jnp.zeros(shape, dt))
            return tuple(outs)

        return jax.jit(slicer)

    return _cached_program(_slicer_cache, ("bytes", spec), build)


def _get_background_pool() -> ThreadPoolExecutor:
    global _background_pool
    with _pool_lock:
        if _background_pool is None:
            # reference: global 4-worker CopyThreadPool (:288-356)
            _background_pool = ThreadPoolExecutor(
                max_workers=4, thread_name_prefix="accvlab-hostcopy"
            )
    return _background_pool


def _is_packable_array(x) -> bool:
    if isinstance(x, (str, bytes)):
        return False  # opaque (reference passes non-tensor leaves through)
    if isinstance(x, np.ndarray):
        return x.dtype.kind in "biufc"
    return isinstance(x, (int, float, bool, np.number, np.bool_))


class AsyncCopyHandle:
    """Handle for an in-flight copy (parity:
    ``async_copy.py:27`` / C++ ``AsyncCopyHandle``, ``:945-1049``)."""

    def __init__(self, future: Future):
        self._future = future
        self._result = None
        self._done = False

    def ready(self) -> bool:
        """Non-blocking completion check: host-side work finished AND all
        device buffers materialized."""
        if self._done:
            return True
        if not self._future.done():
            return False
        import jax

        result, device_arrays = self._future.result()
        for arr in device_arrays:
            if hasattr(arr, "is_ready") and not arr.is_ready():
                return False
        self._result = result
        self._done = True
        return True

    def get(self) -> Any:
        """Block until complete and return the copied structure (same nesting
        as the input; array leaves are device arrays, opaque leaves pass
        through unchanged)."""
        import jax

        result, device_arrays = self._future.result()
        for arr in device_arrays:
            jax.block_until_ready(arr)
        self._result = result
        self._done = True
        return result


def _get_d2h_packer(spec):
    """One jitted program that lays same-dtype device arrays into a single
    flat buffer — the D2H mirror of the pack planner: one transfer for many
    small arrays instead of one ``device_get`` each. ``spec`` is a hashable
    tuple of ``(num_elems, aligned_elems)`` pairs (dtype disambiguated by the
    arrays); each array is padded to its aligned slot, mirroring the H2D
    ``layout_packed_offsets`` alignment (LRU-bounded like the chunk slicer)."""

    def build():
        import jax
        import jax.numpy as jnp

        def packer(*arrs):
            return jnp.concatenate(
                [
                    jnp.pad(a.reshape(-1), (0, pad - n)) if pad != n else a.reshape(-1)
                    for a, (n, pad) in zip(arrs, spec)
                ]
            )

        return jax.jit(packer)

    return _cached_program(_d2h_packer_cache, spec, build)


def _plan_and_copy_d2h(
    leaves: List[Any],
    pack_cpu_tensors: bool,
    min_packed_alignment_bytes: int,
    max_packed_chunk_bytes: int,
):
    """Device->host plan (parity: the reference's D2H rows of
    ``test_multi_tensor_copier.py:35-361``; target ``torch.device("cpu")``).

    jax.Array leaves come back as numpy arrays; host leaves pass through
    unchanged (they are already on the host, like the reference's CPU
    tensors). Small single-shard device arrays are packed per (dtype, device)
    into one on-device concatenation + ONE ``device_get``, then returned as
    zero-copy numpy views into the transferred chunk. Mirrors the H2D side's
    alignment buckets and chunk splitting symmetrically.
    """
    import jax

    out: List[Any] = [None] * len(leaves)
    pack_groups = {}  # (dtype, device) -> list of (leaf_index, jax.Array)

    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            shards = getattr(leaf, "devices", lambda: set())()
            single = len(shards) == 1
            if (
                pack_cpu_tensors
                and single
                and 0 < leaf.nbytes <= _PACK_CANDIDATE_MAX_BYTES
            ):
                key = (leaf.dtype, next(iter(shards)))
                pack_groups.setdefault(key, []).append((i, leaf))
            else:
                out[i] = np.asarray(jax.device_get(leaf))
            continue
        out[i] = leaf  # numpy/scalars/opaque: already host-resident

    for (dtype, _dev), items in pack_groups.items():
        itemsize = np.dtype(dtype).itemsize
        align_items = max(1, min_packed_alignment_bytes // itemsize)
        chunk: List = []
        chunk_elems = 0

        def flush(chunk):
            if not chunk:
                return
            if len(chunk) == 1:
                i, arr = chunk[0]
                out[i] = np.asarray(jax.device_get(arr))
                return
            arrays = [a for _, a in chunk]
            spec = tuple(
                (a.size, -(-a.size // align_items) * align_items) for a in arrays
            )
            flat = _get_d2h_packer(spec)(*arrays)
            host = np.asarray(jax.device_get(flat))
            pos = 0
            for (leaf_i, arr), (n, pad) in zip(chunk, spec):
                out[leaf_i] = host[pos : pos + n].reshape(arr.shape)
                pos += pad

        for leaf_i, arr in items:
            n_aligned = -(-arr.size // align_items) * align_items
            if chunk and (chunk_elems + n_aligned) * itemsize > max_packed_chunk_bytes:
                flush(chunk)
                chunk, chunk_elems = [], 0
            chunk.append((leaf_i, arr))
            chunk_elems += n_aligned
        flush(chunk)

    return out, []


def _plan_and_copy(
    leaves: List[Any],
    device,
    pack_cpu_tensors: bool,
    min_packed_alignment_bytes: int,
    max_packed_chunk_bytes: int,
    pack_candidate_max_bytes: Optional[int] = None,
    merge_dtype_chunks: bool = False,
):
    import jax
    import jax.numpy as jnp

    if isinstance(device, str) and device.lower() in ("cpu", "host"):
        return _plan_and_copy_d2h(
            leaves, pack_cpu_tensors, min_packed_alignment_bytes,
            max_packed_chunk_bytes,
        )

    pmax = (
        _PACK_CANDIDATE_MAX_BYTES
        if pack_candidate_max_bytes is None
        else pack_candidate_max_bytes
    )
    merge = merge_dtype_chunks
    out: List[Any] = [None] * len(leaves)
    device_arrays: List[Any] = []

    # Note: 64-bit float/int leaves are canonicalized to 32-bit on device
    # unless jax_enable_x64 is set (JAX-wide behavior).
    def canonical(arr: np.ndarray) -> np.ndarray:
        target = jnp.result_type(arr.dtype)
        return arr.astype(target) if np.dtype(target) != arr.dtype else arr

    # classify leaves
    pack_groups = {}  # dtype (or the "" merged-bytes group) -> [(idx, arr)]
    zero_leaves = []  # (leaf_index, dtype, shape): no bytes — carved as
    # constants by the slicer program instead of one device_put each (the
    # DCT wire ships ~28 empty exception fields per batch; each empty put
    # still pays a full dispatch round trip on a remote-attach tunnel)
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            arr = jax.device_put(leaf, device) if device is not None else leaf
            out[i] = arr
            device_arrays.append(arr)
            continue
        if _is_packable_array(leaf):
            arr = canonical(np.asarray(leaf))
            if arr.ndim > 0 and not arr.flags["C_CONTIGUOUS"]:
                arr = np.ascontiguousarray(arr)
            if arr.nbytes == 0 and pack_cpu_tensors:
                zero_leaves.append((i, arr.dtype, arr.shape))
                continue
            if pack_cpu_tensors and 0 < arr.nbytes <= pmax:
                # merged mode: every int/uint/float field rides the single
                # raw-byte group (device-side bitcast re-types); bool and
                # complex keep per-dtype chunks (no clean bitcast)
                key = "" if merge and arr.dtype.kind in "iuf" else arr.dtype
                pack_groups.setdefault(key, []).append((i, arr))
                continue
            dev_arr = jax.device_put(arr, device)
            out[i] = dev_arr
            device_arrays.append(dev_arr)
            continue
        out[i] = leaf  # opaque pass-through (reference: :120-138)

    # pack per group, split into chunks of max_packed_chunk_bytes; ALL
    # chunks then feed ONE combined slicer program so the whole packed
    # batch costs len(chunks) transfers + 1 device dispatch. The merged
    # "" group packs every numeric dtype into raw-byte chunks (re-typed
    # device-side); per-dtype groups remain for bool/complex and for the
    # non-merged (reference-parity) mode.
    chunks = []  # (dtype, staging_np, specs[(leaf_i, start_elem, n, shape)])
    byte_chunks = []  # (staging_np, specs[(leaf_i, start_byte, dtype_str, shape)])
    byte_items = pack_groups.pop("", None)
    if byte_items is not None:
        # byte alignment that honors every numeric itemsize (<= 16)
        balign = max(1, min_packed_alignment_bytes)
        chunk: List = []
        chunk_bytes = 0

        def bflush(chunk):
            if not chunk:
                return
            offsets = []
            pos = 0
            for _, arr in chunk:
                offsets.append(pos)
                pos += -(-arr.nbytes // balign) * balign
            staging = parallel_pack([a for _, a in chunk], offsets, pos)
            specs = tuple(
                (leaf_i, off, str(arr.dtype), arr.shape)
                for (leaf_i, arr), off in zip(chunk, offsets)
            )
            byte_chunks.append((staging, specs))

        for leaf_i, arr in byte_items:
            n_aligned = -(-arr.nbytes // balign) * balign
            if chunk and chunk_bytes + n_aligned > max_packed_chunk_bytes:
                bflush(chunk)
                chunk, chunk_bytes = [], 0
            chunk.append((leaf_i, arr))
            chunk_bytes += n_aligned
        bflush(chunk)

    for dtype, items in pack_groups.items():
        itemsize = np.dtype(dtype).itemsize
        align_items = max(1, min_packed_alignment_bytes // itemsize)
        chunk: List = []
        chunk_elems = 0

        def flush(chunk, chunk_elems):
            if not chunk:
                return
            offsets_bytes = []
            pos = 0
            for _, arr in chunk:
                offsets_bytes.append(pos * itemsize)
                n = arr.size
                pos += -(-n // align_items) * align_items  # align up in elements
            total_bytes = pos * itemsize
            arrays = [arr for _, arr in chunk]
            staging = parallel_pack(arrays, offsets_bytes, total_bytes)
            specs = tuple(
                (leaf_i, off // itemsize, arr.size, arr.shape)
                for (leaf_i, arr), off in zip(chunk, offsets_bytes)
            )
            chunks.append((dtype, staging, specs))

        for leaf_i, arr in items:
            n_aligned = -(-arr.size // align_items) * align_items
            if chunk and (chunk_elems + n_aligned) * itemsize > max_packed_chunk_bytes:
                flush(chunk, chunk_elems)
                chunk, chunk_elems = [], 0
            chunk.append((leaf_i, arr))
            chunk_elems += n_aligned
        flush(chunk, chunk_elems)

    # zero-size leaves ride whichever slicer program runs (byte slicer
    # preferred — in merged mode it is usually the ONLY dispatch)
    zeros_spec = tuple((str(dt), shape) for _, dt, shape in zero_leaves)
    zeros_assigned = False

    if byte_chunks:
        dev_bchunks = [jax.device_put(staging, device) for staging, _ in byte_chunks]
        device_arrays.extend(dev_bchunks)
        key = (
            tuple(
                tuple((off, dt, shape) for _, off, dt, shape in specs)
                for _, specs in byte_chunks
            ),
            zeros_spec,
        )
        views = _get_byte_slicer(key)(*dev_bchunks)
        leaf_order = [
            leaf_i for _, specs in byte_chunks for leaf_i, _, _, _ in specs
        ] + [leaf_i for leaf_i, _, _ in zero_leaves]
        for leaf_i, view in zip(leaf_order, views):
            out[leaf_i] = view
        zeros_assigned = True

    if chunks:
        dev_chunks = [
            jax.device_put(staging.view(dtype), device)
            for dtype, staging, _ in chunks
        ]
        device_arrays.extend(dev_chunks)
        slicer_key = (
            tuple(
                tuple((s, n, shape) for _, s, n, shape in specs)
                for _, _, specs in chunks
            ),
            () if zeros_assigned else zeros_spec,
        )
        views = _get_multi_slicer(slicer_key)(*dev_chunks)
        leaf_order = [
            leaf_i for _, _, specs in chunks for leaf_i, _, _, _ in specs
        ] + ([] if zeros_assigned else [leaf_i for leaf_i, _, _ in zero_leaves])
        for leaf_i, view in zip(leaf_order, views):
            out[leaf_i] = view
        zeros_assigned = True

    if zero_leaves and not zeros_assigned:
        # no packed payload to ride along with: place the empties directly
        # (rare — a tree whose packable leaves are ALL empty)
        for leaf_i, dt, shape in zero_leaves:
            dev_arr = jax.device_put(np.zeros(shape, dt), device)
            out[leaf_i] = dev_arr
            device_arrays.append(dev_arr)

    return out, device_arrays


def start_copy(
    data: Any,
    device=None,
    use_pinned_staging: bool = True,
    pack_cpu_tensors: bool = True,
    min_packed_alignment_bytes: int = 16,
    max_packed_chunk_bytes: int = _DEFAULT_MAX_CHUNK,
    use_background_thread: bool = True,
    pack_candidate_max_bytes: Optional[int] = None,
    merge_dtype_chunks: bool = False,
) -> AsyncCopyHandle:
    """Start an asynchronous packed copy of a nested structure to a device.

    Parity: ``async_copy.py:64``. ``data`` may be any nesting of
    dict/list/tuple with numpy arrays / scalars / jax arrays as leaves;
    non-array leaves pass through unchanged. ``use_pinned_staging`` is
    accepted for API parity (JAX's transfer path manages pinning itself).

    Directions (matching the reference's matrix,
    ``test_multi_tensor_copier.py:35-361``):

    * H2D (default): host leaves are packed and transferred; jax.Array
      leaves — including mixed-source-device trees — are moved to ``device``.
    * D2H: pass ``device="cpu"`` — jax.Array leaves come back as numpy
      (small same-dtype arrays are packed into one on-device concat + one
      transfer); host leaves pass through unchanged.

    ``pack_candidate_max_bytes`` bounds which host arrays are packed into
    chunks (default 256 KB, the reference's ``make_pack_candidate``
    threshold, ``multi_tensor_copier.cpp:481``); larger arrays transfer
    individually. On transports where the per-transfer round trip dominates
    (the remote-attach tunnel), pass a large value so EVERY array rides a
    chunk — the whole tree then costs one transfer per (dtype, 32 MB chunk)
    plus a single view-carving dispatch. ``merge_dtype_chunks=True`` goes
    further: every int/uint/float field rides a single RAW-BYTE chunk and
    is re-typed device-side (``lax.bitcast_convert_type``), so a mixed
    batch costs ONE transfer + ONE dispatch total.

    Returns an :class:`AsyncCopyHandle` with ``ready()`` / ``get()``.
    """
    import jax

    del use_pinned_staging
    leaves, treedef = jax.tree_util.tree_flatten(
        data, is_leaf=lambda x: not isinstance(x, (dict, list, tuple))
    )

    def run():
        out, device_arrays = _plan_and_copy(
            leaves,
            device,
            pack_cpu_tensors,
            min_packed_alignment_bytes,
            max_packed_chunk_bytes,
            pack_candidate_max_bytes,
            merge_dtype_chunks,
        )
        return jax.tree_util.tree_unflatten(treedef, out), device_arrays

    if use_background_thread:
        future = _get_background_pool().submit(run)
    else:
        future: Future = Future()
        try:
            future.set_result(run())
        except Exception as e:  # pragma: no cover
            future.set_exception(e)
    return AsyncCopyHandle(future)
