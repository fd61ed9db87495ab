"""Masked reductions and batch assembly helpers (TPU-native).

Re-design of
``packages/batching_helpers/accvlab/batching_helpers/batched_processing_py.py``.
Reductions are fused XLA element-wise + reduce ops; batch assembly
(``combine_data``) is host-side padding into the static-shape
:class:`RaggedBatch` layout.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .bool_indexing import batched_bool_indexing, compact_by_mask
from .ragged_batch import SIZE_DTYPE, Array, RaggedBatch


def average_over_targets(data: RaggedBatch, nans_to_zero: bool = True) -> Array:
    """Mean along the non-uniform dimension over valid entries only.

    Parity: ``batched_processing_py.py:23-51`` (incl. the NaN/Inf -> 0
    replacement for empty samples).
    """
    masked = data.with_padded_set_to(0.0)
    summed = jnp.sum(masked.tensor, axis=data.non_uniform_dim)
    sizes = data.sample_sizes.astype(summed.dtype)
    # After the reduce, the batch dims are still leading; broadcast sizes
    # against any remaining data dims.
    sizes = sizes.reshape(sizes.shape + (1,) * (summed.ndim - sizes.ndim))
    res = summed / sizes
    if nans_to_zero:
        res = jnp.nan_to_num(res, nan=0.0, posinf=0.0, neginf=0.0)
    return res


def sum_over_targets(data: RaggedBatch) -> Array:
    """Sum along the non-uniform dimension over valid entries only.

    Parity: ``batched_processing_py.py:54-68``.
    """
    masked = data.with_padded_set_to(0.0)
    return jnp.sum(masked.tensor, axis=data.non_uniform_dim)


def apply_mask_to_tensor(data: Array, mask: Array, value_to_set: float = 0.0) -> Array:
    """Set entries where ``mask`` is False to ``value_to_set``; the mask may
    have fewer (leading-aligned) dims than the data.

    Parity: ``batched_processing_py.py:70-100``.
    """
    data = jnp.asarray(data)
    mask = jnp.asarray(mask)
    num_extra = data.ndim - mask.ndim
    if num_extra > 0:
        mask = mask.reshape(mask.shape + (1,) * num_extra)
    if mask.size == 0:
        return data
    return jnp.where(mask, data, jnp.asarray(value_to_set, dtype=data.dtype))


def squeeze_except_batch_and_sample(
    data: Union[Array, RaggedBatch],
) -> Union[Array, RaggedBatch]:
    """Squeeze all size-1 dims except batch dims and the non-uniform dim.

    Parity: ``batched_processing_py.py:103-176`` (the non-uniform dim index is
    adjusted for dims squeezed away before it).
    """
    if isinstance(data, RaggedBatch):
        nbd, nud = data.num_batch_dims, data.non_uniform_dim
        shape = data.shape
        dims_to_squeeze = tuple(
            d
            for d in list(range(nbd, nud)) + list(range(nud + 1, len(shape)))
            if shape[d] == 1
        )
        if not dims_to_squeeze:
            return data
        squeezed = jnp.squeeze(data.tensor, dims_to_squeeze)
        num_before = sum(1 for d in dims_to_squeeze if d < nud)
        return data.create_with_sample_sizes_like_self(squeezed, nud - num_before)
    dims = tuple(d for d in range(2, data.ndim) if data.shape[d] == 1)
    return jnp.squeeze(data, dims) if dims else data


def get_compact_lists(
    mask: Array,
    data: Sequence[Union[Array, Any]],
    max_num_vals: Optional[int] = None,
) -> List[Union[RaggedBatch, Any]]:
    """Compact each tensor in ``data`` along ``dim==1`` per the 2-D ``mask``.

    Parity: ``batched_processing_py.py:200-272``. Non-array elements pass
    through unchanged; array outputs are :class:`RaggedBatch` instances
    sharing one mask / sample-sizes pair.

    Note:
        ``max_num_vals`` is the static output bound for jitted use; without it
        the true maximum is computed on the host (like the reference).
    """
    mask = jnp.asarray(mask).astype(jnp.bool_)
    assert mask.ndim == 2, "Only 2D masks (batch_size, num_elements) are supported"
    num_vals = jnp.sum(mask, axis=1, dtype=SIZE_DTYPE)
    if max_num_vals is None:
        max_num_vals = int(jnp.max(num_vals)) if num_vals.size else 0  # host sync

    out_mask = jnp.arange(max_num_vals, dtype=SIZE_DTYPE) < num_vals[:, None]
    res: List[Any] = []
    for el in data:
        if isinstance(el, (jax.Array, np.ndarray)) and not np.isscalar(el):
            el = jnp.asarray(el)
            if el.ndim < 2:
                el = el[:, None]
            compacted, _ = compact_by_mask(el, mask, max_num_vals)
            res.append(RaggedBatch(compacted, out_mask, num_vals))
        else:
            res.append(el)
    return res


def get_compact_from_named_tuple(
    mask: Array, data: NamedTuple, max_num_vals: Optional[int] = None
) -> NamedTuple:
    """:func:`get_compact_lists` over a NamedTuple. Parity: ``batched_processing_py.py:177``."""
    res_list = get_compact_lists(mask, tuple(data), max_num_vals)
    return type(data)(*res_list)


def get_indices_from_mask(
    mask: Union[Array, RaggedBatch], max_output_size: Optional[int] = None
) -> RaggedBatch:
    """Per-sample indices of True mask entries (ascending), as a RaggedBatch.

    Parity: ``batched_processing_py.py:577-628``.
    """
    if isinstance(mask, RaggedBatch):
        assert mask.num_batch_dims == 1, (
            "Only RaggedBatch instances with a single batch dimension are supported"
        )
        mask = mask.with_padded_set_to(False).tensor
    mask = jnp.asarray(mask)
    assert mask.ndim == 2, "Only 2D masks (batch_size, num_elements) are supported"
    batch_size, num_elements = mask.shape
    indices_all = jnp.broadcast_to(
        jnp.arange(num_elements, dtype=SIZE_DTYPE)[None, :], (batch_size, num_elements)
    )
    return batched_bool_indexing(indices_all, mask, max_output_size)


# ---------------------------------------------------------------------- #
# combine_data (host-side batch assembly)                                #
# ---------------------------------------------------------------------- #


def _is_arraylike(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


def combine_data(
    data_list: Sequence[Union[Sequence, Array]],
    other_with_same_sample_sizes: Optional[RaggedBatch] = None,
    device=None,
    flatten_batch_dims: bool = True,
) -> RaggedBatch:
    """Combine a (nested) sequence of per-sample arrays into one RaggedBatch.

    Parity: ``batched_processing_py.py:275-574``. ``flatten_batch_dims=True``
    flattens nesting depth-first into one batch dim; ``False`` preserves
    nesting levels as (uniform-size) batch dims. Host-side (builds the padded
    layout with numpy, then uploads once).
    """
    assert isinstance(data_list, Sequence), "`data_list` must be a sequence"
    assert len(data_list) > 0, "`data_list` must not be empty"
    reuse = other_with_same_sample_sizes is not None

    def _put(rb: RaggedBatch) -> RaggedBatch:
        return rb.to_device(device) if device is not None else rb

    if flatten_batch_dims:
        flat: List[np.ndarray] = []

        def _flatten(d):
            if _is_arraylike(d):
                flat.append(np.asarray(d))
            elif isinstance(d, Sequence) and not isinstance(d, str):
                for el in d:
                    _flatten(el)
            else:
                raise AssertionError(
                    "The data to combine must be an array or a (nested) sequence of arrays. "
                    f"Got {type(d)}."
                )

        _flatten(data_list)
        num_flat = len(flat)
        max_numel = max((el.shape[0] for el in flat), default=0)
        sample = next((el for el in flat if el.size > 0), flat[0] if flat else None)
        if sample is None:
            return _put(RaggedBatch.Empty(2, 1))

        data = np.zeros((num_flat, max_numel, *sample.shape[1:]), dtype=sample.dtype)
        sizes = np.zeros((num_flat,), dtype=np.int32)
        for i, el in enumerate(flat):
            size = min(el.shape[0], el.size)
            sizes[i] = size
            if size > 0:
                data[i, :size, ...] = el
        if reuse:
            assert num_flat == other_with_same_sample_sizes.sample_sizes.shape[0], (
                "Number of samples does not match `other_with_same_sample_sizes`"
            )
            assert (num_flat, max_numel) == tuple(other_with_same_sample_sizes.mask.shape), (
                "Needed mask dimension does not match `other_with_same_sample_sizes`"
            )
            return other_with_same_sample_sizes.create_with_sample_sizes_like_self(
                jnp.asarray(data), 1, device
            )
        return _put(RaggedBatch(jnp.asarray(data), sample_sizes=jnp.asarray(sizes)))

    # Nested mode: nesting levels become batch dims.
    def _get_batch_shape(d, level=0):
        assert isinstance(d, Sequence) and not isinstance(d, str), "`data` must be a sequence"
        first = d[0]
        if _is_arraylike(first):
            for item in d[1:]:
                if not _is_arraylike(item):
                    raise AssertionError(
                        f"Got {type(item)} contained in the sequence at level {level}."
                    )
            return [len(d)]
        sub = _get_batch_shape(first, level + 1)
        for item in d[1:]:
            if not isinstance(item, Sequence) or isinstance(item, str):
                raise AssertionError(
                    f"Got {type(item)} contained in the sequence at level {level + 1}."
                )
            if _get_batch_shape(item, level + 1) != sub:
                raise AssertionError(f"Inconsistent sequence length structure at level {level + 1}.")
        return [len(d)] + sub

    def _first_element(d):
        return d if _is_arraylike(d) else _first_element(d[0])

    def _max_numel(d):
        if _is_arraylike(d):
            return d.shape[0]
        return max((_max_numel(el) for el in d), default=0)

    batch_shape = tuple(_get_batch_shape(data_list))
    nbd = len(batch_shape)
    if reuse:
        max_numel = other_with_same_sample_sizes.mask.shape[-1]
    else:
        max_numel = _max_numel(data_list)
    sample = _first_element(data_list)
    sample = np.asarray(sample)

    if sample.size == 0 and max_numel == 0:
        data = np.zeros((*batch_shape, 0), dtype=np.float32)
        mask = np.zeros((*batch_shape, 0), dtype=bool)
        sizes = np.zeros(batch_shape, dtype=np.int32)
        return _put(RaggedBatch(jnp.asarray(data), jnp.asarray(mask), jnp.asarray(sizes), nbd))

    data = np.zeros((*batch_shape, max_numel, *sample.shape[1:]), dtype=sample.dtype)
    sizes = np.zeros(batch_shape, dtype=np.int32)

    def _fill(d, batch_idx=()):
        if _is_arraylike(d):
            d = np.asarray(d)
            size = min(d.shape[0], d.size)
            if size > 0:
                data[batch_idx + (slice(0, size), Ellipsis)] = d
            sizes[batch_idx] = size
        else:
            for i, el in enumerate(d):
                _fill(el, batch_idx + (i,))

    _fill(data_list)
    if reuse:
        assert tuple(other_with_same_sample_sizes.sample_sizes.shape) == batch_shape, (
            "Sample sizes shape does not match required batch shape"
        )
        return other_with_same_sample_sizes.create_with_sample_sizes_like_self(
            jnp.asarray(data), nbd, device
        )
    return _put(RaggedBatch(jnp.asarray(data), sample_sizes=jnp.asarray(sizes), non_uniform_dim=nbd))
