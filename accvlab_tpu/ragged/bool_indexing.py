"""Batched boolean indexing over ragged batches (TPU-native).

Re-design of ``batching_helpers/accvlab/batching_helpers/batched_bool_indexing.py``.
The reference implements compaction with advanced boolean assignment
(``tensor[mask] = input[input_mask]``, ``batched_bool_indexing.py:216-221``),
which relies on the row-major element pairing of the two masks. On TPU the
same pairing is produced with a stable argsort of the inverted mask (valid
positions first, in original order) followed by an XLA gather/scatter —
static shapes, jittable (when an output bound is supplied), differentiable.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from .ragged_batch import SIZE_DTYPE, Array, RaggedBatch


def _compare_indexed_data_and_mask(data, mask):
    """Shape compatibility checks. Parity: ``batched_bool_indexing.py:21-62``."""
    is_data_ragged = isinstance(data, RaggedBatch)
    is_mask_ragged = isinstance(mask, RaggedBatch)

    if is_data_ragged and is_mask_ragged:
        assert data.num_batch_dims == mask.num_batch_dims, (
            "Data and mask must have the same number of batch dimensions"
        )
        assert data.batch_shape == mask.batch_shape, "Data and mask must have the same batch shape"
        assert data.max_sample_size == mask.max_sample_size, (
            "Data and mask must have the same maximum sample size"
        )
    elif is_data_ragged:
        assert data.num_batch_dims == 1, "Data must have exactly one batch dimension if mask is a tensor"
        assert data.batch_shape[0] == mask.shape[0], "Data and mask must have the same number of samples"
        assert data.max_sample_size == mask.shape[1], (
            "Maximum sample size of data must correspond to `input_mask.shape[1]`"
        )
    elif is_mask_ragged:
        assert mask.num_batch_dims == 1, "Mask must have exactly one batch dimension if data is a tensor"
        assert mask.batch_shape[0] == data.shape[0], "Mask and data must have the same number of samples"
        assert mask.max_sample_size == data.shape[1], (
            "Maximum sample size of mask must correspond to `input_data.shape[1]`"
        )
    else:
        assert data.shape[0] == mask.shape[0], "Data and mask must have the same number of samples"
        assert data.shape[1] == mask.shape[1], "Data and mask must have the same maximum sample size"


def _mask_the_mask(mask, data):
    """Force filler elements to False. Parity: ``batched_bool_indexing.py:64-88``."""
    if isinstance(mask, RaggedBatch):
        return mask.with_padded_set_to(False).tensor
    if isinstance(data, RaggedBatch):
        return jnp.logical_and(mask.astype(jnp.bool_), data.mask)
    return mask.astype(jnp.bool_)


def _valid_positions(mask: Array) -> Array:
    """Per-row positions of True entries, in order, padded at the end.

    ``mask (B, N)`` -> ``(B, N)`` int32 where the first ``count[b]`` entries of
    row ``b`` are the True positions in ascending order.
    """
    return jnp.argsort(jnp.logical_not(mask), axis=1, stable=True).astype(SIZE_DTYPE)


def compact_by_mask(data: Array, mask: Array, max_out: int, fill_value=0.0):
    """Compact the selected rows of ``data (B, N, *D)`` to the front.

    Returns ``(out (B, max_out, *D), counts (B,))`` where
    ``out[b, j] = data[b, p_j]`` with ``p_j`` the j-th True position of
    ``mask[b]``; remaining entries are ``fill_value``.
    """
    counts = jnp.sum(mask, axis=1, dtype=SIZE_DTYPE)
    pos = _valid_positions(mask)[:, :max_out]
    idx = pos.reshape(pos.shape + (1,) * (data.ndim - 2))
    gathered = jnp.take_along_axis(data, idx, axis=1)
    valid = jnp.arange(max_out, dtype=SIZE_DTYPE) < counts[:, None]
    valid = valid.reshape(valid.shape + (1,) * (data.ndim - 2))
    fill = jnp.asarray(fill_value, dtype=data.dtype)
    return jnp.where(valid, gathered, fill), counts


def batched_bool_indexing(
    input_data: Union[RaggedBatch, Array],
    input_mask: Union[RaggedBatch, Array],
    max_output_size: Optional[int] = None,
) -> RaggedBatch:
    """Batched boolean gather: per sample, compact the True-masked entries.

    Parity: ``batched_bool_indexing.py:90-234``. The output is always a
    :class:`RaggedBatch` (the number of selected entries varies per sample).

    Note:
        The output's max sample size is data dependent. Outside ``jit`` it is
        computed on the host (like the reference). Under ``jit`` pass a static
        ``max_output_size`` bound (TPU shapes must be static); semantics are
        invariant to the bound as long as it is >= the true maximum.
    """
    _compare_indexed_data_and_mask(input_data, input_mask)

    is_data_ragged = isinstance(input_data, RaggedBatch)
    mask2d = _mask_the_mask(input_mask, input_data)

    if is_data_ragged:
        orig_nud = input_data.non_uniform_dim
        batch_shape = input_data.batch_shape
        multi_batch = input_data.num_batch_dims > 1
        rb = input_data
        if multi_batch:
            rb = rb.flatten_batch_dims()
            mask2d = mask2d.reshape((-1, mask2d.shape[-1]))
        rb = rb.get_non_uniform_dimension_transposed_to(1)
        data2d = rb.tensor
    else:
        data2d = input_data
        batch_shape = (input_data.shape[0],)
        multi_batch = False

    counts = jnp.sum(mask2d, axis=1, dtype=SIZE_DTYPE)
    if max_output_size is None:
        max_output_size = int(jnp.max(counts)) if counts.size else 0  # host sync

    out, counts = compact_by_mask(data2d, mask2d, max_output_size)
    res = RaggedBatch(out, sample_sizes=counts, non_uniform_dim=1)

    if is_data_ragged:
        if multi_batch:
            res = res.reshape_batch_dims(batch_shape)
        res = res.get_non_uniform_dimension_transposed_to(orig_nud)
    return res


def batched_bool_indexing_write(
    to_write: RaggedBatch,
    output_mask: Union[RaggedBatch, Array],
    to_write_into: Union[RaggedBatch, Array],
) -> Union[RaggedBatch, Array]:
    """Inverse of :func:`batched_bool_indexing`: write the valid entries of
    ``to_write`` to the True positions of ``output_mask`` in ``to_write_into``.

    Parity: ``batched_bool_indexing.py:237-368``. Contract: per sample, the
    number of True entries in ``output_mask`` equals
    ``to_write.sample_sizes``. Fully static shapes — jittable.
    """
    assert isinstance(to_write, RaggedBatch), "to_write must be a RaggedBatch"
    _compare_indexed_data_and_mask(to_write_into, output_mask)

    is_out_ragged = isinstance(to_write_into, RaggedBatch)
    mask2d = _mask_the_mask(output_mask, to_write_into)

    batch_shape = to_write.batch_shape
    multi_batch = to_write.num_batch_dims > 1
    assert to_write.dim() == (
        to_write_into.dim() if is_out_ragged else to_write_into.ndim
    ), "to_write and to_write_into must have the same number of dimensions"

    tw = to_write
    if multi_batch:
        tw = tw.flatten_batch_dims()
        mask2d = mask2d.reshape((-1, mask2d.shape[-1]))
    tw = tw.get_non_uniform_dimension_transposed_to(1)

    if is_out_ragged:
        orig_out_nud = to_write_into.non_uniform_dim
        out_rb = to_write_into
        if multi_batch:
            out_rb = out_rb.flatten_batch_dims()
        out_rb = out_rb.get_non_uniform_dimension_transposed_to(1)
        out2d = out_rb.tensor
    else:
        out2d = to_write_into

    num_write = tw.tensor.shape[1]  # static: to_write's max sample size
    pos = _valid_positions(mask2d)[:, :num_write]
    counts = tw.sample_sizes
    valid = jnp.arange(num_write, dtype=SIZE_DTYPE) < counts[:, None]
    safe_pos = jnp.where(valid, pos, out2d.shape[1])  # dropped if invalid

    res2d = jax.vmap(lambda o, i, v: o.at[i].set(v, mode="drop"))(out2d, safe_pos, tw.tensor)

    if is_out_ragged:
        res = out_rb.create_with_sample_sizes_like_self(res2d, 1)
        if multi_batch:
            res = res.reshape_batch_dims(batch_shape)
        return res.get_non_uniform_dimension_transposed_to(orig_out_nud)
    return res2d
