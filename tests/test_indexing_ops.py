"""Indexing-op tests (model: reference tests/test_batched_indexing_ops.py,
test_batched_index_mapping_ops.py, test_batched_boolean_indexing.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accvlab_tpu.ragged import (
    RaggedBatch,
    batched_bool_indexing,
    batched_bool_indexing_write,
    batched_index_mapping,
    batched_indexing_access,
    batched_indexing_write,
    batched_inverse_indexing_access,
    get_indices_from_mask,
    get_mask_from_indices,
)


def idx_rb(indices, sizes):
    return RaggedBatch(jnp.asarray(indices, jnp.int32), sample_sizes=jnp.asarray(sizes, jnp.int32))


# ----------------------------- gather ---------------------------------- #


def test_indexing_access_basic():
    data = jnp.array([[10.0, 11.0, 12.0], [20.0, 21.0, 22.0]])
    indices = idx_rb([[2, 0], [1, 0]], [2, 1])
    out = batched_indexing_access(data, indices, filler_value=-5.0)
    expected = np.array([[12.0, 10.0], [21.0, -5.0]])
    np.testing.assert_array_equal(np.asarray(out.tensor), expected)
    np.testing.assert_array_equal(np.asarray(out.sample_sizes), [2, 1])


def test_indexing_access_negative_indices():
    data = jnp.array([[10.0, 11.0, 12.0]])
    indices = idx_rb([[-1, -3]], [2])
    out = batched_indexing_access(data, indices)
    np.testing.assert_array_equal(np.asarray(out.tensor), [[12.0, 10.0]])


def test_indexing_access_inner_dims():
    data = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    indices = idx_rb([[1, 2], [0, 0]], [2, 1])
    out = batched_indexing_access(data, indices)
    np.testing.assert_array_equal(np.asarray(out.tensor[0, 0]), np.asarray(data[0, 1]))
    np.testing.assert_array_equal(np.asarray(out.tensor[0, 1]), np.asarray(data[0, 2]))
    np.testing.assert_array_equal(np.asarray(out.tensor[1, 1]), np.zeros(4))


def test_indexing_access_ragged_input():
    data = RaggedBatch(
        jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]), sample_sizes=jnp.array([3, 2])
    )
    indices = idx_rb([[0, 2], [1, 0]], [2, 2])
    out = batched_indexing_access(data, indices)
    np.testing.assert_array_equal(np.asarray(out.tensor), [[1.0, 3.0], [5.0, 4.0]])


def test_indexing_access_multi_batch_dims():
    data = jnp.arange(2 * 2 * 3, dtype=jnp.float32).reshape(2, 2, 3)
    indices = RaggedBatch(
        jnp.array([[[0, 2], [1, 0]], [[2, 1], [0, 0]]], dtype=jnp.int32),
        sample_sizes=jnp.array([[2, 1], [2, 2]], dtype=jnp.int32),
    )
    out = batched_indexing_access(data, indices)
    arr = np.asarray(out.tensor)
    ref = np.asarray(data)
    assert arr[0, 0, 0] == ref[0, 0, 0] and arr[0, 0, 1] == ref[0, 0, 2]
    assert arr[0, 1, 0] == ref[0, 1, 1] and arr[0, 1, 1] == 0.0
    assert arr[1, 0, 0] == ref[1, 0, 2]


def test_indexing_access_grad_accumulates_duplicates():
    data = jnp.array([[1.0, 2.0, 3.0]])
    indices = idx_rb([[1, 1, 0]], [3])

    def loss(d):
        return jnp.sum(batched_indexing_access(d, indices).tensor)

    g = jax.grad(loss)(data)
    np.testing.assert_array_equal(np.asarray(g), [[1.0, 2.0, 0.0]])


def test_indexing_access_grad_zero_in_padding():
    data = jnp.array([[1.0, 2.0, 3.0]])
    indices = idx_rb([[2, 1]], [1])  # second index padded

    def loss(d):
        return jnp.sum(batched_indexing_access(d, indices).tensor)

    g = jax.grad(loss)(data)
    np.testing.assert_array_equal(np.asarray(g), [[0.0, 0.0, 1.0]])


def test_indexing_access_dim_to_index_in():
    data = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    indices = idx_rb([[2, 0], [1, 1]], [2, 2])
    out = batched_indexing_access(data, indices, dim_to_index_in=2)
    assert out.tensor.shape == (2, 4, 2)
    np.testing.assert_array_equal(np.asarray(out.tensor[0, :, 0]), np.asarray(data[0, :, 2]))


# ----------------------------- scatter --------------------------------- #


def test_inverse_indexing_access():
    values = jnp.array([[1.0, 2.0], [3.0, 0.0]])
    indices = idx_rb([[2, 0], [1, 0]], [2, 1])
    out = batched_inverse_indexing_access(values, indices, output_num_targets=4, filler_value=-1.0)
    expected = np.array([[2.0, -1.0, 1.0, -1.0], [-1.0, 3.0, -1.0, -1.0]])
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_inverse_indexing_access_grad():
    values = jnp.array([[1.0, 2.0]])
    indices = idx_rb([[2, 0]], [2])

    def loss(v):
        out = batched_inverse_indexing_access(v, indices, output_num_targets=4)
        return jnp.sum(out * jnp.array([[1.0, 10.0, 100.0, 1000.0]]))

    g = jax.grad(loss)(values)
    np.testing.assert_array_equal(np.asarray(g), [[100.0, 1.0]])


def test_indexing_write():
    to_write = jnp.array([[5.0, 6.0]])
    indices = idx_rb([[1, 3]], [2])
    into = jnp.zeros((1, 4)) + 7.0
    out = batched_indexing_write(to_write, indices, into)
    np.testing.assert_array_equal(np.asarray(out), [[7.0, 5.0, 7.0, 6.0]])


def test_indexing_write_partial_validity():
    to_write = jnp.array([[5.0, 6.0]])
    indices = idx_rb([[1, 3]], [1])  # only first valid
    into = jnp.zeros((1, 4))
    out = batched_indexing_write(to_write, indices, into)
    np.testing.assert_array_equal(np.asarray(out), [[0.0, 5.0, 0.0, 0.0]])


def test_indexing_write_grads():
    to_write = jnp.array([[5.0, 6.0]])
    indices = idx_rb([[1, 3]], [2])
    into = jnp.arange(4, dtype=jnp.float32)[None]

    def loss(w, t):
        return jnp.sum(batched_indexing_write(w, indices, t) * jnp.arange(1.0, 5.0))

    gw, gt = jax.grad(loss, argnums=(0, 1))(to_write, into)
    np.testing.assert_array_equal(np.asarray(gw), [[2.0, 4.0]])
    # written positions zeroed in the into-grad (reference backward_insert_const)
    np.testing.assert_array_equal(np.asarray(gt), [[1.0, 0.0, 3.0, 0.0]])


def test_indexing_write_ragged_output():
    into = RaggedBatch(jnp.zeros((1, 4)), sample_sizes=jnp.array([4]))
    to_write = jnp.array([[5.0, 6.0]])
    indices = idx_rb([[0, 2]], [2])
    out = batched_indexing_write(to_write, indices, into)
    assert isinstance(out, RaggedBatch)
    np.testing.assert_array_equal(np.asarray(out.tensor), [[5.0, 0.0, 6.0, 0.0]])


# --------------------------- index mapping ----------------------------- #


def test_batched_index_mapping():
    source = jnp.array([[10.0, 11.0, 12.0], [20.0, 21.0, 22.0]])
    target = jnp.zeros((2, 4)) - 1.0
    src_idx = idx_rb([[0, 2], [1, 0]], [2, 1])
    tgt_idx = idx_rb([[3, 1], [0, 0]], [2, 1])
    out = batched_index_mapping(source, src_idx, tgt_idx, target)
    expected = np.array([[-1.0, 12.0, -1.0, 10.0], [21.0, -1.0, -1.0, -1.0]])
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_batched_index_mapping_grad():
    source = jnp.array([[10.0, 11.0, 12.0]])
    target = jnp.zeros((1, 4))
    src_idx = idx_rb([[0, 2]], [2])
    tgt_idx = idx_rb([[3, 1]], [2])

    def loss(s, t):
        out = batched_index_mapping(s, src_idx, tgt_idx, t)
        return jnp.sum(out * jnp.arange(1.0, 5.0))

    gs, gt = jax.grad(loss, argnums=(0, 1))(source, target)
    np.testing.assert_array_equal(np.asarray(gs), [[4.0, 0.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(gt), [[1.0, 0.0, 3.0, 0.0]])


def test_batched_index_mapping_ragged():
    source = RaggedBatch(jnp.array([[1.0, 2.0, 3.0]]), sample_sizes=jnp.array([3]))
    target = RaggedBatch(jnp.zeros((1, 5)), sample_sizes=jnp.array([5]))
    src_idx = idx_rb([[2, 0]], [2])
    tgt_idx = idx_rb([[0, 4]], [2])
    out = batched_index_mapping(source, src_idx, tgt_idx, target)
    assert isinstance(out, RaggedBatch)
    np.testing.assert_array_equal(np.asarray(out.tensor), [[3.0, 0.0, 0.0, 0.0, 1.0]])


# ------------------------- masks and indices --------------------------- #


def test_get_mask_from_indices():
    indices = idx_rb([[0, 3], [1, 0]], [2, 1])
    mask = get_mask_from_indices(5, indices)
    expected = np.array(
        [[True, False, False, True, False], [False, True, False, False, False]]
    )
    np.testing.assert_array_equal(np.asarray(mask), expected)


def test_get_indices_from_mask():
    mask = jnp.array([[True, False, True, True], [False, False, True, False]])
    out = get_indices_from_mask(mask)
    np.testing.assert_array_equal(np.asarray(out.sample_sizes), [3, 1])
    np.testing.assert_array_equal(np.asarray(out.tensor[0]), [0, 2, 3])
    assert int(out.tensor[1, 0]) == 2


def test_mask_indices_roundtrip():
    mask = jnp.array([[True, False, True], [False, True, True]])
    idx = get_indices_from_mask(mask)
    back = get_mask_from_indices(3, idx)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(mask))


# --------------------------- bool indexing ----------------------------- #


def test_bool_indexing_tensor_tensor():
    data = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    mask = jnp.array([[True, False, True], [False, True, False]])
    out = batched_bool_indexing(data, mask)
    np.testing.assert_array_equal(np.asarray(out.sample_sizes), [2, 1])
    np.testing.assert_array_equal(np.asarray(out.tensor[0]), [1.0, 3.0])
    assert float(out.tensor[1, 0]) == 5.0


def test_bool_indexing_ragged_data():
    data = RaggedBatch(
        jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]), sample_sizes=jnp.array([2, 3])
    )
    mask = jnp.array([[True, True, True], [True, False, True]])  # filler masked out
    out = batched_bool_indexing(data, mask)
    np.testing.assert_array_equal(np.asarray(out.sample_sizes), [2, 2])
    np.testing.assert_array_equal(np.asarray(out.tensor), [[1.0, 2.0], [4.0, 6.0]])


def test_bool_indexing_static_bound_jit():
    data = jnp.array([[1.0, 2.0, 3.0]])
    mask = jnp.array([[True, False, True]])

    @jax.jit
    def f(d, m):
        return batched_bool_indexing(d, m, max_output_size=3).tensor

    np.testing.assert_array_equal(np.asarray(f(data, mask)), [[1.0, 3.0, 0.0]])


def test_bool_indexing_inner_dims():
    data = jnp.arange(2 * 3 * 2, dtype=jnp.float32).reshape(2, 3, 2)
    mask = jnp.array([[False, True, True], [True, False, False]])
    out = batched_bool_indexing(data, mask)
    np.testing.assert_array_equal(np.asarray(out.tensor[0, 0]), np.asarray(data[0, 1]))
    np.testing.assert_array_equal(np.asarray(out.tensor[1, 0]), np.asarray(data[1, 0]))


def test_bool_indexing_write():
    to_write = RaggedBatch(jnp.array([[9.0, 8.0], [7.0, 0.0]]), sample_sizes=jnp.array([2, 1]))
    out_mask = jnp.array([[True, False, True], [False, True, False]])
    into = jnp.zeros((2, 3))
    out = batched_bool_indexing_write(to_write, out_mask, into)
    np.testing.assert_array_equal(
        np.asarray(out), [[9.0, 0.0, 8.0], [0.0, 7.0, 0.0]]
    )


def test_bool_indexing_write_ragged_into():
    to_write = RaggedBatch(jnp.array([[9.0]]), sample_sizes=jnp.array([1]))
    into = RaggedBatch(jnp.array([[1.0, 2.0, 3.0]]), sample_sizes=jnp.array([3]))
    out_mask = jnp.array([[False, True, False]])
    out = batched_bool_indexing_write(to_write, out_mask, into)
    assert isinstance(out, RaggedBatch)
    np.testing.assert_array_equal(np.asarray(out.tensor), [[1.0, 9.0, 3.0]])


def test_bool_indexing_roundtrip():
    data = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    mask = jnp.array([[True, False, True, False]])
    compact = batched_bool_indexing(data, mask)
    restored = batched_bool_indexing_write(compact, mask, jnp.zeros_like(data))
    np.testing.assert_array_equal(np.asarray(restored), [[1.0, 0.0, 3.0, 0.0]])


def test_gather_adjoint_matches_numerical():
    """AD through batched_indexing_access agrees with finite differences."""
    rb = RaggedBatch(
        jnp.arange(12, dtype=jnp.float32).reshape(2, 3, 2),
        sample_sizes=jnp.array([2, 3]),
    )
    idx = rb.create_with_sample_sizes_like_self(
        jnp.array([[1, 0, 0], [2, 1, 0]], dtype=jnp.int32)
    )

    def loss(t):
        r = RaggedBatch(t, rb.mask, rb.sample_sizes)
        out = batched_indexing_access(r, idx)
        return jnp.sum(out.with_padded_set_to(0.0).tensor ** 2)

    g = jax.grad(loss)(rb.tensor)
    eps = 1e-3
    t0 = np.asarray(rb.tensor)
    for (b, s, d) in [(0, 0, 0), (0, 1, 1), (1, 2, 0), (1, 0, 1)]:
        tp = t0.copy(); tp[b, s, d] += eps
        tm = t0.copy(); tm[b, s, d] -= eps
        num = (loss(jnp.asarray(tp)) - loss(jnp.asarray(tm))) / (2 * eps)
        assert float(g[b, s, d]) == pytest.approx(float(num), abs=2e-2)


def test_scatter_write_adjoint_matches_numerical():
    """AD through batched_indexing_write agrees with finite differences in
    the values argument (deterministic scatter on TPU)."""
    target = RaggedBatch(
        jnp.zeros((2, 4, 1), jnp.float32), sample_sizes=jnp.array([3, 4])
    )
    values = RaggedBatch(
        jnp.arange(8, dtype=jnp.float32).reshape(2, 4, 1),
        sample_sizes=jnp.array([2, 3]),
    )
    idx = values.create_with_sample_sizes_like_self(
        jnp.array([[2, 0, 0, 0], [1, 3, 0, 0]], dtype=jnp.int32)
    )

    def loss(vt):
        v = RaggedBatch(vt, values.mask, values.sample_sizes)
        out = batched_indexing_write(v, idx, target)
        return jnp.sum(out.with_padded_set_to(0.0).tensor ** 2)

    g = jax.grad(loss)(values.tensor)
    eps = 1e-3
    v0 = np.asarray(values.tensor)
    for (b, s) in [(0, 0), (0, 1), (1, 0), (1, 2)]:
        vp = v0.copy(); vp[b, s, 0] += eps
        vm = v0.copy(); vm[b, s, 0] -= eps
        num = (loss(jnp.asarray(vp)) - loss(jnp.asarray(vm))) / (2 * eps)
        assert float(g[b, s, 0]) == pytest.approx(float(num), abs=2e-2)
