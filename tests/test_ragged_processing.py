"""Masked-reduction / batch-assembly tests (model: reference batched_processing tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accvlab_tpu.ragged import (
    RaggedBatch,
    apply_mask_to_tensor,
    average_over_targets,
    combine_data,
    get_compact_from_named_tuple,
    get_compact_lists,
    squeeze_except_batch_and_sample,
    sum_over_targets,
)


def test_average_over_targets():
    rb = RaggedBatch(
        jnp.array([[1.0, 2.0, 100.0], [3.0, 4.0, 5.0]]), sample_sizes=jnp.array([2, 3])
    )
    out = average_over_targets(rb)
    np.testing.assert_allclose(np.asarray(out), [1.5, 4.0])


def test_average_over_targets_empty_sample():
    rb = RaggedBatch(jnp.array([[1.0, 2.0], [9.0, 9.0]]), sample_sizes=jnp.array([2, 0]))
    out = average_over_targets(rb)
    np.testing.assert_allclose(np.asarray(out), [1.5, 0.0])  # NaN -> 0


def test_average_over_targets_inner_dims():
    rb = RaggedBatch(
        jnp.arange(2 * 2 * 3, dtype=jnp.float32).reshape(2, 2, 3),
        sample_sizes=jnp.array([1, 2]),
    )
    out = average_over_targets(rb)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(rb.tensor[0, 0]))


def test_sum_over_targets():
    rb = RaggedBatch(
        jnp.array([[1.0, 2.0, 100.0], [3.0, 4.0, 5.0]]), sample_sizes=jnp.array([2, 3])
    )
    np.testing.assert_allclose(np.asarray(sum_over_targets(rb)), [3.0, 12.0])


def test_apply_mask_to_tensor():
    data = jnp.ones((2, 3, 4))
    mask = jnp.array([[True, False, True], [False, True, False]])
    out = apply_mask_to_tensor(data, mask, -1.0)
    assert np.all(np.asarray(out[0, 1]) == -1.0)
    assert np.all(np.asarray(out[0, 0]) == 1.0)


def test_squeeze_except_batch_and_sample():
    rb = RaggedBatch(
        jnp.ones((4, 1, 1, 3, 4, 1)),
        sample_sizes=jnp.ones((4, 1), dtype=jnp.int32) * 3,
        non_uniform_dim=3,
    )
    out = squeeze_except_batch_and_sample(rb)
    assert out.shape == (4, 1, 3, 4)
    assert out.non_uniform_dim == 2


def test_get_compact_lists():
    mask = jnp.array([[True, False, True], [False, True, False]])
    a = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    b = jnp.arange(2 * 3 * 2, dtype=jnp.float32).reshape(2, 3, 2)
    out_a, passthrough, out_b = get_compact_lists(mask, [a, "keep", b])
    assert passthrough == "keep"
    np.testing.assert_array_equal(np.asarray(out_a.sample_sizes), [2, 1])
    np.testing.assert_array_equal(np.asarray(out_a.tensor[0]), [1.0, 3.0])
    assert float(out_a.tensor[1, 0]) == 5.0
    np.testing.assert_array_equal(np.asarray(out_b.tensor[0, 0]), np.asarray(b[0, 0]))
    np.testing.assert_array_equal(np.asarray(out_b.tensor[0, 1]), np.asarray(b[0, 2]))


def test_get_compact_from_named_tuple():
    from typing import NamedTuple

    class Pair(NamedTuple):
        x: jnp.ndarray
        tag: str

    mask = jnp.array([[True, True]])
    out = get_compact_from_named_tuple(mask, Pair(jnp.array([[1.0, 2.0]]), "t"))
    assert isinstance(out, Pair)
    assert out.tag == "t"
    np.testing.assert_array_equal(np.asarray(out.x.tensor), [[1.0, 2.0]])


def test_combine_data_flat():
    parts = [np.array([1.0, 2.0]), np.array([3.0]), np.array([4.0, 5.0, 6.0])]
    rb = combine_data(parts)
    assert rb.batch_shape == (3,)
    assert rb.max_sample_size == 3
    np.testing.assert_array_equal(np.asarray(rb.sample_sizes), [2, 1, 3])
    np.testing.assert_array_equal(np.asarray(rb.tensor[2]), [4.0, 5.0, 6.0])


def test_combine_data_nested_flattened():
    parts = [[np.array([1.0]), np.array([2.0, 3.0])], [np.array([4.0])]]
    rb = combine_data(parts)  # depth-first flattening
    assert rb.batch_shape == (3,)
    np.testing.assert_array_equal(np.asarray(rb.sample_sizes), [1, 2, 1])


def test_combine_data_nested_preserved():
    parts = [
        [np.array([1.0]), np.array([2.0, 3.0])],
        [np.array([4.0]), np.array([5.0])],
    ]
    rb = combine_data(parts, flatten_batch_dims=False)
    assert rb.batch_shape == (2, 2)
    assert rb.non_uniform_dim == 2
    np.testing.assert_array_equal(np.asarray(rb.sample_sizes), [[1, 2], [1, 1]])


def test_combine_data_reuse_sizes():
    parts = [np.array([1.0, 2.0]), np.array([3.0])]
    first = combine_data(parts)
    second = combine_data([np.array([9.0, 8.0]), np.array([7.0])], other_with_same_sample_sizes=first)
    assert second.mask is first.mask or np.array_equal(
        np.asarray(second.mask), np.asarray(first.mask)
    )
    np.testing.assert_array_equal(np.asarray(second.tensor[0]), [9.0, 8.0])


def test_combine_data_inner_dims():
    parts = [np.ones((2, 3)), np.zeros((1, 3))]
    rb = combine_data(parts)
    assert rb.shape == (2, 2, 3)


def test_loss_pattern_end_to_end():
    """The canonical ragged loss pattern (reference example/example.py call stack)."""
    from accvlab_tpu.ragged import batched_indexing_access, batched_indexing_write

    # gt classes per sample (ragged), matched indices, per-object weights
    classes = RaggedBatch(
        jnp.array([[1.0, 2.0, 0.0], [3.0, 0.0, 0.0]]), sample_sizes=jnp.array([2, 1])
    )
    matches = RaggedBatch(
        jnp.array([[1, 0, 0], [0, 0, 0]], dtype=jnp.int32), sample_sizes=jnp.array([2, 1])
    )

    def loss_fn(t):
        c = RaggedBatch(t, classes.mask, classes.sample_sizes)
        matched = batched_indexing_access(c, matches)
        per_obj = matched.apply(lambda x: x * x)
        return jnp.sum(average_over_targets(per_obj))

    val = loss_fn(classes.tensor)
    # sample0: gathered [2,1] -> sq [4,1] -> mean 2.5 ; sample1: [3]->[9]->9
    assert float(val) == pytest.approx(11.5)
    g = jax.grad(loss_fn)(classes.tensor)
    assert g.shape == classes.tensor.shape
