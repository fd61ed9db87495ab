"""RaggedBatch under pjit on the virtual 8-device mesh: the ragged loss
pattern sharded over the data axis (the multi-chip contract the driver's
dryrun validates)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from accvlab_tpu.parallel import make_mesh, shard_batch
from accvlab_tpu.ragged import (
    RaggedBatch,
    average_over_targets,
    batched_indexing_access,
)


def test_ragged_loss_sharded_over_data_axis():
    mesh = make_mesh()  # (8, 1)
    b, t = 16, 6
    rng = np.random.default_rng(0)
    classes = rng.normal(size=(b, t)).astype(np.float32)
    sizes = rng.integers(1, t + 1, (b,)).astype(np.int32)
    matches = rng.integers(0, t, (b, t)).astype(np.int32)

    rb_classes = RaggedBatch(jnp.asarray(classes), sample_sizes=jnp.asarray(sizes))
    rb_matches = RaggedBatch(jnp.asarray(matches), sample_sizes=jnp.asarray(sizes))

    # RaggedBatch is a pytree: shard all its leaves over the batch dim
    sharded_classes = shard_batch(rb_classes, mesh)
    sharded_matches = shard_batch(rb_matches, mesh)
    assert sharded_classes.tensor.sharding.spec == P("data", None)

    @jax.jit
    def loss(c: RaggedBatch, m: RaggedBatch):
        matched = batched_indexing_access(c, m)
        per_obj = matched.apply(lambda x: x * x)
        return jnp.sum(average_over_targets(per_obj))

    with mesh:
        sharded_val = loss(sharded_classes, sharded_matches)
    plain_val = loss(rb_classes, rb_matches)
    np.testing.assert_allclose(float(sharded_val), float(plain_val), rtol=1e-6)


def test_ragged_grad_sharded():
    mesh = make_mesh()
    b, t = 8, 4
    rb = RaggedBatch(
        jnp.arange(b * t, dtype=jnp.float32).reshape(b, t),
        sample_sizes=jnp.full((b,), t - 1, jnp.int32),
    )
    tensor = shard_batch(rb.tensor, mesh)

    @jax.jit
    def loss(tns):
        r = RaggedBatch(tns, rb.mask, rb.sample_sizes)
        return jnp.sum(r.with_padded_set_to(0.0).tensor)

    with mesh:
        g = jax.grad(loss)(tensor)
    arr = np.asarray(g)
    assert arr.shape == (b, t)
    np.testing.assert_array_equal(arr[:, -1], np.zeros(b))  # padded grads zeroed
    np.testing.assert_array_equal(arr[:, :-1], np.ones((b, t - 1)))
