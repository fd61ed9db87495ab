"""Device-side auction matching vs scipy's Hungarian (the host path it
replaces)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accvlab_tpu.ragged import auction_matching, batched_auction_matching

scipy_opt = pytest.importorskip("scipy.optimize")


@pytest.mark.parametrize("seed", range(15))
def test_auction_matches_hungarian_optimum(seed):
    rng = np.random.default_rng(seed)
    r = int(rng.integers(1, 24))
    c = int(rng.integers(r, 80))
    cost = rng.uniform(0, 10, (r, c)).astype(np.float32)
    cols = np.asarray(jax.jit(auction_matching)(jnp.asarray(cost)))
    assert len(set(cols.tolist())) == r  # a valid assignment
    my = cost[np.arange(r), cols].sum()
    ri, ci = scipy_opt.linear_sum_assignment(cost)
    opt = cost[ri, ci].sum()
    assert my <= opt * (1 + 1e-4)  # optimal (within float tolerance)


def test_auction_ragged_rows():
    rng = np.random.default_rng(0)
    cost = rng.uniform(0, 10, (8, 12)).astype(np.float32)
    cols = np.asarray(auction_matching(jnp.asarray(cost), jnp.int32(5)))
    assert (cols[:5] >= 0).all() and (cols[5:] == -1).all()
    assert len(set(cols[:5].tolist())) == 5


def test_batched_auction_jit_and_layout():
    rng = np.random.default_rng(1)
    cost = rng.uniform(0, 10, (4, 10, 30)).astype(np.float32)
    nv = jnp.asarray([3, 10, 0, 7], jnp.int32)
    mg, mp = jax.jit(batched_auction_matching)(jnp.asarray(cost), nv)
    assert np.asarray(mg.sample_sizes).tolist() == [3, 10, 0, 7]
    # matches_gt is the identity prefix; matches_pred has no duplicates
    np.testing.assert_array_equal(np.asarray(mg.tensor)[0, :3], [0, 1, 2])
    for b, n in enumerate([3, 10, 0, 7]):
        sel = np.asarray(mp.tensor)[b, :n]
        assert len(set(sel.tolist())) == n
        # each sample's assignment is optimal
        if n:
            my = cost[b][np.arange(n), sel].sum()
            ri, ci = scipy_opt.linear_sum_assignment(cost[b][:n])
            assert my <= cost[b][ri, ci].sum() * (1 + 1e-4)
