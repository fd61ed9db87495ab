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


def test_unconverged_rows_drop_out_not_alias():
    """Regression (ADVICE r1): rows unassigned at max_iters were remapped to
    column 0 while still counted in sample_sizes — several rows silently
    shared prediction 0. Now assigned pairs compact to the prefix and
    sample_sizes shrinks, preserving the one-to-one contract."""
    import jax.numpy as jnp
    import numpy as np

    from accvlab_tpu.ragged.matching import batched_auction_matching

    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
    n_valid = jnp.asarray([6, 4], jnp.int32)
    # max_iters=1: at most one bid round -> most rows cannot be assigned
    gt, pred = batched_auction_matching(cost, n_valid, max_iters=1)
    sizes = np.asarray(gt.sample_sizes)
    gt_rows = np.asarray(gt.tensor)
    pred_cols = np.asarray(pred.tensor)
    for s in range(2):
        n = int(sizes[s])
        assert n <= int(n_valid[s])
        # one-to-one: no duplicated prediction column among counted matches
        counted = pred_cols[s, :n]
        assert len(set(counted.tolist())) == n, counted
        # counted gt rows are valid and unique
        rows = gt_rows[s, :n]
        assert len(set(rows.tolist())) == n
        assert (rows < int(n_valid[s])).all()


def test_converged_matching_unchanged_by_compaction():
    """With enough iterations everything converges: sizes == num_valid_rows
    and the assignment matches scipy's optimum (existing contract)."""
    import jax.numpy as jnp
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    from accvlab_tpu.ragged.matching import batched_auction_matching

    rng = np.random.default_rng(1)
    cost_np = rng.normal(size=(3, 5, 9)).astype(np.float32)
    n_valid = np.array([5, 3, 0], np.int32)
    gt, pred = batched_auction_matching(jnp.asarray(cost_np), jnp.asarray(n_valid))
    sizes = np.asarray(gt.sample_sizes)
    np.testing.assert_array_equal(sizes, n_valid)
    for s in range(3):
        n = int(n_valid[s])
        if n == 0:
            continue
        rows = np.asarray(gt.tensor)[s, :n]
        cols = np.asarray(pred.tensor)[s, :n]
        got = cost_np[s][rows, cols].sum()
        ri, ci = linear_sum_assignment(cost_np[s][:n])
        opt = cost_np[s][ri, ci].sum()
        assert got <= opt + 0.05 * abs(opt) + 1e-3
