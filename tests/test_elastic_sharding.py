"""ElasticShardedInputCallable: exact data accounting across shard-count
changes (beyond reference parity — the reference's contiguous-slice sharding
cannot resume mid-epoch onto a different fleet size without repeating or
skipping samples).

The invariant under test: consumption is always a PREFIX of the per-epoch
permutation, regardless of the shard count that produced it — so a
checkpoint taken on W shards resumes exactly on W' shards for any W -> W'.
"""

import numpy as np
import pytest

from accvlab_tpu.pipeline import DType, PipelineDefinition, SampleDataGroup
from accvlab_tpu.pipeline.inputs import (
    DataProvider,
    ElasticShardedInputCallable,
    SampleInfo,
    ShuffledShardedInputCallable,
    elastic_reshard,
)


class IdxProvider(DataProvider):
    """Provider whose single field IS the sample index — batches reveal
    exactly which samples were consumed."""

    def __init__(self, n):
        self._n = n

    @property
    def sample_data_structure(self):
        root = SampleDataGroup()
        root.add_data_field("idx", DType.INT32)
        return root

    def get_data(self, sample_index):
        sdg = self.sample_data_structure
        sdg["idx"] = np.asarray([sample_index], np.int32)
        return sdg

    def get_number_of_samples(self):
        return self._n


def _drive_callable(inp, epoch, iteration, batch_size):
    """One shard's samples for one lockstep step, via the raw __call__."""
    out = []
    for j in range(batch_size):
        info = SampleInfo(
            idx_in_epoch=iteration * batch_size + j,
            idx_in_batch=j,
            iteration=iteration,
            epoch_idx=epoch,
        )
        out.append(int(inp(info)[0][0]))
    return out


def _perm(n, seed, epoch):
    return np.random.default_rng(seed=seed + epoch).permutation(n)


def test_step_blocks_partition_permutation():
    """Step t across all W shards consumes exactly permutation[t*B*W :
    (t+1)*B*W] — no duplicates, no gaps; the partial tail is dropped."""
    N, B, W, seed = 20, 2, 3, 5
    shards = [
        ElasticShardedInputCallable(
            IdxProvider(N), B, shard_id=s, num_shards=W, shuffle=True, seed=seed
        )
        for s in range(W)
    ]
    perm = _perm(N, seed, epoch=0)
    steps = N // (B * W)
    assert shards[0].steps_in_epoch(0) == steps == 3
    for t in range(steps):
        got = []
        for s in range(W):
            got.extend(_drive_callable(shards[s], 0, t, B))
        np.testing.assert_array_equal(sorted(got), sorted(perm[t * B * W : (t + 1) * B * W]))
    # epoch end raises on every shard
    for s in range(W):
        with pytest.raises(StopIteration):
            _drive_callable(shards[s], 0, steps, B)


def test_single_shard_matches_reference_contract():
    """W=1: identical sample stream to the reference-contract class."""
    N, B, seed = 16, 4, 9
    a = ElasticShardedInputCallable(IdxProvider(N), B, shuffle=True, seed=seed)
    b = ShuffledShardedInputCallable(IdxProvider(N), B, shuffle=True, seed=seed)
    for epoch in range(2):
        for t in range(N // B):
            assert _drive_callable(a, epoch, t, B) == _drive_callable(b, epoch, t, B)


@pytest.mark.parametrize("w_old,w_new", [(2, 3), (3, 1), (1, 2), (4, 2)])
def test_elastic_reshard_exact_accounting(w_old, w_new):
    """Checkpoint on W shards mid-epoch, resume on W' shards: every epoch
    sample is consumed exactly once across both phases (minus the dropped
    tails, which are accounted explicitly)."""
    N, B, seed = 48, 2, 13
    perm = _perm(N, seed, epoch=0)

    def build_fleet(w, extra=None):
        pipes = []
        for s in range(w):
            inp = ElasticShardedInputCallable(
                IdxProvider(N), B, shard_id=s, num_shards=w, shuffle=True,
                seed=seed, **(extra or {}),
            )
            d = PipelineDefinition(
                inp, [], copy_external_source_passthrough_outputs=False
            )
            pipes.append(d.get_pipeline(batch_size=B, num_threads=1, seed=1))
        return pipes

    # phase 1: W_old shards, lockstep, t_ckpt steps
    t_ckpt = 3
    old = build_fleet(w_old)
    consumed = []
    try:
        for _ in range(t_ckpt):
            for p in old:
                consumed.extend(np.asarray(p.run()["idx"]).ravel().tolist())
        state = old[0].get_state()
        assert state["iteration"] == t_ckpt
    finally:
        for p in old:
            p.stop()

    # the consumed set is the permutation prefix — shard-count independent
    np.testing.assert_array_equal(
        sorted(consumed), sorted(perm[: t_ckpt * B * w_old])
    )

    # phase 2: reshard to W_new, resume, drain the epoch
    input_kwargs, new_state = elastic_reshard(
        state, batch_size=B, checkpoint_num_shards=w_old
    )
    assert input_kwargs["start_offset"] == t_ckpt * B * w_old
    new = build_fleet(w_new, extra=input_kwargs)
    try:
        for p in new:
            p.set_state(dict(new_state))
        done = [False] * w_new
        while not all(done):
            for i, p in enumerate(new):
                if done[i]:
                    continue
                try:
                    consumed.extend(np.asarray(p.run()["idx"]).ravel().tolist())
                except StopIteration:
                    done[i] = True
    finally:
        for p in new:
            p.stop()

    # exactly-once: the union is a prefix of the permutation, no duplicates
    assert len(consumed) == len(set(consumed)), "a sample was repeated"
    offset = t_ckpt * B * w_old
    total = offset + ((N - offset) // (B * w_new)) * B * w_new
    np.testing.assert_array_equal(sorted(consumed), sorted(perm[:total]))


def test_next_epoch_runs_full_length():
    """The resume offset applies only to the checkpointed epoch; the next
    epoch is full-length from position 0."""
    N, B = 12, 2
    inp = ElasticShardedInputCallable(
        IdxProvider(N), B, shuffle=True, seed=3, start_offset=8, start_epoch=0
    )
    assert inp.steps_in_epoch(0) == (12 - 8) // 2 == 2
    assert inp.steps_in_epoch(1) == 6
    perm1 = _perm(N, 3, epoch=1)
    got = _drive_callable(inp, 1, 0, B)
    np.testing.assert_array_equal(got, perm1[:B])


def test_validation():
    with pytest.raises(ValueError, match="shard_id"):
        ElasticShardedInputCallable(IdxProvider(8), 2, shard_id=2, num_shards=2)
    with pytest.raises(ValueError, match="start_offset"):
        ElasticShardedInputCallable(IdxProvider(8), 2, start_offset=-1)
    with pytest.raises(ValueError, match="version"):
        elastic_reshard({"version": 99}, batch_size=2, checkpoint_num_shards=2)
