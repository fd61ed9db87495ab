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


def test_chained_mid_epoch_reshards_account_prior_offset():
    """Two reshards in one epoch: the second elastic_reshard must include
    the first's start_offset in the consumed prefix (it reads the offsets
    from the checkpoint's input-state snapshot)."""
    N, B, seed = 48, 2, 13
    perm = _perm(N, seed, epoch=0)

    def run_fleet(w, steps, extra, state=None):
        pipes = []
        for s in range(w):
            inp = ElasticShardedInputCallable(
                IdxProvider(N), B, shard_id=s, num_shards=w, shuffle=True,
                seed=seed, **extra,
            )
            d = PipelineDefinition(inp, [], copy_external_source_passthrough_outputs=False)
            pipes.append(d.get_pipeline(batch_size=B, num_threads=1, seed=1))
        got = []
        try:
            if state is not None:
                for p in pipes:
                    p.set_state(dict(state))
            for _ in range(steps):
                for p in pipes:
                    got.append(np.asarray(p.run()["idx"]).ravel())
            return got, pipes[0].get_state()
        finally:
            for p in pipes:
                p.stop()

    consumed = []
    # phase 1: W=2, 2 steps
    got, state1 = run_fleet(2, 2, {})
    consumed.extend(np.concatenate(got).tolist())
    # phase 2: W=3, 2 steps (resharded once)
    kw1, st1 = elastic_reshard(state1, batch_size=B, checkpoint_num_shards=2)
    assert kw1["start_offset"] == 8
    got, state2 = run_fleet(3, 2, kw1, st1)
    consumed.extend(np.concatenate(got).tolist())
    # phase 3: W=2 again (chained reshard) — offset must be 8 + 12 = 20
    kw2, st2 = elastic_reshard(state2, batch_size=B, checkpoint_num_shards=3)
    assert kw2["start_offset"] == 20, kw2
    got, _ = run_fleet(2, 3, kw2, st2)
    consumed.extend(np.concatenate(got).tolist())

    assert len(consumed) == len(set(consumed)), "a sample was repeated"
    np.testing.assert_array_equal(sorted(consumed), sorted(perm[: len(consumed)]))


def test_mid_echo_reshard_restarts_partial_batch():
    """A mid-echo checkpoint resharded to a new W restarts the partial host
    batch from echo 0: fresh-sample accounting stays exact (every sample of
    the epoch prefix gets >= E views; only the partial batch's samples get
    the one extra pre-preemption view)."""
    from collections import Counter

    N, B, E, seed = 24, 2, 2, 13
    perm = _perm(N, seed, epoch=0)

    def build(w, s, extra=None):
        inp = ElasticShardedInputCallable(
            IdxProvider(N), B, shard_id=s, num_shards=w, shuffle=True,
            seed=seed, **(extra or {}),
        )
        d = PipelineDefinition(inp, [], copy_external_source_passthrough_outputs=False)
        return d.get_pipeline(batch_size=B, num_threads=1, seed=1, echo_factor=E)

    views = Counter()
    # W=2 fleet: deliver host batch 0 fully (E echoes) + echo 0 of batch 1
    old = [build(2, s) for s in range(2)]
    try:
        for _ in range(E + 1):
            for p in old:
                views.update(np.asarray(p.run()["idx"]).ravel().tolist())
        state = old[0].get_state()
        assert state["echo"] == {"factor": E, "next": 1}
        assert state["iteration"] == 1  # partial batch excluded
    finally:
        for p in old:
            p.stop()
    partial_window = set(perm[4:8].tolist())

    kw, new_state = elastic_reshard(state, batch_size=B, checkpoint_num_shards=2)
    assert kw["start_offset"] == 4  # only the fully-consumed batch
    assert new_state["echo"] == {"factor": E, "next": 0}

    new = build(1, 0, kw)
    try:
        new.set_state(new_state)
        while True:
            try:
                views.update(np.asarray(new.run()["idx"]).ravel().tolist())
            except StopIteration:
                break
    finally:
        new.stop()

    for idx in perm.tolist():
        expect = E + (1 if idx in partial_window else 0)
        assert views[idx] == expect, (idx, views[idx], expect)


def test_checkpoint_before_first_batch_after_reshard_keeps_offset():
    """A checkpoint taken AFTER set_state but BEFORE the first consumed
    batch of the resumed fleet must still carry the consumed-prefix offset
    (get_state re-captures from the new input); a chained reshard from it
    must not restart the epoch."""
    N, B, seed = 24, 2, 7
    perm = _perm(N, seed, epoch=0)

    inp = ElasticShardedInputCallable(
        IdxProvider(N), B, shuffle=True, seed=seed
    )
    d = PipelineDefinition(inp, [], copy_external_source_passthrough_outputs=False)
    pipe = d.get_pipeline(batch_size=B, num_threads=1, seed=1)
    consumed = []
    try:
        for _ in range(3):
            consumed.extend(np.asarray(pipe.run()["idx"]).ravel().tolist())
        state = pipe.get_state()
    finally:
        pipe.stop()

    kw, new_state = elastic_reshard(state)  # args derived from the snapshot
    assert kw["start_offset"] == 6
    inp2 = ElasticShardedInputCallable(
        IdxProvider(N), B, shuffle=True, seed=seed, **kw
    )
    d2 = PipelineDefinition(inp2, [], copy_external_source_passthrough_outputs=False)
    pipe2 = d2.get_pipeline(batch_size=B, num_threads=1, seed=1)
    try:
        pipe2.set_state(dict(new_state))
        # validation checkpoint BEFORE consuming anything on the new fleet
        state2 = pipe2.get_state()
    finally:
        pipe2.stop()
    assert state2["input_state"] is not None
    assert state2["input_state"]["start_offset"] == 6

    kw2, st2 = elastic_reshard(state2)
    assert kw2["start_offset"] == 6, "chained reshard lost the prefix"
    inp3 = ElasticShardedInputCallable(
        IdxProvider(N), B, shuffle=True, seed=seed, **kw2
    )
    d3 = PipelineDefinition(inp3, [], copy_external_source_passthrough_outputs=False)
    pipe3 = d3.get_pipeline(batch_size=B, num_threads=1, seed=1)
    try:
        pipe3.set_state(dict(st2))
        while True:
            try:
                consumed.extend(np.asarray(pipe3.run()["idx"]).ravel().tolist())
            except StopIteration:
                break
    finally:
        pipe3.stop()
    assert len(consumed) == len(set(consumed)), "a sample was repeated"
    np.testing.assert_array_equal(sorted(consumed), sorted(perm[: len(consumed)]))


def test_elastic_reshard_argument_validation():
    inp = ElasticShardedInputCallable(IdxProvider(8), 2, shuffle=True, seed=1)
    d = PipelineDefinition(inp, [], copy_external_source_passthrough_outputs=False)
    pipe = d.get_pipeline(batch_size=2, num_threads=1, seed=1)
    try:
        pipe.run()
        state = pipe.get_state()
    finally:
        pipe.stop()
    # wrong explicit args are rejected against the recorded snapshot
    with pytest.raises(ValueError, match="records num_shards"):
        elastic_reshard(state, batch_size=2, checkpoint_num_shards=4)
    with pytest.raises(ValueError, match="records batch_size"):
        elastic_reshard(state, batch_size=8, checkpoint_num_shards=1)
    # matching explicit args are fine; so is deriving everything
    elastic_reshard(state, batch_size=2, checkpoint_num_shards=1)
    elastic_reshard(state)
    # no snapshot and no args -> explicit error
    bare = {k: v for k, v in state.items()}
    bare["input_state"] = None
    with pytest.raises(ValueError, match="no input snapshot"):
        elastic_reshard(bare)
