"""Checkpoint/resume of the input pipeline (get_state/set_state).

Beyond reference parity: the reference has no mid-run resume API anywhere
(SURVEY §5.4 — samplers are seeded/deterministic but cannot be restored to a
mid-epoch position). On preemptible TPU fleets the input pipeline must resume
exactly or data is silently repeated/skipped after every preemption. The
contract verified here: ``state = pipe.get_state()`` after consuming K
batches, then a FRESH pipeline (fresh input objects, same constructor
arguments) with ``set_state(state)`` yields batch K+1, K+2, ... bit-identical
to an uninterrupted run — including host/device augmentation randomness and
regardless of how far the prefetch producer had run ahead.
"""

import json
import warnings

import numpy as np
import pytest

from accvlab_tpu.pipeline import PipelineDefinition, StructuredOutputIterator
from accvlab_tpu.pipeline.inputs import (
    IterableBase,
    SamplerInputIterable,
    SequenceSampler,
    ShuffledShardedInputCallable,
)
from accvlab_tpu.pipeline.processing_steps import (
    ImageDecoder,
    ImageRange01Normalizer,
    ImageToTileSizePadder,
    PhotoMetricDistorter,
)
from accvlab_tpu.pipeline.processing_steps.pipeline_step_base import (
    PipelineStepBase,
)

from test_pipeline_end_to_end import SyntheticProvider


def _augmented_steps():
    return [
        ImageDecoder("image"),
        ImageToTileSizePadder("image", 8),
        ImageRange01Normalizer("image"),
        # randomized device step: proves the device RNG stream (keyed on the
        # global batch index) survives the resume
        PhotoMetricDistorter(
            "image",
            min_max_brightness=(0.6, 1.4),
            min_max_hue=(-0.1, 0.1),
            min_max_contrast=(0.6, 1.4),
            min_max_saturation=(0.6, 1.4),
        ),
    ]


def _build(batch_size=4, depth=2, steps=None):
    provider = SyntheticProvider()
    inp = ShuffledShardedInputCallable(provider, batch_size=batch_size, shuffle=True)
    definition = PipelineDefinition(
        inp,
        _augmented_steps() if steps is None else steps,
        copy_external_source_passthrough_outputs=False,
    )
    return definition.get_pipeline(
        batch_size=batch_size, num_threads=2, seed=7, prefetch_queue_depth=depth
    )


def _batch_arrays(batch):
    return {k: np.asarray(v) for k, v in batch.items()}


def _assert_batches_equal(a, b):
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=f"field {k}")


class TestSequenceSamplerState:
    def test_roundtrip_fresh_sampler(self):
        lengths = [5, 3, 7, 4, 6, 2]
        s1 = SequenceSampler(2, lengths, seed=11)
        for _ in range(9):
            s1.get_next_batch_indices()
        state = s1.get_state()
        assert state == {"draws": 9}

        s2 = SequenceSampler(2, lengths, seed=11)
        s2.set_state(state)
        for _ in range(8):
            assert s2.get_next_batch_indices() == s1.get_next_batch_indices()

    def test_rewind_restarts_stream(self):
        lengths = [5, 3, 7, 4]
        s1 = SequenceSampler(2, lengths, seed=3)
        draws = [s1.get_next_batch_indices() for _ in range(10)]
        s1.set_state({"draws": 4})  # rewind an in-use sampler
        assert [s1.get_next_batch_indices() for _ in range(6)] == draws[4:]

    def test_state_is_jsonable(self):
        s = SequenceSampler(1, [4, 4], seed=0)
        s.get_next_batch_indices()
        restored = json.loads(json.dumps(s.get_state()))
        s2 = SequenceSampler(1, [4, 4], seed=0)
        s2.set_state(restored)
        assert s2.get_next_batch_indices() == s.get_next_batch_indices()


class TestCallablePipelineResume:
    def test_mid_epoch_resume_bitwise(self):
        pipe = _build()
        _ = pipe.run()  # consume batch 0
        state = pipe.get_state()
        expected = _batch_arrays(pipe.run())  # batch 1 of the original run
        pipe.stop()

        assert state["epoch"] == 0 and state["iteration"] == 1
        assert state["global_batch"] == 1 and state["input_state"] is None

        fresh = _build()
        fresh.set_state(state)
        resumed = _batch_arrays(fresh.run())
        fresh.stop()
        _assert_batches_equal(expected, resumed)

    def test_resume_unaffected_by_prefetch_depth(self):
        # deep prefetch: the producer runs far ahead of consumption; the
        # state must reflect the CONSUMED position, not the produced one
        pipe = _build(batch_size=2, depth=4)
        _ = pipe.run()
        state = pipe.get_state()
        expected = [_batch_arrays(pipe.run()) for _ in range(2)]
        pipe.stop()
        assert state["iteration"] == 1

        fresh = _build(batch_size=2, depth=1)  # different depth on resume
        fresh.set_state(state)
        resumed = [_batch_arrays(fresh.run()) for _ in range(2)]
        fresh.stop()
        for e, r in zip(expected, resumed):
            _assert_batches_equal(e, r)

    def test_resume_across_epoch_boundary(self):
        pipe = _build()
        list(pipe)  # drain epoch 0 (2 batches of 4 over 8 samples)
        pipe.reset()
        _ = pipe.run()  # batch 0 of epoch 1 (new shuffle)
        state = pipe.get_state()
        expected = _batch_arrays(pipe.run())
        pipe.stop()
        assert state["epoch"] == 1 and state["iteration"] == 1

        fresh = _build()
        fresh.set_state(state)
        resumed = _batch_arrays(fresh.run())
        fresh.stop()
        _assert_batches_equal(expected, resumed)

    def test_state_before_first_batch(self):
        pipe = _build()
        state = pipe.get_state()
        expected = _batch_arrays(pipe.run())
        pipe.stop()
        assert state["iteration"] == 0 and state["global_batch"] == 0

        fresh = _build()
        fresh.set_state(state)
        resumed = _batch_arrays(fresh.run())
        fresh.stop()
        _assert_batches_equal(expected, resumed)

    def test_state_json_roundtrip(self):
        pipe = _build()
        _ = pipe.run()
        state = json.loads(json.dumps(pipe.get_state()))
        expected = _batch_arrays(pipe.run())
        pipe.stop()

        fresh = _build()
        fresh.set_state(state)
        resumed = _batch_arrays(fresh.run())
        fresh.stop()
        _assert_batches_equal(expected, resumed)

    def test_process_worker_mode_resume(self):
        # spawned workers are driven by (iteration, epoch) per batch, so the
        # counter restore resumes them exactly
        def build_proc():
            provider = SyntheticProvider()
            inp = ShuffledShardedInputCallable(provider, batch_size=4, shuffle=True)
            definition = PipelineDefinition(
                inp,
                [ImageDecoder("image"), ImageRange01Normalizer("image")],
                copy_external_source_passthrough_outputs=False,
            )
            return definition.get_pipeline(
                batch_size=4, num_threads=2, seed=7, worker_mode="process"
            )

        pipe = build_proc()
        _ = pipe.run()
        state = pipe.get_state()
        expected = _batch_arrays(pipe.run())
        pipe.stop()

        fresh = build_proc()
        fresh.set_state(state)
        resumed = _batch_arrays(fresh.run())
        fresh.stop()
        _assert_batches_equal(expected, resumed)

    def test_unknown_version_rejected(self):
        pipe = _build()
        with pytest.raises(ValueError, match="state version"):
            pipe.set_state({"version": 99})
        pipe.stop()


def _build_iterable_pipeline(depth=2):
    provider = SyntheticProvider()
    sampler = SequenceSampler(4, [2, 2, 2, 2], seed=5)
    inp = SamplerInputIterable(provider, sampler)
    definition = PipelineDefinition(
        inp,
        [
            ImageDecoder("image"),
            ImageToTileSizePadder("image", 8),
            ImageRange01Normalizer("image"),
        ],
        copy_external_source_passthrough_outputs=False,
    )
    pipe = definition.get_pipeline(
        batch_size=4, num_threads=2, seed=7, prefetch_queue_depth=depth
    )
    return pipe


class TestIterablePipelineResume:
    def test_stateful_iterable_resume(self):
        # prefetch depth 2: by the time batch 2 is consumed the sampler has
        # been drawn from up to ~4 times; the captured input state must be
        # the one matching the consumed batch
        pipe = _build_iterable_pipeline(depth=2)
        for _ in range(2):
            _ = pipe.run()
        state = pipe.get_state()
        expected = [_batch_arrays(pipe.run()) for _ in range(3)]
        pipe.stop()
        assert state["input_state"] == {"sampler": {"draws": 2}}

        fresh = _build_iterable_pipeline(depth=1)
        fresh.set_state(state)
        resumed = [_batch_arrays(fresh.run()) for _ in range(3)]
        fresh.stop()
        for e, r in zip(expected, resumed):
            _assert_batches_equal(e, r)

    def test_stateless_iterable_warns_on_resume(self):
        provider = SyntheticProvider()

        class PlainIterable(IterableBase):
            @property
            def used_sample_data_structure(self):
                res = provider.sample_data_structure
                res.set_apply_mapping(False)
                return res

            def __next__(self):
                per_sample = [provider.get_data(i).get_data() for i in range(4)]
                nf = len(per_sample[0])
                return tuple([s[f] for s in per_sample] for f in range(nf))

        def build():
            definition = PipelineDefinition(
                PlainIterable(),
                [ImageDecoder("image"), ImageRange01Normalizer("image")],
                copy_external_source_passthrough_outputs=False,
            )
            return definition.get_pipeline(batch_size=4, num_threads=2, seed=7)

        pipe = build()
        _ = pipe.run()
        state = pipe.get_state()
        pipe.stop()
        assert state["input_state"] is None

        fresh = build()
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            fresh.set_state(state)
        fresh.stop()
        assert any("exact resume" in str(w.message) for w in caught)


def test_structured_output_iterator_passthrough():
    pipe = _build()
    it = StructuredOutputIterator(2, pipe, pipe.output_blueprint)
    views = iter(it)
    _ = next(views)
    state = it.get_state()
    expected = next(views)
    pipe.stop()
    assert state["iteration"] == 1

    fresh_pipe = _build()
    fresh_it = StructuredOutputIterator(2, fresh_pipe, fresh_pipe.output_blueprint)
    fresh_it.set_state(state)
    # the DOCUMENTED DataLoader usage: iter() constructs a SimpleIterator,
    # which resets on construction — that reset must not discard the
    # restored position (it used to bump the epoch and restart the shuffle)
    resumed = next(iter(fresh_it))
    assert fresh_pipe.get_state()["epoch"] == state["epoch"]
    fresh_pipe.stop()
    assert expected.keys() == resumed.keys()
    for k in expected:
        np.testing.assert_array_equal(
            np.asarray(expected[k]), np.asarray(resumed[k]), err_msg=f"field {k}"
        )


def test_reset_after_resume_is_armed_once():
    """set_state arms exactly ONE no-op reset, and only for the
    iterator-front construction path; a second front reset is a genuine
    epoch boundary again."""
    pipe = _build()
    _ = pipe.run()
    state = pipe.get_state()
    expected = _batch_arrays(pipe.run())
    pipe.stop()

    fresh = _build()
    fresh.set_state(state)
    fresh._reset_from_iterator_front()  # front reset: must be a no-op
    assert fresh.get_state() == state
    got = _batch_arrays(fresh.run())
    _assert_batches_equal(expected, got)
    epoch_before = fresh.get_state()["epoch"]
    fresh._reset_from_iterator_front()  # armed flag consumed: new epoch
    assert fresh.get_state()["epoch"] == epoch_before + 1
    assert fresh.get_state()["iteration"] == 0
    fresh.stop()


def test_user_reset_after_set_state_is_a_real_restart():
    """A USER-initiated reset() right after set_state is a genuine epoch
    restart — it must not be silently swallowed by the iterator-front
    no-op arming (ADVICE r3: the old heuristic consumed ANY next reset)."""
    pipe = _build()
    _ = pipe.run()
    state = pipe.get_state()
    pipe.stop()

    fresh = _build()
    fresh.set_state(state)
    epoch_restored = fresh.get_state()["epoch"]
    fresh.reset()  # explicit user restart: must advance the epoch
    st = fresh.get_state()
    assert st["epoch"] == epoch_restored + 1
    assert st["iteration"] == 0
    # and the armed flag is gone: an iterator front constructed NOW
    # performs a plain reset (same epoch — nothing was consumed yet)
    fresh._reset_from_iterator_front()
    assert fresh.get_state()["epoch"] == st["epoch"]
    fresh.stop()


def test_set_state_waits_out_inflight_producer():
    """set_state while the producer is mid-batch: the halt must wait for the
    in-flight host batch instead of letting a zombie producer overwrite the
    restored counters / advance the input behind the restored position."""
    import time as _time

    class SlowProvider(SyntheticProvider):
        def get_data(self, sample_index):
            _time.sleep(0.05)
            return super().get_data(sample_index)

    def build():
        inp = ShuffledShardedInputCallable(
            SlowProvider(), batch_size=4, shuffle=True
        )
        definition = PipelineDefinition(
            inp,
            [ImageDecoder("image"), ImageRange01Normalizer("image")],
            copy_external_source_passthrough_outputs=False,
        )
        return definition.get_pipeline(
            batch_size=4, num_threads=1, seed=7, prefetch_queue_depth=2
        )

    pipe = build()
    _ = pipe.run()
    state = pipe.get_state()
    expected = _batch_arrays(pipe.run())
    pipe.stop()

    fresh = build()
    _ = fresh.run()  # producer sprints ahead into the next slow batch
    fresh.set_state(state)
    # no producer thread may survive the restore
    assert fresh._producer is None
    assert fresh.get_state() == state
    got = _batch_arrays(fresh.run())
    _assert_batches_equal(expected, got)
    fresh.stop()


class _KeyNoiseStep(PipelineStepBase):
    """Device step whose output IS its random draw — makes the augmentation
    key stream directly observable."""

    placement = "device"

    def _process(self, data):
        data["image"] = data["image"] + self.random.uniform(0.0, 1.0, (1,))
        return data

    def _check_and_adjust_data_format_input_to_output(self, data_empty):
        return data_empty


class TestMidEpochResetDeterminism:
    """A MID-epoch reset() must behave, for the augmentation key stream, as
    if the epoch had been consumed to its end: the next epoch's batches are
    bit-identical to an uninterrupted run's and independent of how far the
    prefetch producer ran ahead (regression: the key counter used to
    re-sync to the producer's racy position)."""

    N, BS = 24, 2  # 12 steps/epoch — far past any prefetch depth

    def _build(self, depth):
        from accvlab_tpu.pipeline import DType, SampleDataGroup
        from accvlab_tpu.pipeline.inputs import DataProvider

        class P(DataProvider):
            @property
            def sample_data_structure(inner):
                s = SampleDataGroup()
                s.add_data_field("image", DType.FLOAT)
                return s

            def get_data(inner, i):
                s = inner.sample_data_structure
                s["image"] = np.zeros((4,), np.float32)
                return s

            def get_number_of_samples(inner):
                return self.N

        inp = ShuffledShardedInputCallable(P(), batch_size=self.BS, shuffle=False)
        defn = PipelineDefinition(
            inp,
            [_KeyNoiseStep()],
            check_data_format=False,
            copy_external_source_passthrough_outputs=False,
        )
        return defn.get_pipeline(
            batch_size=self.BS, num_threads=1, seed=0, prefetch_queue_depth=depth
        )

    def _epoch2_after_early_reset(self, depth, let_producer_run_ahead):
        import time

        pipe = self._build(depth)
        try:
            pipe.run()  # ONE batch of epoch 1, then abandon the epoch
            if let_producer_run_ahead:
                time.sleep(0.25)
            pipe.reset()
            return np.asarray(pipe.run()["image"]), pipe.get_state()["global_batch"]
        finally:
            pipe.stop()

    def test_post_reset_stream_is_prefetch_independent_and_oracle_exact(self):
        a, ga = self._epoch2_after_early_reset(1, False)
        b, gb = self._epoch2_after_early_reset(4, True)
        assert ga == gb  # the key counter rolled to the epoch boundary
        np.testing.assert_array_equal(a, b)

        # uninterrupted oracle: full epoch 1 -> reset -> epoch 2
        pipe = self._build(depth=2)
        try:
            while True:
                try:
                    pipe.run()
                except StopIteration:
                    break
            pipe.reset()
            oracle = np.asarray(pipe.run()["image"])
            g_oracle = pipe.get_state()["global_batch"]
        finally:
            pipe.stop()
        assert ga == g_oracle
        np.testing.assert_array_equal(a, oracle)


def test_reset_after_mid_echo_first_batch_restore_advances_epoch():
    """reset() after restoring a mid-echo checkpoint of an epoch's FIRST
    batch is a genuine epoch restart: echo 0 of batch 0 was already
    delivered, so the restart must advance to the next epoch — not
    re-deliver epoch 0 (regression: ``_halt_producer`` cleared the echo
    counters before ``reset()``'s epoch-has-started check, and
    ``_iteration`` is still 0 mid-echo on the first batch)."""
    from accvlab_tpu.pipeline import DType, SampleDataGroup
    from accvlab_tpu.pipeline.inputs import DataProvider

    N, BS = 8, 2

    class P(DataProvider):
        @property
        def sample_data_structure(self):
            s = SampleDataGroup()
            s.add_data_field("image", DType.FLOAT)
            return s

        def get_data(self, i):
            s = self.sample_data_structure
            s["image"] = np.zeros((4,), np.float32)
            return s

        def get_number_of_samples(self):
            return N

    def build():
        inp = ShuffledShardedInputCallable(P(), batch_size=BS, shuffle=False)
        defn = PipelineDefinition(
            inp,
            [_KeyNoiseStep()],
            check_data_format=False,
            copy_external_source_passthrough_outputs=False,
        )
        return defn.get_pipeline(
            batch_size=BS, num_threads=1, seed=0, prefetch_queue_depth=2,
            echo_factor=2,
        )

    # oracle: consume epoch 1 fully, reset, observe epoch 2's first delivery
    pipe = build()
    try:
        while True:
            try:
                pipe.run()
            except StopIteration:
                break
        pipe.reset()
        oracle = np.asarray(pipe.run()["image"])
    finally:
        pipe.stop()

    # restore a mid-echo checkpoint of epoch 1's FIRST batch, then reset()
    pipe = build()
    try:
        pipe.run()  # batch 0, echo 0 — delivered
        state = pipe.get_state()
        assert state["iteration"] == 0 and state["echo"]["next"] == 1
    finally:
        pipe.stop()
    fresh = build()
    try:
        fresh.set_state(state)
        fresh.reset()
        assert fresh.get_state()["epoch"] == 1
        got = np.asarray(fresh.run()["image"])
        np.testing.assert_array_equal(got, oracle)
    finally:
        fresh.stop()


def test_reset_rollover_never_reuses_delivered_keys_on_lying_length():
    """If an input's static ``length`` hint UNDERESTIMATES the epoch's true
    step count, the mid-epoch-reset key rollover must not move the key
    counter backward past batches already delivered (regression: the
    fallback trusted ``length`` verbatim; the clamp keeps monotonicity and
    the 'never reuses a delivered batch's key' contract)."""
    from accvlab_tpu.pipeline import DType, SampleDataGroup
    from accvlab_tpu.pipeline.inputs import CallableBase

    TRUE_STEPS, BS = 6, 2

    class LyingLengthInput(CallableBase):
        @property
        def used_sample_data_structure(self):
            s = SampleDataGroup()
            s.add_data_field("image", DType.FLOAT)
            return s

        def __call__(self, si):
            if si.iteration >= TRUE_STEPS:
                raise StopIteration
            s = self.used_sample_data_structure
            s["image"] = np.zeros((4,), np.float32)
            return tuple(s.get_data())

        @property
        def length(self):
            return 2  # lies: the epoch actually has TRUE_STEPS batches

    defn = PipelineDefinition(
        LyingLengthInput(),
        [_KeyNoiseStep()],
        check_data_format=False,
        copy_external_source_passthrough_outputs=False,
    )
    pipe = defn.get_pipeline(
        batch_size=BS, num_threads=1, seed=0, prefetch_queue_depth=2
    )
    try:
        epoch1 = {float(np.asarray(pipe.run()["image"])[0, 0]) for _ in range(4)}
        pipe.reset()  # mid-epoch: producer is past the claimed length
        epoch2 = {float(np.asarray(pipe.run()["image"])[0, 0]) for _ in range(2)}
        # distinct augmentation keys => distinct noise values
        assert epoch1.isdisjoint(epoch2), (
            f"epoch 2 reused delivered augmentation keys: {epoch1 & epoch2}"
        )
    finally:
        pipe.stop()
