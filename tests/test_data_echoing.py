"""Data echoing (``echo_factor``): replayed batches, single transfer,
distinct augmentation streams, exact mid-echo resume.

Beyond reference parity (SURVEY has no echoing anywhere): the technique of
Choi et al. 2019 ("Faster Neural Network Training with Data Echoing") for
input-bound accelerators — each host batch is delivered E times with its
own device-side augmentation RNG stream, paying host decode and the
host->device wire once per E delivered batches.
"""

import numpy as np
import pytest

from accvlab_tpu.pipeline import PipelineDefinition
from accvlab_tpu.pipeline.inputs import ShuffledShardedInputCallable
from accvlab_tpu.pipeline.processing_steps import (
    ImageDecoder,
    ImageRange01Normalizer,
    ImageToTileSizePadder,
    PhotoMetricDistorter,
)

from test_pipeline_end_to_end import SyntheticProvider


def _steps(augment=True):
    steps = [
        ImageDecoder("image"),
        ImageToTileSizePadder("image", 8),
        ImageRange01Normalizer("image"),
    ]
    if augment:
        steps.append(
            PhotoMetricDistorter(
                "image",
                min_max_brightness=(0.6, 1.4),
                min_max_hue=(-0.1, 0.1),
                min_max_contrast=(0.6, 1.4),
                min_max_saturation=(0.6, 1.4),
            )
        )
    return steps


def _build(echo_factor, batch_size=4, augment=True, depth=2):
    inp = ShuffledShardedInputCallable(
        SyntheticProvider(n=16), batch_size=batch_size, shuffle=True
    )
    definition = PipelineDefinition(
        inp, _steps(augment), copy_external_source_passthrough_outputs=False
    )
    return definition.get_pipeline(
        batch_size=batch_size,
        num_threads=2,
        seed=11,
        prefetch_queue_depth=depth,
        echo_factor=echo_factor,
    )


def _arrays(batch):
    return {k: np.asarray(v) for k, v in batch.items()}


def test_echo_replays_share_source_but_differ_in_augmentation():
    pipe = _build(echo_factor=3)
    try:
        replays = [_arrays(pipe.run()) for _ in range(3)]
        st = pipe.stats()
        # three delivered batches from ONE host batch
        assert st["consumed"] == 3
        assert st["produced"] >= 1  # prefetch may have run ahead
        imgs = [r["image"] for r in replays]
        # distinct augmentation per replay ...
        assert not np.array_equal(imgs[0], imgs[1])
        assert not np.array_equal(imgs[1], imgs[2])
        # ... of the SAME underlying content: photometric distortion is
        # monotone-ish per channel; the pixelwise rank correlation across
        # replays of one source image is far higher than across different
        # source batches
        nxt = _arrays(pipe.run())["image"]  # echo 0 of host batch 1
        def corr(a, b):
            a = a.ravel() - a.mean()
            b = b.ravel() - b.mean()
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        same_src = corr(imgs[0], imgs[1])
        diff_src = corr(imgs[0], nxt)
        assert same_src > 0.9 > diff_src, (same_src, diff_src)
    finally:
        pipe.stop()


def test_echo_epoch_yields_factor_times_batches():
    pipe1 = _build(echo_factor=1, augment=False)
    try:
        n1 = 0
        while True:
            try:
                pipe1.run()
                n1 += 1
            except StopIteration:
                break
    finally:
        pipe1.stop()
    pipe2 = _build(echo_factor=2, augment=False)
    try:
        n2 = 0
        while True:
            try:
                pipe2.run()
                n2 += 1
            except StopIteration:
                break
    finally:
        pipe2.stop()
    assert n1 > 0 and n2 == 2 * n1


def test_echo_without_augmentation_replays_identically_and_warns():
    import warnings as _w

    # no device-placed steps -> example echoing (identical replays): allowed
    # but flagged, since the feature's diversity benefit needs device augment
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        pipe = _build(echo_factor=2, augment=False)
    assert any("device-placed step" in str(w.message) for w in caught)
    try:
        a = _arrays(pipe.run())
        b = _arrays(pipe.run())
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    finally:
        pipe.stop()

    # with a device augmentation step the warning must NOT fire
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        p = _build(echo_factor=2, augment=True)
    assert not any("device-placed step" in str(w.message) for w in caught)
    p.stop()


def test_echo_factor_validation():
    inp = ShuffledShardedInputCallable(
        SyntheticProvider(), batch_size=2, shuffle=False
    )
    definition = PipelineDefinition(
        inp, _steps(), copy_external_source_passthrough_outputs=False
    )
    with pytest.raises(ValueError, match="echo_factor"):
        definition.get_pipeline(batch_size=2, num_threads=1, echo_factor=0)


def test_echo_stream_is_deterministic():
    a = _build(echo_factor=2)
    b = _build(echo_factor=2)
    try:
        for _ in range(4):
            x, y = _arrays(a.run()), _arrays(b.run())
            for k in x:
                np.testing.assert_array_equal(x[k], y[k])
    finally:
        a.stop()
        b.stop()


@pytest.mark.parametrize("consume", [1, 2, 3, 4, 5])
def test_echo_mid_resume_bitwise(consume):
    """Resume from every sub-position of an echo_factor=3 stream: the
    continuation is bit-identical to the uninterrupted run (mid-echo
    replays are NOT re-delivered, later ones are)."""
    ref = _build(echo_factor=3)
    try:
        stream = [_arrays(ref.run()) for _ in range(8)]
    finally:
        ref.stop()

    pipe = _build(echo_factor=3)
    try:
        for i in range(consume):
            got = _arrays(pipe.run())
            for k in got:
                np.testing.assert_array_equal(got[k], stream[i][k])
        state = pipe.get_state()
    finally:
        pipe.stop()

    import json

    state = json.loads(json.dumps(state))  # checkpoint-file roundtrip
    fresh = _build(echo_factor=3)
    try:
        fresh.set_state(state)
        for i in range(consume, 8):
            got = _arrays(fresh.run())
            for k in got:
                np.testing.assert_array_equal(
                    got[k], stream[i][k], err_msg=f"batch {i} field {k}"
                )
    finally:
        fresh.stop()


def test_echo_checkpoint_factor_mismatch_rejected():
    pipe = _build(echo_factor=2)
    try:
        pipe.run()
        state = pipe.get_state()
    finally:
        pipe.stop()
    other = _build(echo_factor=3)
    try:
        with pytest.raises(ValueError, match="echo_factor"):
            other.set_state(state)
    finally:
        other.stop()
    plain = _build(echo_factor=1)
    try:
        with pytest.raises(ValueError, match="echo_factor"):
            plain.set_state(state)
    finally:
        plain.stop()


@pytest.mark.parametrize("echo", [1, 3])
def test_resume_protocol_randomized(echo):
    """Randomized interleavings of run/reset/get_state against the oracle
    stream: any state captured at consumed position k must, on a FRESH
    pipeline, reproduce the uninterrupted stream from position k onward.
    (Epoch boundaries, mid-echo positions, and prefetch depth all land at
    random points.)"""
    rng = np.random.default_rng(1234 + echo)

    def oracle_stream():
        """The uninterrupted delivery stream as (epoch-relative) batches,
        across 3 epochs."""
        pipe = _build(echo_factor=echo, depth=3)
        stream = []
        try:
            for _ in range(3):  # epochs
                while True:
                    try:
                        stream.append(_arrays(pipe.run()))
                    except StopIteration:
                        break
                pipe.reset()
        finally:
            pipe.stop()
        return stream

    stream = oracle_stream()
    per_epoch = len(stream) // 3

    pipe = _build(echo_factor=echo, depth=3)
    pos = 0  # position in the uninterrupted stream
    captured = []  # (state, pos)
    try:
        for _ in range(30):
            op = rng.choice(["run", "state", "reset_at_end"])
            if op == "run":
                try:
                    got = _arrays(pipe.run())
                except StopIteration:
                    pipe.reset()
                    continue
                exp = stream[pos]
                for k in exp:
                    np.testing.assert_array_equal(got[k], exp[k], err_msg=f"pos {pos}")
                pos += 1
                if pos >= len(stream):
                    break
            elif op == "state":
                if pos % per_epoch or pos == 0:  # capture only mid-epoch
                    captured.append((pipe.get_state(), pos))
            else:
                # reset mid-epoch = drop the rest of the epoch; the oracle
                # position jumps to the next epoch boundary
                if pos % per_epoch:
                    pipe.reset()
                    pos = min(((pos // per_epoch) + 1) * per_epoch, len(stream))
                    if pos >= len(stream):
                        break
    finally:
        pipe.stop()

    assert captured, "randomized walk captured no states"
    for state, k in captured[:6]:
        fresh = _build(echo_factor=echo, depth=3)
        try:
            fresh.set_state(state)
            for i in range(k, min(k + 3, len(stream))):
                try:
                    got = _arrays(fresh.run())
                except StopIteration:  # crossed an epoch boundary, like the oracle
                    fresh.reset()
                    got = _arrays(fresh.run())
                for f in stream[i]:
                    np.testing.assert_array_equal(
                        got[f], stream[i][f], err_msg=f"resume@{k} pos {i}"
                    )
        finally:
            fresh.stop()


def test_echo_with_process_workers():
    """echo_factor composes with worker_mode='process' (spawned host
    workers): replays differ, stream deterministic."""

    def build():
        inp = ShuffledShardedInputCallable(
            SyntheticProvider(n=16), batch_size=4, shuffle=True
        )
        definition = PipelineDefinition(
            inp, _steps(True), copy_external_source_passthrough_outputs=False
        )
        return definition.get_pipeline(
            batch_size=4, num_threads=2, seed=11, echo_factor=2,
            worker_mode="process",
        )

    a = build()
    b = build()
    try:
        x0, x1 = _arrays(a.run()), _arrays(a.run())
        assert not np.array_equal(x0["image"], x1["image"])
        y0, y1 = _arrays(b.run()), _arrays(b.run())
        for k in x0:
            np.testing.assert_array_equal(x0[k], y0[k])
            np.testing.assert_array_equal(x1[k], y1[k])
    finally:
        a.stop()
        b.stop()


def test_echo_with_mesh_sharded_batches():
    """echo_factor composes with mesh placement: replays stay sharded over
    the data axis, differ in augmentation, and skip the re-transfer (the
    replayed batch is already device-resident)."""
    from jax.sharding import PartitionSpec as P

    from accvlab_tpu.parallel import make_mesh

    inp = ShuffledShardedInputCallable(
        SyntheticProvider(n=16), batch_size=8, shuffle=True
    )
    definition = PipelineDefinition(
        inp, _steps(True), copy_external_source_passthrough_outputs=False
    )
    mesh = make_mesh()
    pipe = definition.get_pipeline(
        batch_size=8, num_threads=2, seed=11, mesh=mesh, echo_factor=2
    )
    try:
        a = pipe.run()["image"]
        b = pipe.run()["image"]
        from jax.sharding import NamedSharding

        want = NamedSharding(mesh, P("data", None, None, None))
        assert a.sharding.is_equivalent_to(want, a.ndim)
        assert b.sharding.is_equivalent_to(want, b.ndim)
        assert not np.array_equal(np.asarray(a), np.asarray(b))
        st = pipe.stats()
        assert st["consumed"] == 2 and st["produced"] >= 1
    finally:
        pipe.stop()


def test_pipeline_length_reflects_echo():
    p1 = _build(echo_factor=1, augment=False)
    p3 = _build(echo_factor=3, augment=False)
    try:
        assert p1.length == 4  # 16 samples / batch 4
        assert p3.length == 12
        # the advertised length matches the actual delivered count
        n = 0
        while True:
            try:
                p3.run()
                n += 1
            except StopIteration:
                break
        assert n == p3.length
    finally:
        p1.stop()
        p3.stop()
