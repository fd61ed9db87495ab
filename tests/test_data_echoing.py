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
