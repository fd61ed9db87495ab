"""The composed production story: mesh-sharded pipeline -> jit training ->
orbax checkpoint (params + opt state + consumed pipeline position) ->
simulated preemption -> fresh rebuild -> bit-identical continuation.

Model: the round-3 resume protocol (tests/test_pipeline_resume.py pins the
pipeline-level contract; this pins the whole-loop composition on the
8-device virtual mesh, including the orbax round trip and epoch-crossing)."""

import pathlib
import sys

import numpy as np


def test_preempt_resume_bit_identical(tmp_path):
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))
    import preemptible_training as ex

    ref_losses, res_losses = ex.main(num_steps=6, preempt_after=3,
                                     workdir=str(tmp_path))
    assert len(ref_losses) == 6 and len(res_losses) == 3
    np.testing.assert_array_equal(
        np.asarray(ref_losses[3:], np.float32), np.asarray(res_losses, np.float32)
    )
    assert all(np.isfinite(l) for l in ref_losses)


def test_elastic_data_stanza():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))
    import preemptible_training as ex

    # asserts internally: 28/32 samples consumed exactly once across the
    # 2-shard -> 3-shard fleet change
    ex.elastic_data_stanza()
