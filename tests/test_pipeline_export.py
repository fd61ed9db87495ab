"""Fused-device-program export (``TPUPipeline.export_device_program``).

The serving counterpart of ``device_program_text``: the EXACT preprocess
program the training pipeline ran ships as a ``models/serving.py``
artifact, so a serving host reproduces training-time preprocessing
bit-for-bit without pipeline code."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accvlab_tpu.models.serving import load_inference, read_artifact_info
from tests.test_pipeline_trace import build_pipeline  # has device-placed steps


def _delivered_pipeline():
    pipe = build_pipeline()
    pipe.run()  # builds the device program for this batch shape
    return pipe


def test_export_roundtrips_bit_exact(tmp_path):
    pipe = _delivered_pipeline()
    try:
        path = str(tmp_path / "preprocess.accvserve")
        header = pipe.export_device_program(path)
        assert os.path.exists(path)
        assert header["pipeline_input_fields"] == list(
            pipe._host_out_blueprint.field_names_flat
        )
        assert header["pipeline_output_fields"]
        assert read_artifact_info(path)["nr_devices"] == 1

        batch_spec, key_spec = pipe._last_device_spec
        rng = np.random.default_rng(0)
        leaves = tuple(
            (rng.random(s.shape) * 200).astype(s.dtype)
            if np.issubdtype(s.dtype, np.floating)
            else rng.integers(0, 200, s.shape).astype(s.dtype)
            for s in batch_spec
        )
        key = jax.random.PRNGKey(3)

        serve = load_inference(path)
        got = serve(leaves, key)
        # the exact same program, run directly from the pipeline's builder
        want = jax.jit(pipe._make_device_fn_all())(leaves, key)
        assert len(got) == len(want) == len(header["pipeline_output_fields"])
        for g, w, name in zip(got, want, header["pipeline_output_fields"]):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=name
            )
    finally:
        pipe.stop()


def test_export_returns_bytes_without_path():
    pipe = _delivered_pipeline()
    try:
        data = pipe.export_device_program()
        assert isinstance(data, bytes)
        info = read_artifact_info(data)
        assert info["pipeline_input_fields"]
        assert load_inference(data) is not None
    finally:
        pipe.stop()


def test_export_before_first_batch_raises():
    pipe = build_pipeline()
    try:
        with pytest.raises(RuntimeError, match="deliver at least one batch"):
            pipe.export_device_program()
    finally:
        pipe.stop()


def test_export_without_device_steps_raises():
    from tests.test_pipeline_end_to_end import build_pipeline as build_host_only

    # the default e2e fixture places every step on the host
    _, pipe = build_host_only()
    try:
        pipe.run()
        with pytest.raises(RuntimeError, match="no device-placed steps"):
            pipe.export_device_program()
    finally:
        pipe.stop()
