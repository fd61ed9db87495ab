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


def test_chained_artifacts_preprocess_then_model(tmp_path):
    """The full serving-host story with NO training code: the pipeline's
    preprocess program and a model program ship as two artifacts; the
    serving host loads both and chains them, and the result equals the
    in-process pipeline + model composition on the same host leaves."""
    from accvlab_tpu.models.serving import save_inference

    pipe = _delivered_pipeline()
    try:
        pre_path = str(tmp_path / "preprocess.accvserve")
        header = pipe.export_device_program(pre_path)
        img_idx = header["pipeline_output_fields"].index("image")

        batch_spec, _ = pipe._last_device_spec
        rng = np.random.default_rng(1)
        leaves = tuple(
            (rng.random(s.shape) * 200).astype(s.dtype)
            if np.issubdtype(s.dtype, np.floating)
            else rng.integers(0, 200, s.shape).astype(s.dtype)
            for s in batch_spec
        )
        key = jax.random.PRNGKey(11)

        # train-side: a tiny "model" exported over the PREPROCESSED shape
        pre_out = jax.jit(pipe._make_device_fn_all())(leaves, key)
        img_example = np.asarray(pre_out[img_idx])
        w = np.float32(0.5)

        def model_apply(p, img):
            return {"score": jnp.mean(img * p, axis=(1, 2, 3))}

        model_path = str(tmp_path / "model.accvserve")
        save_inference(model_path, model_apply, jnp.asarray(w), img_example)
    finally:
        pipe.stop()

    # ---- serving host: two artifact files, no pipeline/model code ---- #
    pre = load_inference(pre_path)
    model = load_inference(model_path)
    feats = pre(leaves, key)
    served = model(feats[img_idx])
    want = model_apply(w, pre_out[img_idx])
    np.testing.assert_allclose(
        np.asarray(served["score"]), np.asarray(want["score"]), rtol=1e-6
    )
