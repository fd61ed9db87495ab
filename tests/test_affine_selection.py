"""AffineTransformer.Selection + scripted-randomness coverage."""

import numpy as np
import pytest

from accvlab_tpu.pipeline import DType, SampleDataGroup, ScriptedRandomContext
from accvlab_tpu.pipeline.processing_steps import AffineTransformer


def sample():
    sdg = SampleDataGroup()
    sdg.add_data_field("points", DType.FLOAT)
    sdg.add_data_field("image_hw", DType.INT32)
    sdg["points"] = np.array([[2.0, 2.0]], np.float32)
    sdg["image_hw"] = np.array([8, 10], np.int32)
    return sdg


def run_with(steps, scripted):
    step = AffineTransformer(
        output_hw=(8, 10),
        resizing_mode=AffineTransformer.ResizingMode.STRETCH,
        image_hw_field_names="image_hw",
        point_field_names="points",
        transformation_steps=steps,
    )
    step.set_random_context(scripted)
    return step(sample())


def test_selection_picks_first_option():
    sel = AffineTransformer.Selection(
        1.0,
        option_probs=[0.5, 0.5],
        options=[
            AffineTransformer.Translation(1.0, [3.0, 0.0]),
            AffineTransformer.Translation(1.0, [0.0, 3.0]),
        ],
    )
    rng = ScriptedRandomContext()
    rng.script_uniform(0.0, 1.0, [0.25])  # selection draw <= 0.5 -> option 0
    out = run_with([sel], rng)
    np.testing.assert_allclose(np.asarray(out["points"])[0], [5.0, 2.0], atol=1e-5)


def test_selection_picks_second_option():
    sel = AffineTransformer.Selection(
        1.0,
        option_probs=[0.5, 0.5],
        options=[
            AffineTransformer.Translation(1.0, [3.0, 0.0]),
            AffineTransformer.Translation(1.0, [0.0, 3.0]),
        ],
    )
    rng = ScriptedRandomContext()
    rng.script_uniform(0.0, 1.0, [0.9])  # > 0.5 -> option 1
    out = run_with([sel], rng)
    np.testing.assert_allclose(np.asarray(out["points"])[0], [2.0, 5.0], atol=1e-5)


def test_selection_option_sequences_compose():
    sel = AffineTransformer.Selection(
        1.0,
        option_probs=[1.0],
        options=[[
            AffineTransformer.Translation(1.0, [1.0, 0.0]),
            AffineTransformer.Translation(1.0, [0.0, 2.0]),
        ]],
    )
    rng = ScriptedRandomContext()
    rng.script_uniform(0.0, 1.0, [0.1])
    out = run_with([sel], rng)
    np.testing.assert_allclose(np.asarray(out["points"])[0], [3.0, 4.0], atol=1e-5)


def test_selection_probs_must_sum_to_one():
    with pytest.raises(AssertionError):
        AffineTransformer.Selection(
            1.0, option_probs=[0.5, 0.2],
            options=[AffineTransformer.Translation(1.0, [0, 0])] * 2,
        )


def test_selection_propagates_ordering_constraints():
    sel = AffineTransformer.Selection(
        1.0,
        option_probs=[1.0],
        options=[AffineTransformer.Rotation(1.0, 10.0)],
    )
    with pytest.raises(ValueError):
        AffineTransformer(
            output_hw=(8, 10),
            resizing_mode=AffineTransformer.ResizingMode.STRETCH,
            image_hw_field_names="image_hw",
            transformation_steps=[
                sel,
                AffineTransformer.ShiftInsideOriginalImage(1.0, True, True),
            ],
        )


def test_image_hw_field_updated_to_output():
    out = run_with([], ScriptedRandomContext())
    np.testing.assert_array_equal(np.asarray(out["image_hw"]), [8, 10])


def test_random_range_translation_scripted():
    tr = AffineTransformer.Translation(1.0, [-4.0, -4.0], [4.0, 4.0])
    rng = ScriptedRandomContext()
    rng.script_uniform(-4.0, 4.0, [2.0, -1.0])  # tx, ty
    out = run_with([tr], rng)
    np.testing.assert_allclose(np.asarray(out["points"])[0], [4.0, 1.0], atol=1e-5)
