"""Processing-step tests with scripted randomness (model: reference per-step
tests + the DaliFakeRandomGenerator injection pattern)."""

import numpy as np
import pytest

from accvlab_tpu.pipeline import DType, SampleDataGroup, ScriptedRandomContext
from accvlab_tpu.pipeline.processing_steps import (
    AffineTransformer,
    AnnotationElementConditionEval,
    ConditionalElementRemover,
    CoordinateCropper,
    DataGroupsWithNameAppliedStep,
    PhotoMetricDistorter,
    PointsInRangeCheck,
    VisibleBboxSelector,
)


def make_sample(with_objects=True):
    sdg = SampleDataGroup()
    sdg.add_data_field("image", DType.UINT8)
    sdg.add_data_field("image_hw", DType.INT32)
    ann = SampleDataGroup()
    ann.add_data_field("bboxes", DType.FLOAT)
    ann.add_data_field("depths", DType.FLOAT)
    ann.add_data_field("visibility", DType.FLOAT)
    sdg.add_data_group_field("annotations", ann)
    sdg["image"] = np.random.default_rng(0).integers(0, 255, (16, 20, 3)).astype(np.uint8)
    sdg["image_hw"] = np.array([16, 20], np.int32)
    if with_objects:
        sdg["annotations"]["bboxes"] = np.array(
            [[2.0, 2.0, 8.0, 9.0], [3.0, 3.0, 7.0, 8.0], [15.0, 10.0, 19.0, 15.0]],
            np.float32,
        )
        sdg["annotations"]["depths"] = np.array([5.0, 2.0, 7.0], np.float32)
        sdg["annotations"]["visibility"] = np.array([0.9, 0.1, 0.5], np.float32)
    return sdg


# --------------------------- condition eval ---------------------------- #


def test_condition_eval():
    sdg = make_sample()
    step = AnnotationElementConditionEval(
        "annotations", "is_valid = visibility > 0.4 and depths < 6", False
    )
    out = step(sdg)
    np.testing.assert_array_equal(
        np.asarray(out["annotations"]["is_valid"]), [True, False, False]
    )


def test_condition_eval_complex():
    sdg = make_sample()
    step = AnnotationElementConditionEval(
        "annotations", "keep = (visibility > 0.4 or depths < 3) and not (depths == 7)", False
    )
    out = step(sdg)
    np.testing.assert_array_equal(np.asarray(out["annotations"]["keep"]), [True, True, False])


def test_condition_eval_removes_used_fields():
    sdg = make_sample()
    step = AnnotationElementConditionEval("annotations", "v = visibility >= 0.5", True)
    out = step(sdg)
    assert not out["annotations"].has_child("visibility")
    assert out["annotations"].has_child("v")


def test_condition_eval_missing_field_raises():
    sdg = make_sample()
    step = AnnotationElementConditionEval("annotations", "v = nonexistent > 1", False)
    with pytest.raises(KeyError):
        step.check_input_data_format_and_set_output_data_format(sdg.get_empty_like_self())


# --------------------------- selection steps --------------------------- #


def test_coordinate_cropper():
    sdg = make_sample()
    step = CoordinateCropper("bboxes", [0.0, 0.0, 0.0, 0.0], [18.0, 12.0, 18.0, 12.0])
    out = step(sdg)
    b = np.asarray(out["annotations"]["bboxes"])
    assert b.max() <= 18.0
    assert b[2, 3] == 12.0  # clipped


def test_points_in_range_check():
    sdg = make_sample()
    step = PointsInRangeCheck("bboxes", "inside", [0, 0, 0, 0], [10, 10, 10, 10])
    out = step(sdg)
    np.testing.assert_array_equal(
        np.asarray(out["annotations"]["inside"]), [True, True, False]
    )


def test_visible_bbox_selector_occlusion():
    sdg = make_sample()
    # box 1 (depth 2) sits inside box 0 (depth 5): box 0 is mostly occluded? No
    # — box 1 is nearer and covers the center of box 0; box 0 still has visible
    # border pixels, box 2 is far but unoccluded.
    step = VisibleBboxSelector(
        "bboxes",
        "visible",
        image_hw_field_name="image_hw",
        depths_field_name="depths",
        check_for_minimum_size=False,
    )
    out = step(sdg)
    vis = np.asarray(out["visible"])
    assert vis[1]  # nearest box always visible
    assert vis[0]  # border ring still visible
    assert vis[2]  # partially in image, unoccluded


def test_visible_bbox_selector_full_occlusion():
    sdg = make_sample()
    sdg["annotations"]["bboxes"] = np.array(
        [[2.0, 2.0, 8.0, 9.0], [2.0, 2.0, 8.0, 9.0]], np.float32
    )
    sdg["annotations"]["depths"] = np.array([5.0, 2.0], np.float32)
    sdg["annotations"]["visibility"] = np.array([1.0, 1.0], np.float32)
    step = VisibleBboxSelector(
        "bboxes",
        "visible",
        image_hw_field_name="image_hw",
        depths_field_name="depths",
        check_for_minimum_size=False,
    )
    out = step(sdg)
    np.testing.assert_array_equal(np.asarray(out["visible"]), [False, True])


def test_visible_bbox_selector_min_size():
    sdg = make_sample()
    step = VisibleBboxSelector(
        "bboxes",
        "big_enough",
        image_hw=[16, 20],
        check_for_bbox_occlusion=False,
        minimum_bbox_size=5.0,
    )
    out = step(sdg)
    np.testing.assert_array_equal(np.asarray(out["big_enough"]), [True, False, False])


def test_conditional_element_remover():
    sdg = make_sample()
    sdg["annotations"].add_data_field("keep", DType.BOOL)
    sdg["annotations"]["keep"] = np.array([True, False, True])
    step = ConditionalElementRemover(
        "annotations", "keep", ["bboxes", "depths", "visibility"], [0, 0, 0],
        remove_mask_field=True,
    )
    out = step(sdg)
    assert np.asarray(out["annotations"]["bboxes"]).shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(out["annotations"]["depths"]), [5.0, 7.0])
    assert not out["annotations"].has_child("keep")


# ------------------------- photometric distorter ----------------------- #


def test_photometric_brightness_only():
    sdg = make_sample(with_objects=False)
    sdg.remove_field("annotations")
    step = PhotoMetricDistorter(
        "image",
        min_max_brightness=[10.0, 10.0],
        min_max_hue=[0.0, 0.0],
        min_max_contrast=[1.0, 1.0],
        min_max_saturation=[1.0, 1.0],
        prob_brightness_aug=1.0,
        prob_hue_aug=0.0,
        prob_contrast_aug=0.0,
        prob_saturation_aug=0.0,
        prob_swap_channels=0.0,
    )
    rng = ScriptedRandomContext()
    rng.script_uniform(0.0, 1.0, [0.5, 0.5, 0.5, 0.5, 0.5])  # gates
    rng.script_randint(0, 2, [0])  # contrast mode
    rng.script_randint(0, 6, [0])  # permutation index
    step.set_random_context(rng)
    before = np.asarray(sdg["image"], np.float32)
    out = step(sdg)
    after = np.asarray(out["image"], np.float32)
    # brightness delta 10 (uint8 scale), clipped at 255
    np.testing.assert_allclose(after, np.clip(before + 10, 0, 255), atol=1.0)


def test_photometric_channel_swap():
    sdg = make_sample(with_objects=False)
    sdg.remove_field("annotations")
    step = PhotoMetricDistorter(
        "image",
        min_max_brightness=[0.0, 0.0],
        min_max_hue=[0.0, 0.0],
        min_max_contrast=[1.0, 1.0],
        min_max_saturation=[1.0, 1.0],
        prob_brightness_aug=0.0,
        prob_hue_aug=0.0,
        prob_contrast_aug=0.0,
        prob_saturation_aug=0.0,
        prob_swap_channels=1.0,
    )
    rng = ScriptedRandomContext()
    rng.script_uniform(0.0, 1.0, [0.5] * 5)
    rng.script_randint(0, 2, [0])
    rng.script_randint(0, 6, [3])  # permutation [2, 1, 0] -> reverse channels
    step.set_random_context(rng)
    before = np.asarray(sdg["image"])
    out = step(sdg)
    np.testing.assert_allclose(
        np.asarray(out["image"]), before[..., ::-1], atol=1.0
    )


# --------------------------- affine transformer ------------------------ #


def affine_sample():
    sdg = SampleDataGroup()
    sdg.add_data_field("image", DType.FLOAT)
    sdg.add_data_field("points", DType.FLOAT)
    sdg.add_data_field("proj", DType.FLOAT)
    img = np.zeros((8, 10, 1), np.float32)
    img[2, 3] = 1.0
    sdg["image"] = img
    sdg["points"] = np.array([[3.0, 2.0]], np.float32)  # x, y of the bright pixel
    sdg["proj"] = np.eye(3, dtype=np.float32)
    return sdg


def test_affine_stretch_resize_consistency():
    sdg = affine_sample()
    step = AffineTransformer(
        output_hw=(16, 20),
        resizing_mode=AffineTransformer.ResizingMode.STRETCH,
        image_field_names="image",
        point_field_names="points",
        projection_matrix_field_names="proj",
    )
    step.set_random_context(ScriptedRandomContext())
    out = step(sdg)
    img = np.asarray(out["image"])
    pts = np.asarray(out["points"])
    assert img.shape == (16, 20, 1)
    # the point moved with the image: scale x2 -> (6, 4)
    np.testing.assert_allclose(pts[0], [6.0, 4.0], atol=1e-5)
    # image content near the transformed point location is bright
    y, x = int(round(pts[0][1])), int(round(pts[0][0]))
    assert img[y, x, 0] > 0.2
    # projection matrix got the same post-transform
    proj = np.asarray(out["proj"])
    np.testing.assert_allclose(proj[0, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(proj[1, 1], 2.0, atol=1e-5)


def test_affine_translation_step():
    sdg = affine_sample()
    step = AffineTransformer(
        output_hw=(8, 10),
        resizing_mode=AffineTransformer.ResizingMode.STRETCH,
        image_field_names="image",
        point_field_names="points",
        transformation_steps=[AffineTransformer.Translation(1.0, [2.0, 1.0])],
    )
    step.set_random_context(ScriptedRandomContext())
    out = step(sdg)
    np.testing.assert_allclose(np.asarray(out["points"])[0], [5.0, 3.0], atol=1e-5)
    img = np.asarray(out["image"])
    assert img[3, 5, 0] > 0.9  # pixel moved by (+2, +1)


def test_affine_rotation_point_image_consistency():
    sdg = affine_sample()
    step = AffineTransformer(
        output_hw=(8, 10),
        resizing_mode=AffineTransformer.ResizingMode.STRETCH,
        image_field_names="image",
        point_field_names="points",
        transformation_steps=[AffineTransformer.Rotation(1.0, 90.0)],
    )
    step.set_random_context(ScriptedRandomContext())
    out = step(sdg)
    pts = np.asarray(out["points"])[0]
    img = np.asarray(out["image"])
    y, x = int(round(pts[1])), int(round(pts[0]))
    if 0 <= y < 8 and 0 <= x < 10:
        assert img[y, x, 0] > 0.2  # image follows the points


def test_affine_probability_gate():
    sdg = affine_sample()
    step = AffineTransformer(
        output_hw=(8, 10),
        resizing_mode=AffineTransformer.ResizingMode.STRETCH,
        image_field_names="image",
        point_field_names="points",
        transformation_steps=[AffineTransformer.Translation(0.5, [4.0, 0.0])],
    )
    rng = ScriptedRandomContext()
    rng.script_uniform(0.0, 1.0, [0.9])  # gate fails (0.9 >= 0.5)
    step.set_random_context(rng)
    out = step(sdg)
    np.testing.assert_allclose(np.asarray(out["points"])[0], [3.0, 2.0], atol=1e-5)


def test_affine_ordering_constraint():
    with pytest.raises(ValueError):
        AffineTransformer(
            output_hw=(8, 10),
            resizing_mode=AffineTransformer.ResizingMode.STRETCH,
            image_field_names="image",
            transformation_steps=[
                AffineTransformer.Rotation(0.5, 10.0),
                AffineTransformer.ShiftInsideOriginalImage(1.0, True, True),
            ],
        )


def test_affine_pad_mode_centers():
    sdg = affine_sample()
    step = AffineTransformer(
        output_hw=(20, 20),
        resizing_mode=AffineTransformer.ResizingMode.PAD,
        resizing_anchor=AffineTransformer.ResizingAnchor.CENTER,
        image_field_names="image",
        point_field_names="points",
    )
    step.set_random_context(ScriptedRandomContext())
    out = step(sdg)
    # scale = min(20/8, 20/10) = 2; image becomes 16x20, centered -> y shift 2
    np.testing.assert_allclose(np.asarray(out["points"])[0], [6.0, 6.0], atol=1e-5)


# --------------------------- wrapper steps ----------------------------- #


def test_wrapper_independent_application():
    cam = SampleDataGroup()
    cam.add_data_field("points", DType.FLOAT)
    root = SampleDataGroup()
    root.add_data_group_field("cam_a", cam)
    root.add_data_group_field("cam_b", cam)
    root["cam_a"]["points"] = np.array([[1.0, 1.0]], np.float32)
    root["cam_b"]["points"] = np.array([[1.0, 1.0]], np.float32)

    inner = CoordinateCropper("points", [0.0, 0.0], [0.5, 0.5])
    wrapper = DataGroupsWithNameAppliedStep(inner, ["cam_a", "cam_b"])
    out = wrapper(root)
    np.testing.assert_allclose(np.asarray(out["cam_a"]["points"])[0], [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(out["cam_b"]["points"])[0], [0.5, 0.5])


def test_wrapper_blueprint_inference():
    cam = SampleDataGroup()
    cam.add_data_field("points", DType.FLOAT)
    root = SampleDataGroup()
    root.add_data_group_field("cam_a", cam)
    inner = PointsInRangeCheck("points", "inside", [0, 0], [1, 1])
    wrapper = DataGroupsWithNameAppliedStep(inner, "cam_a")
    bp = wrapper.check_input_data_format_and_set_output_data_format(root)
    assert bp["cam_a"].has_child("inside")


def test_padding_to_uniform_with_size_buckets():
    from accvlab_tpu.pipeline.processing_steps import PaddingToUniform

    def mk(n):
        s = SampleDataGroup()
        s.add_data_field("boxes", DType.FLOAT)
        s["boxes"] = np.ones((n, 4), np.float32)
        return s

    step = PaddingToUniform("boxes", fill_value=-1.0, size_buckets=[8, 16, 32])
    out = step.process_batch_checked([mk(3), mk(5)], check=False)
    # max 5 -> bucket 8 (second dim 4 -> bucket 8 as well: buckets apply per dim)
    assert np.asarray(out[0]["boxes"]).shape == (8, 8)
    assert np.asarray(out[0]["boxes"])[4, 0] == -1.0

    step2 = PaddingToUniform("boxes", size_buckets=[64])
    out2 = step2.process_batch_checked([mk(3)], check=False)
    assert np.asarray(out2[0]["boxes"]).shape == (64, 64)


from accvlab_tpu.pipeline.processing_steps import PipelineStepBase as _StepBase


class _AddRandomOffset(_StepBase):
    """Test step: add ONE random draw to 'points' in its input sub-tree
    (mirrors the reference's _ReplaceFieldsByNameWithRandom pattern,
    data_group_array_in_path_elements_applied_step_test.py)."""

    placement = "host"

    def _check_and_adjust_data_format_input_to_output(self, fmt):
        return fmt

    def _process(self, sdg):
        off = float(self.random.uniform(0.0, 1.0))
        sdg["points"] = np.asarray(sdg["points"]) + off
        return sdg


def _array_root():
    from accvlab_tpu.pipeline import SampleDataGroup as SDG

    cam = SDG()
    cam.add_data_field("points", DType.FLOAT)
    root = SDG()
    root.add_data_group_field_array("cams", cam, 3)
    root.add_data_field("untouched", DType.FLOAT)
    for i in range(3):
        root["cams"][i]["points"] = np.zeros((2,), np.float32)
    root["untouched"] = np.zeros((2,), np.float32)
    return root


def test_array_in_path_elements_applied_step_independent_random():
    """Each array element must get an INDEPENDENT random draw (reference
    semantics: per-child re-randomization)."""
    from accvlab_tpu.pipeline import ScriptedRandomContext
    from accvlab_tpu.pipeline.processing_steps import (
        DataGroupArrayInPathElementsAppliedStep,
    )

    root = _array_root()
    ctx = ScriptedRandomContext()
    ctx.script_uniform(0.0, 1.0, [0.1, 0.2, 0.3])
    wrapper = DataGroupArrayInPathElementsAppliedStep(_AddRandomOffset(), "cams")
    wrapper.set_random_context(ctx)
    out = wrapper(root)
    vals = [float(np.asarray(out["cams"][i]["points"])[0]) for i in range(3)]
    assert vals == pytest.approx([0.1, 0.2, 0.3])  # three distinct draws
    np.testing.assert_array_equal(np.asarray(out["untouched"]), 0.0)


def test_array_with_name_elements_applied_step():
    from accvlab_tpu.pipeline import ScriptedRandomContext
    from accvlab_tpu.pipeline.processing_steps import (
        DataGroupArrayWithNameElementsAppliedStep,
    )

    root = _array_root()
    ctx = ScriptedRandomContext()
    ctx.script_uniform(0.0, 1.0, [0.5, 0.6, 0.7])
    wrapper = DataGroupArrayWithNameElementsAppliedStep(_AddRandomOffset(), "cams")
    wrapper.set_random_context(ctx)
    out = wrapper(root)
    vals = [float(np.asarray(out["cams"][i]["points"])[0]) for i in range(3)]
    assert vals == pytest.approx([0.5, 0.6, 0.7])


def test_in_path_applied_step_scopes_to_subtree():
    """DataGroupInPathAppliedStep applies ONCE to the given sub-tree; one
    draw, fields outside the path untouched."""
    from accvlab_tpu.pipeline import ScriptedRandomContext
    from accvlab_tpu.pipeline.processing_steps import DataGroupInPathAppliedStep

    root = _array_root()
    ctx = ScriptedRandomContext()
    ctx.script_uniform(0.0, 1.0, [0.9, 0.8])
    wrapper = DataGroupInPathAppliedStep(_AddRandomOffset(), ("cams", 1))
    wrapper.set_random_context(ctx)
    out = wrapper(root)
    assert float(np.asarray(out["cams"][1]["points"])[0]) == pytest.approx(0.9)
    np.testing.assert_array_equal(np.asarray(out["cams"][0]["points"]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["cams"][2]["points"]), 0.0)


@pytest.mark.parametrize("seed", range(8))
def test_affine_random_composition_point_image_consistency(seed):
    """Random rotation+scaling+translation compositions: annotation points
    keep tracking the bright pixel through the composed warp (the invariant
    the reference's affine_transformer_test parametrizes over)."""
    rng = np.random.default_rng(seed)
    angle = float(rng.uniform(-60, 60))
    scale = float(rng.uniform(0.7, 1.4))
    shift = [float(rng.uniform(-2, 2)), float(rng.uniform(-2, 2))]

    sdg = affine_sample()
    # a larger image with an isolated bright pixel away from the border
    img = np.zeros((16, 20, 1), np.float32)
    img[7, 9] = 1.0
    sdg["image"] = img
    sdg["points"] = np.array([[9.0, 7.0]], np.float32)

    step = AffineTransformer(
        output_hw=(16, 20),
        resizing_mode=AffineTransformer.ResizingMode.STRETCH,
        image_field_names="image",
        point_field_names="points",
        transformation_steps=[
            AffineTransformer.Rotation(1.0, angle),
            AffineTransformer.UniformScaling(1.0, scale),
            AffineTransformer.Translation(1.0, shift),
        ],
    )
    ctx = ScriptedRandomContext()
    step.set_random_context(ctx)
    out = step(sdg)
    pts = np.asarray(out["points"])[0]
    img_out = np.asarray(out["image"])[..., 0]
    x, y = float(pts[0]), float(pts[1])
    if 1 <= y < 15 and 1 <= x < 19:
        # mass near the transformed point (bilinear spread over <=2px)
        yi, xi = int(round(y)), int(round(x))
        patch = img_out[max(0, yi - 2) : yi + 3, max(0, xi - 2) : xi + 3]
        assert patch.max() > 0.05, (
            f"seed {seed}: warped pixel not found near mapped point "
            f"({x:.2f},{y:.2f}); angle={angle:.1f} scale={scale:.2f} shift={shift}"
        )
        # and almost no mass far away from the point
        far = img_out.copy()
        far[max(0, yi - 3) : yi + 4, max(0, xi - 3) : xi + 4] = 0.0
        assert far.max() < 0.05


@pytest.mark.parametrize("seed", range(6))
def test_photometric_determinism_and_validity(seed):
    """Random device-key draws: same key -> identical output; output stays
    finite and shape-preserving for any gate combination."""
    import jax
    from accvlab_tpu.pipeline.processing_steps import PhotoMetricDistorter
    from accvlab_tpu.pipeline.random_context import DeviceRandomContext

    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (10, 12, 3)).astype(np.float32)
    sdg = SampleDataGroup()
    sdg.add_data_field("image", DType.FLOAT)

    step = PhotoMetricDistorter(
        "image",
        min_max_brightness=[-0.2, 0.2],
        min_max_hue=[-20.0, 20.0],
        min_max_contrast=[0.7, 1.3],
        min_max_saturation=[0.7, 1.3],
    )

    def run(key):
        import jax.numpy as jnp

        s = SampleDataGroup()
        s.add_data_field("image", DType.FLOAT)
        s["image"] = jnp.asarray(img)
        step.set_random_context(DeviceRandomContext(jax.random.PRNGKey(key)))
        return np.asarray(step(s)["image"])

    a, b = run(seed), run(seed)
    np.testing.assert_array_equal(a, b)  # same key -> bit-identical
    c = run(seed + 1000)
    assert a.shape == c.shape == img.shape
    assert np.isfinite(a).all() and np.isfinite(c).all()
    assert not np.array_equal(a, c) or np.array_equal(a, img)  # different keys differ (unless all gates failed)


def test_random_context_is_thread_local():
    """Regression: RandomContext was plain instance state on SHARED step
    instances while the executor runs samples concurrently — thread A could
    read thread B's generator. Contexts must be isolated per thread."""
    import threading

    import numpy as np

    from accvlab_tpu.pipeline import HostRandomContext
    from accvlab_tpu.pipeline.processing_steps.pipeline_step_base import PipelineStepBase

    class Probe(PipelineStepBase):
        placement = "host"

        def _check_and_adjust_data_format_input_to_output(self, data_empty):
            return data_empty

        def _process(self, data):
            return data

    step = Probe()
    barrier = threading.Barrier(4)
    results = {}

    def worker(tid):
        ctx = HostRandomContext(np.random.default_rng(tid))
        step.set_random_context(ctx)
        barrier.wait()  # everyone has injected their own context
        got = step.random
        results[tid] = got is ctx

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert all(results.values()), results
    # a thread that never injected must not see someone else's context
    seen = {}

    def never_injected():
        try:
            step.random
            seen["leaked"] = True
        except AssertionError:
            seen["leaked"] = False

    th = threading.Thread(target=never_injected)
    th.start(); th.join()
    assert seen["leaked"] is False
