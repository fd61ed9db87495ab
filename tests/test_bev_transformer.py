"""BEVBBoxesTransformer3D tests (consistency of the world-coord updates)."""

import numpy as np
import pytest

from accvlab_tpu.pipeline import DType, SampleDataGroup, ScriptedRandomContext
from accvlab_tpu.pipeline.processing_steps.bev_bboxes_transformer_3d import (
    BEVBBoxesTransformer3D,
)


def make_sample():
    sdg = SampleDataGroup()
    ann = SampleDataGroup()
    ann.add_data_field("centers3d", DType.FLOAT)
    ann.add_data_field("velocities", DType.FLOAT)
    ann.add_data_field("sizes3d", DType.FLOAT)
    ann.add_data_field("yaw", DType.FLOAT)
    sdg.add_data_group_field("annotations", ann)
    sdg.add_data_field("ego_to_world", DType.FLOAT)
    sdg.add_data_field("world_to_ego", DType.FLOAT)
    sdg["annotations"]["centers3d"] = np.array([[1.0, 0.0, 0.0], [0.0, 2.0, 1.0]], np.float32)
    sdg["annotations"]["velocities"] = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    sdg["annotations"]["sizes3d"] = np.array([[2.0, 1.0, 1.5], [1.0, 1.0, 1.0]], np.float32)
    sdg["annotations"]["yaw"] = np.array([0.0, np.pi / 2], np.float32)
    sdg["ego_to_world"] = np.eye(4, dtype=np.float32)
    sdg["world_to_ego"] = np.eye(4, dtype=np.float32)
    return sdg


def make_step(rotation=None, scaling=None, translation=None):
    return BEVBBoxesTransformer3D(
        data_field_names_points="centers3d",
        data_field_names_velocities="velocities",
        data_field_names_sizes="sizes3d",
        data_field_names_orientation="yaw",
        data_field_names_proj_matrices_and_extrinsics=None,
        data_field_names_ego_to_world="ego_to_world",
        data_field_names_world_to_ego="world_to_ego",
        rotation_range=rotation,
        rotation_axis=2 if rotation else None,
        scaling_range=scaling,
        translation_max_abs=translation,
    )


def test_rotation_90deg():
    step = make_step(rotation=(np.pi / 2, np.pi / 2))
    step.set_random_context(ScriptedRandomContext())
    out = step(make_sample())
    c = np.asarray(out["annotations"]["centers3d"])
    # rotate (1,0,0) by 90deg about z -> (0,1,0)
    np.testing.assert_allclose(c[0], [0.0, 1.0, 0.0], atol=1e-5)
    v = np.asarray(out["annotations"]["velocities"])
    np.testing.assert_allclose(v[0], [0.0, 1.0, 0.0], atol=1e-5)
    yaw = np.asarray(out["annotations"]["yaw"])
    np.testing.assert_allclose(yaw[0], np.pi / 2, atol=1e-5)
    # yaw pi/2 + pi/2 = pi -> wrapped into [-pi, pi]
    assert abs(abs(yaw[1]) - np.pi) < 1e-4
    # world_to_ego updated: R @ I
    w2e = np.asarray(out["world_to_ego"])
    np.testing.assert_allclose(w2e[0, 1], -1.0, atol=1e-5)
    # ego_to_world is the inverse of world_to_ego
    e2w = np.asarray(out["ego_to_world"])
    np.testing.assert_allclose(e2w @ w2e, np.eye(4), atol=1e-5)


def test_scaling():
    step = make_step(scaling=(2.0, 2.0))
    step.set_random_context(ScriptedRandomContext())
    out = step(make_sample())
    np.testing.assert_allclose(
        np.asarray(out["annotations"]["centers3d"])[0], [2.0, 0.0, 0.0], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["annotations"]["sizes3d"])[0], [4.0, 2.0, 3.0], atol=1e-5
    )
    w2e = np.asarray(out["world_to_ego"])
    e2w = np.asarray(out["ego_to_world"])
    np.testing.assert_allclose(e2w @ w2e, np.eye(4), atol=1e-5)


def test_translation():
    step = make_step(translation=(5.0, 5.0, 5.0))
    rng = ScriptedRandomContext()
    rng.script_uniform(-5.0, 5.0, [1.0, 2.0, 3.0])
    step.set_random_context(rng)
    out = step(make_sample())
    np.testing.assert_allclose(
        np.asarray(out["annotations"]["centers3d"])[0], [2.0, 2.0, 3.0], atol=1e-5
    )
    # velocities NOT translated (direction vectors)
    np.testing.assert_allclose(
        np.asarray(out["annotations"]["velocities"])[0], [1.0, 0.0, 0.0], atol=1e-5
    )
    w2e = np.asarray(out["world_to_ego"])
    e2w = np.asarray(out["ego_to_world"])
    np.testing.assert_allclose(e2w @ w2e, np.eye(4), atol=1e-5)


def test_missing_field_raises():
    step = make_step(rotation=(0.0, 0.1))
    sdg = SampleDataGroup()
    sdg.add_data_field("unrelated", DType.FLOAT)
    with pytest.raises(KeyError):
        step.check_input_data_format_and_set_output_data_format(sdg)


@pytest.mark.parametrize("seed", range(6))
def test_world_ego_and_projection_invariants(seed):
    """Gold invariants under random rotate+scale+translate with real random
    draws: (a) world_to_ego @ ego_to_world stays the identity; (b) a camera
    projection matrix updated by the step projects the TRANSFORMED points to
    the same image coordinates as the original projection of the original
    points (the whole point of consistent matrix updates)."""
    import jax

    from accvlab_tpu.pipeline.random_context import DeviceRandomContext

    sdg = make_sample()
    sdg.add_data_field("cam_proj", DType.FLOAT)
    rng = np.random.default_rng(seed)
    # a full-rank 4x4 "projection @ extrinsics" world->camera matrix
    proj0 = np.eye(4, dtype=np.float32)
    proj0[:3, :3] = rng.normal(size=(3, 3)).astype(np.float32) + 3 * np.eye(3, dtype=np.float32)
    proj0[:3, 3] = rng.normal(size=3).astype(np.float32)
    sdg["cam_proj"] = proj0

    pts0 = np.asarray(sdg["annotations"]["centers3d"]).copy()

    step = BEVBBoxesTransformer3D(
        data_field_names_points="centers3d",
        data_field_names_velocities="velocities",
        data_field_names_sizes="sizes3d",
        data_field_names_orientation="yaw",
        data_field_names_proj_matrices_and_extrinsics="cam_proj",
        data_field_names_ego_to_world="ego_to_world",
        data_field_names_world_to_ego="world_to_ego",
        rotation_range=(-1.0, 1.0),
        rotation_axis=2,
        scaling_range=(0.8, 1.2),
        translation_max_abs=(2.0, 2.0, 0.5),
    )
    step.set_random_context(DeviceRandomContext(jax.random.PRNGKey(seed)))
    out = step(sdg)

    e2w = np.asarray(out["ego_to_world"])
    w2e = np.asarray(out["world_to_ego"])
    np.testing.assert_allclose(w2e @ e2w, np.eye(4), atol=1e-4)

    pts1 = np.asarray(out["annotations"]["centers3d"])
    proj1 = np.asarray(out["cam_proj"])
    h0 = np.concatenate([pts0, np.ones((2, 1), np.float32)], axis=1)
    h1 = np.concatenate([pts1, np.ones((2, 1), np.float32)], axis=1)
    np.testing.assert_allclose(
        (proj1 @ h1.T), (proj0 @ h0.T), rtol=1e-3, atol=1e-3
    )
