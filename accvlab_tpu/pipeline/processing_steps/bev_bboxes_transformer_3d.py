"""BEV (world-coordinate) 3-D box augmentation: random rotation / scaling /
translation of box centers, velocities, sizes, orientations, with consistent
updates of ego<->world and projection/extrinsic matrices.

Parity: reference ``processing_steps/bev_bboxes_transformer_3d.py:35-355``,
including the exact from-right / inverse / transpose application pattern per
field kind. Runs in the fused device program; one random draw set per sample,
applied consistently to all matching fields (wrap with the applied-step
wrappers for per-subtree independence).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

from .pipeline_step_base import PipelineStepBase
from ..operators import (
    apply_matrix,
    ensure_range,
    get_rot_mat_from_rot_vector,
    get_scaling_mat_from_vector,
    get_translation_mat_from_vector,
)
from ..sample_data_group import SampleDataGroup

Name = Union[str, int]
Names = Optional[Union[Name, Sequence[Name]]]


def _to_list(data: Names):
    if data is None:
        return []
    if isinstance(data, (str, int)):
        return [data]
    return list(data)


class BEVBBoxesTransformer3D(PipelineStepBase):
    """World-coordinate 3-D augmentation with consistent matrix updates."""

    placement = "device"

    # per-transform application tables (parity: reference _process tables)
    _ROTATION_TABLE = [
        # (field-kind, from_right, invert, data_transposed, make_homog)
        ("points", False, False, True, True),
        ("velocities", False, False, True, True),
        ("ego_to_world", True, True, False, False),
        ("world_to_ego", False, False, False, False),
        ("proj_matrices_and_extrinsics", True, True, False, False),
    ]
    _SCALING_TABLE = [
        ("points", False, False, True, True),
        ("velocities", False, False, True, True),
        ("sizes", False, False, True, True),
        ("ego_to_world", True, True, False, False),
        ("world_to_ego", False, False, False, False),
        ("proj_matrices_and_extrinsics", True, True, False, False),
    ]
    _TRANSLATION_TABLE = [
        ("points", False, False, True, True),
        ("ego_to_world", True, True, False, False),
        ("world_to_ego", False, False, False, False),
        ("proj_matrices_and_extrinsics", True, True, False, False),
    ]

    def __init__(
        self,
        data_field_names_points: Names,
        data_field_names_velocities: Names,
        data_field_names_sizes: Names,
        data_field_names_orientation: Names,
        data_field_names_proj_matrices_and_extrinsics: Names,
        data_field_names_ego_to_world: Names,
        data_field_names_world_to_ego: Names,
        rotation_range: Optional[Tuple[float, float]],
        rotation_axis: Optional[int],
        scaling_range: Optional[Tuple[float, float]],
        translation_max_abs: Optional[Tuple[float, float, float]],
    ):
        super().__init__()
        self._do_rotate = rotation_range is not None
        self._do_scale = scaling_range is not None
        self._do_translate = translation_max_abs is not None
        if self._do_rotate:
            assert rotation_axis is not None, (
                "If `rotation_range` is set, `rotation_axis` needs to be set too"
            )
            assert len(rotation_range) == 2
            self._rotation_range = tuple(float(r) for r in rotation_range)
            axis_vec = np.zeros(3, np.float32)
            axis_vec[rotation_axis] = 1.0
            self._rotation_axis_vec = axis_vec
        if self._do_scale:
            assert len(scaling_range) == 2
            self._scaling_range = tuple(float(s) for s in scaling_range)
        if self._do_translate:
            assert len(translation_max_abs) == 3, (
                "If `translation_max_abs` is set, it must have 3 elements."
            )
            self._translation_max_abs = tuple(float(t) for t in translation_max_abs)

        self._fields = {
            "points": _to_list(data_field_names_points),
            "velocities": _to_list(data_field_names_velocities),
            "sizes": _to_list(data_field_names_sizes),
            "orientation": _to_list(data_field_names_orientation),
            "proj_matrices_and_extrinsics": _to_list(
                data_field_names_proj_matrices_and_extrinsics
            ),
            "ego_to_world": _to_list(data_field_names_ego_to_world),
            "world_to_ego": _to_list(data_field_names_world_to_ego),
        }
        assert any(self._fields.values()), "At least one data field name must be set."

    def _rand_in_range(self, lo, hi):
        if lo == hi:
            return np.float32(lo)
        return self.random.uniform(lo, hi)

    def _apply_table(self, data: SampleDataGroup, table, matrix, use_transpose_for_inverse):
        for kind, from_right, invert, transposed, make_homog in table:
            for name in self._fields[kind]:
                for path in data.find_all_occurrences(name):
                    parent = data.get_parent_of_path(path)
                    parent[name] = apply_matrix(
                        parent[name],
                        matrix,
                        make_apply_to_homog=make_homog,
                        to_apply_to_is_transposed=transposed,
                        matrix_is_transposed=invert if use_transpose_for_inverse else False,
                        matrix_is_inverted=invert if not use_transpose_for_inverse else False,
                        multiply_matrix_from_right=from_right,
                    )

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        import jax.numpy as jnp

        if self._do_rotate:
            angle = self._rand_in_range(*self._rotation_range)
            rot_vec = jnp.asarray(self._rotation_axis_vec) * angle
            rotation_matrix = get_rot_mat_from_rot_vector(rot_vec, as_homog=True)
            # rotation inverse == transpose (the reference's invert-by-transpose)
            self._apply_table(data, self._ROTATION_TABLE, rotation_matrix, True)
            for name in self._fields["orientation"]:
                for path in data.find_all_occurrences(name):
                    parent = data.get_parent_of_path(path)
                    orientation = parent[name] + angle
                    parent[name] = ensure_range(orientation, -np.pi, np.pi, 2.0 * np.pi)
        if self._do_scale:
            s = self._rand_in_range(*self._scaling_range)
            scaling_matrix = get_scaling_mat_from_vector(
                jnp.stack([jnp.asarray(s), jnp.asarray(s), jnp.asarray(s)]), as_homog=True
            )
            self._apply_table(data, self._SCALING_TABLE, scaling_matrix, False)
        if self._do_translate:
            t = jnp.stack(
                [
                    jnp.asarray(self._rand_in_range(-m, m), dtype=jnp.float32)
                    for m in self._translation_max_abs
                ]
            )
            translation_matrix = get_translation_mat_from_vector(t)
            self._apply_table(data, self._TRANSLATION_TABLE, translation_matrix, False)
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        for kind, names in self._fields.items():
            for name in names:
                if len(data_empty.find_all_occurrences(name)) == 0:
                    raise KeyError(
                        f"No occurrences of {kind} field '{name}' found."
                    )
        return data_empty
