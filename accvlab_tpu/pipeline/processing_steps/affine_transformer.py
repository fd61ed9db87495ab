"""Spatial augmentation step: composable random affine transforms with
consistent geometry updates (images, point sets, projection matrices).

Parity: reference ``processing_steps/affine_transformer.py:45-993`` (993 LoC,
built on DALI ``fn.transforms.*`` + ``fn.warp_affine``). The TPU-native
version builds the same 2x3 transform from composable
:class:`TransformationStep` objects — Translation / UniformScaling /
NonUniformScaling / Rotation / Shearing / ShiftInsideOriginalImage /
ShiftToAlignWithOriginalImageBorder / Selection — then applies it in the
fused device program:

* images via :func:`~accvlab_tpu.pipeline.operators.image_ops.warp_affine`
  (bilinear, fill 0, forward-map semantics like the reference),
* point sets via ``apply_transform_to_points``,
* projection matrices via left-composition of the homogeneous transform,
* ``image_hw`` fields updated to the output size.

Transform composition convention matches DALI: a step combines as
``new_matrix @ prior_matrix`` (the new transform applies AFTER the prior),
and the final transform is ``resize @ augmentation``. Probabilistic gating
(``prob``) is traced as a ``where``-select — branch-free XLA.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from enum import Enum
from typing import List, Optional, Sequence, Set, Tuple, Union

import numpy as np

from ._common import as_name_list


def _jnp():
    import jax.numpy as jnp

    return jnp
from .pipeline_step_base import PipelineStepBase
from ..operators.image_ops import warp_affine
from ..operators.point_ops import (
    add_post_transform_to_projection_matrix,
    apply_transform_to_points,
)
from ..sample_data_group import SampleDataGroup

Name = Union[str, int]

_IDENTITY = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)


def _compose(new, prior, xp):
    """new @ prior for 2x3 affines (homogeneous composition)."""
    bottom = xp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    prior3 = xp.concatenate([xp.asarray(prior, dtype=np.float32), bottom], axis=0)
    return xp.asarray(new, dtype=np.float32) @ prior3


def _translation_mat(offset, xp):
    o = xp.asarray(offset, dtype=np.float32)
    eye = xp.asarray(_IDENTITY)
    return xp.concatenate([eye[:, :2], o.reshape(2, 1)], axis=1)


def _about_center(linear2x2, center, xp):
    """2x3 matrix applying ``linear2x2`` about ``center`` (x, y)."""
    c = xp.asarray(center, dtype=np.float32)
    t = c - linear2x2 @ c
    return xp.concatenate([linear2x2, t.reshape(2, 1)], axis=1)


class AffineTransformer(PipelineStepBase):
    """Random affine augmentation with consistent geometry updates."""

    placement = "device"

    # ------------------------------------------------------------------ #
    # Transformation steps                                               #
    # ------------------------------------------------------------------ #

    class TransformationStep(ABC):
        """One composable transform with an application probability."""

        def __init__(self, prob: float):
            self.prob = prob
            self._rng = None

        def __call__(self, prior_trafo, image_hw, rng):
            self._rng = rng
            xp = _jnp()
            trafo = xp.asarray(_IDENTITY) if prior_trafo is None else prior_trafo
            applied = self._apply(trafo, image_hw)
            if self.prob >= 1.0:
                return applied
            draw = rng.uniform(0.0, 1.0)
            return xp.where(draw < self.prob, applied, trafo)

        @abstractmethod
        def check_prev_types_compatible_and_add_current_type(
            self, prev_types: Set[type]
        ) -> Set[type]:
            """Validate ordering constraints; return types incl. this step's."""

        @abstractmethod
        def _apply(self, prior_trafo, image_hw):
            """Return the composed transform with this step applied."""

        def _get_random_in_range(self, lo, hi):
            if isinstance(lo, (int, float)) and isinstance(hi, (int, float)) and lo == hi:
                return np.float32(lo)
            return self._rng.uniform(lo, hi)

        @staticmethod
        def _get_center_xy(image_hw, xp):
            hw = xp.asarray(image_hw, dtype=np.float32)
            return xp.stack([hw[1] * 0.5, hw[0] * 0.5])

        def _simple_add(self, prev_types: Set[type]) -> Set[type]:
            res = set(prev_types)
            res.add(self.__class__)
            return res

    class Translation(TransformationStep):
        """Shift by a fixed or range-random (x, y) offset."""

        def __init__(self, prob, min_xy: Sequence[float], max_xy: Optional[Sequence[float]] = None):
            super().__init__(prob)
            self.min_xy = list(min_xy)
            self.max_xy = list(max_xy) if max_xy is not None else None

        def _apply(self, prior_trafo, image_hw):
            xp = _jnp()
            if self.max_xy is None:
                offset = xp.asarray(np.asarray(self.min_xy, np.float32))
            else:
                tx = self._get_random_in_range(self.min_xy[0], self.max_xy[0])
                ty = self._get_random_in_range(self.min_xy[1], self.max_xy[1])
                offset = xp.stack([xp.asarray(tx, dtype=np.float32), xp.asarray(ty, dtype=np.float32)])
            return _compose(_translation_mat(offset, xp), prior_trafo, xp)

        def check_prev_types_compatible_and_add_current_type(self, prev_types):
            return self._simple_add(prev_types)

    class ShiftInsideOriginalImage(TransformationStep):
        """Random shift keeping the (scaled-up) image covering the viewport.

        Only acts per dimension where the transformed image is larger than
        the viewport; incompatible after Rotation/Shearing (parity:
        ``affine_transformer.py:208-295``).
        """

        def __init__(self, prob, shift_x: bool, shift_y: bool):
            super().__init__(prob)
            self.shift_x = shift_x
            self.shift_y = shift_y

        def _apply(self, prior_trafo, image_hw):
            xp = _jnp()
            hw = xp.asarray(image_hw, dtype=np.float32)
            prior3_ul = prior_trafo @ xp.asarray(np.array([0.0, 0.0, 1.0], np.float32))
            prior3_lr = prior_trafo @ xp.stack([hw[1], hw[0], xp.ones_like(hw[0])])
            min_coords = xp.minimum(prior3_ul, prior3_lr)
            max_coords = xp.maximum(prior3_ul, prior3_lr)
            # viewport size per coord: x -> hw[1], y -> hw[0]
            view = xp.stack([hw[1], hw[0]])
            min_shift = -min_coords
            max_shift = view - max_coords
            lo = xp.minimum(min_shift, max_shift)
            hi = xp.maximum(min_shift, max_shift)
            draws = xp.stack(
                [
                    xp.asarray(self._rng.uniform(lo[0], hi[0]), dtype=np.float32),
                    xp.asarray(self._rng.uniform(lo[1], hi[1]), dtype=np.float32),
                ]
            )
            enabled = xp.asarray(
                np.array([self.shift_x, self.shift_y], np.float32)
            ) * (min_shift < max_shift)[:2].astype(np.float32)
            offset = draws * enabled
            return _compose(_translation_mat(offset, xp), prior_trafo, xp)

        def check_prev_types_compatible_and_add_current_type(self, prev_types):
            if (
                AffineTransformer.Rotation in prev_types
                or AffineTransformer.Shearing in prev_types
            ):
                raise ValueError(
                    "Cannot perform `ShiftInsideOriginalImage` if rotation or "
                    "shearing are (potentially) performed before."
                )
            return self._simple_add(prev_types)

    class ShiftToAlignWithOriginalImageBorder(TransformationStep):
        """Shift so the transformed image aligns with a chosen viewport border.

        Incompatible after Rotation/Shearing (parity:
        ``affine_transformer.py:296-367``).
        """

        class Border(Enum):
            TOP = 0
            LEFT = 1
            BOTTOM = 2
            RIGHT = 3

        def __init__(self, prob, border: "AffineTransformer.ShiftToAlignWithOriginalImageBorder.Border"):
            super().__init__(prob)
            self._border = border

        def _apply(self, prior_trafo, image_hw):
            xp = _jnp()
            hw = xp.asarray(image_hw, dtype=np.float32)
            ul = prior_trafo @ xp.asarray(np.array([0.0, 0.0, 1.0], np.float32))
            lr = prior_trafo @ xp.stack([hw[1], hw[0], xp.ones_like(hw[0])])
            min_coords = xp.minimum(ul, lr)
            max_coords = xp.maximum(ul, lr)
            zero = xp.zeros((), np.float32)
            b = self.Border
            if self._border == b.TOP:
                offset = xp.stack([zero, -min_coords[1]])
            elif self._border == b.LEFT:
                offset = xp.stack([-min_coords[0], zero])
            elif self._border == b.BOTTOM:
                offset = xp.stack([zero, hw[0] - max_coords[1]])
            elif self._border == b.RIGHT:
                offset = xp.stack([hw[1] - max_coords[0], zero])
            else:
                raise NotImplementedError(f"Border type {self._border} not supported")
            return _compose(_translation_mat(offset, xp), prior_trafo, xp)

        def check_prev_types_compatible_and_add_current_type(self, prev_types):
            if (
                AffineTransformer.Rotation in prev_types
                or AffineTransformer.Shearing in prev_types
            ):
                raise ValueError(
                    "Cannot perform `ShiftToAlignWithOriginalImageBorder` if "
                    "rotation or shearing are (potentially) performed before."
                )
            return self._simple_add(prev_types)

    class Rotation(TransformationStep):
        """Rotate about the image center by a fixed or range-random angle
        (degrees; same sign convention as the reference)."""

        def __init__(self, prob, min_rot: float, max_rot: Optional[float] = None):
            super().__init__(prob)
            self.min_rot = min_rot
            self.max_rot = max_rot

        def _apply(self, prior_trafo, image_hw):
            xp = _jnp()
            if self.max_rot is None:
                angle = -np.float32(self.min_rot)
            else:
                angle = -xp.asarray(
                    self._get_random_in_range(self.min_rot, self.max_rot), dtype=np.float32
                )
            rad = angle * np.float32(np.pi / 180.0)
            c, s = xp.cos(rad), xp.sin(rad)
            linear = xp.stack([xp.stack([c, -s]), xp.stack([s, c])])
            center = self._get_center_xy(image_hw, xp)
            return _compose(_about_center(linear, center, xp), prior_trafo, xp)

        def check_prev_types_compatible_and_add_current_type(self, prev_types):
            return self._simple_add(prev_types)

    class UniformScaling(TransformationStep):
        """Scale uniformly about the image center."""

        def __init__(self, prob, min_scaling: float, max_scaling: Optional[float] = None):
            super().__init__(prob)
            self.min_scaling = min_scaling
            self.max_scaling = max_scaling

        def _apply(self, prior_trafo, image_hw):
            xp = _jnp()
            if self.max_scaling is None:
                s = np.float32(self.min_scaling)
            else:
                s = xp.asarray(
                    self._get_random_in_range(self.min_scaling, self.max_scaling),
                    dtype=np.float32,
                )
            zero = xp.zeros_like(xp.asarray(s, dtype=np.float32))
            linear = xp.stack(
                [xp.stack([xp.asarray(s, dtype=np.float32), zero]),
                 xp.stack([zero, xp.asarray(s, dtype=np.float32)])]
            )
            center = self._get_center_xy(image_hw, xp)
            return _compose(_about_center(linear, center, xp), prior_trafo, xp)

        def check_prev_types_compatible_and_add_current_type(self, prev_types):
            return self._simple_add(prev_types)

    class NonUniformScaling(TransformationStep):
        """Scale x and y independently about the image center."""

        def __init__(
            self,
            prob,
            min_scaling_xy: Sequence[float],
            max_scaling_xy: Optional[Sequence[float]] = None,
        ):
            super().__init__(prob)
            self.min_scaling_xy = list(min_scaling_xy)
            self.max_scaling_xy = list(max_scaling_xy) if max_scaling_xy is not None else None

        def _apply(self, prior_trafo, image_hw):
            xp = _jnp()
            if self.max_scaling_xy is None:
                sx = np.float32(self.min_scaling_xy[0])
                sy = np.float32(self.min_scaling_xy[1])
            else:
                sx = self._get_random_in_range(self.min_scaling_xy[0], self.max_scaling_xy[0])
                sy = self._get_random_in_range(self.min_scaling_xy[1], self.max_scaling_xy[1])
            sx = xp.asarray(sx, dtype=np.float32)
            sy = xp.asarray(sy, dtype=np.float32)
            zero = xp.zeros_like(sx)
            linear = xp.stack([xp.stack([sx, zero]), xp.stack([zero, sy])])
            center = self._get_center_xy(image_hw, xp)
            return _compose(_about_center(linear, center, xp), prior_trafo, xp)

        def check_prev_types_compatible_and_add_current_type(self, prev_types):
            return self._simple_add(prev_types)

    class Shearing(TransformationStep):
        """Shear by (x, y) angles in degrees about the image center."""

        def __init__(
            self,
            prob,
            min_shearing_xy: Sequence[float],
            max_shearing_xy: Optional[Sequence[float]] = None,
        ):
            super().__init__(prob)
            self.min_shearing_xy = list(min_shearing_xy)
            self.max_shearing_xy = (
                list(max_shearing_xy) if max_shearing_xy is not None else None
            )

        def _apply(self, prior_trafo, image_hw):
            xp = _jnp()
            if self.max_shearing_xy is None:
                ax = np.float32(self.min_shearing_xy[0])
                ay = np.float32(self.min_shearing_xy[1])
            else:
                ax = self._get_random_in_range(self.min_shearing_xy[0], self.max_shearing_xy[0])
                ay = self._get_random_in_range(self.min_shearing_xy[1], self.max_shearing_xy[1])
            deg = np.float32(np.pi / 180.0)
            tx = xp.tan(xp.asarray(ax, dtype=np.float32) * deg)
            ty = xp.tan(xp.asarray(ay, dtype=np.float32) * deg)
            one = xp.ones_like(tx)
            linear = xp.stack([xp.stack([one, tx]), xp.stack([ty, one])])
            center = self._get_center_xy(image_hw, xp)
            return _compose(_about_center(linear, center, xp), prior_trafo, xp)

        def check_prev_types_compatible_and_add_current_type(self, prev_types):
            return self._simple_add(prev_types)

    class Selection(TransformationStep):
        """Probabilistically choose one step sequence out of alternatives
        (parity: ``affine_transformer.py:522-600``)."""

        _eps = 1e-6

        def __init__(self, prob, option_probs: Sequence[float], options: Sequence):
            super().__init__(prob)
            num_options = len(option_probs)
            assert len(options) == num_options, (
                "Number of per-option probabilities and options does not match"
            )
            base = AffineTransformer.TransformationStep
            self._options = [o if not isinstance(o, base) else [o] for o in options]
            accum = np.cumsum(np.asarray(option_probs, np.float64))
            assert abs(accum[-1] - 1.0) <= self._eps, (
                "Probabilities for options do not sum up to 1"
            )
            self._accum = [float(a) for a in accum]

        def _apply(self, prior_trafo, image_hw):
            xp = _jnp()
            draw = self._rng.uniform(0.0, 1.0)
            res = prior_trafo
            chosen = xp.zeros((), bool)
            for i, accum in enumerate(self._accum):
                option_res = prior_trafo
                for s in self._options[i]:
                    option_res = s(option_res, image_hw, self._rng)
                take = xp.logical_and(xp.logical_not(chosen), draw <= accum)
                res = xp.where(take, option_res, res)
                chosen = xp.logical_or(chosen, draw <= accum)
            return res

        def check_prev_types_compatible_and_add_current_type(self, prev_types):
            res = set(prev_types)
            for option in self._options:
                option_types = set(prev_types)
                for el in option:
                    option_types = el.check_prev_types_compatible_and_add_current_type(
                        option_types
                    )
                res = res.union(option_types)
            return res

    # ------------------------------------------------------------------ #
    # Resizing                                                           #
    # ------------------------------------------------------------------ #

    class ResizingMode(Enum):
        STRETCH = 0
        PAD = 1
        CROP = 2

    class ResizingAnchor(Enum):
        CENTER = 0
        TOP_OR_LEFT = 1
        BOTTOM_OR_RIGHT = 2

    # ------------------------------------------------------------------ #

    def __init__(
        self,
        output_hw: Sequence[int],
        resizing_mode: "AffineTransformer.ResizingMode",
        resizing_anchor: Optional["AffineTransformer.ResizingAnchor"] = None,
        image_field_names: Optional[Union[Name, List[Name], Tuple[Name, ...]]] = None,
        image_hw_field_names: Optional[Union[Name, List[Name], Tuple[Name, ...]]] = None,
        projection_matrix_field_names: Optional[Union[Name, List[Name], Tuple[Name, ...]]] = None,
        point_field_names: Optional[Union[Name, List[Name], Tuple[Name, ...]]] = None,
        transformation_steps: Optional[Sequence["AffineTransformer.TransformationStep"]] = None,
        transform_image_on_gpu: bool = True,  # parity arg; device placement implied
    ):
        super().__init__()
        image_field_names = as_name_list(image_field_names) or []
        image_hw_field_names = as_name_list(image_hw_field_names) or []
        assert image_field_names or image_hw_field_names, (
            "Either image_field_names or image_hw_field_names must be provided "
            "(source of the input image size)."
        )
        self._image_field_names = image_field_names
        self._extract_size_from_images = len(image_field_names) > 0
        self._image_hw_field_names = image_hw_field_names
        self._projection_matrix_field_names = as_name_list(projection_matrix_field_names) or []
        self._point_field_names = as_name_list(point_field_names) or []
        self._transformation_steps = list(transformation_steps or [])
        self._output_hw = tuple(int(v) for v in output_hw)
        self._resizing_mode = resizing_mode
        self._resizing_anchor = resizing_anchor
        del transform_image_on_gpu

        # validate step-ordering constraints once at construction
        types_seen: Set[type] = set()
        for step in self._transformation_steps:
            types_seen = step.check_prev_types_compatible_and_add_current_type(types_seen)

    # -- transform construction ----------------------------------------- #

    def _get_transformation(self, image_hw, xp):
        resize = self._get_transformation_to_output_size(image_hw, xp)
        if self._transformation_steps:
            augmentation = None
            for step in self._transformation_steps:
                augmentation = step(augmentation, image_hw, self.random)
            return _compose(resize, augmentation, xp)  # resize applied after
        return resize

    def _get_transformation_to_output_size(self, input_hw, xp):
        """Parity: ``affine_transformer.py:901-951``."""
        out_h, out_w = float(self._output_hw[0]), float(self._output_hw[1])
        hw = xp.asarray(input_hw, dtype=np.float32)
        mode, anchor = self._resizing_mode, self._resizing_anchor
        if mode == self.ResizingMode.STRETCH:
            sx = out_w / hw[1]
            sy = out_h / hw[0]
            zero = xp.zeros_like(sx)
            return xp.stack([xp.stack([sx, zero, zero]), xp.stack([zero, sy, zero])])
        if mode in (self.ResizingMode.PAD, self.ResizingMode.CROP):
            ratios = xp.stack([out_h / hw[0], out_w / hw[1]])
            s = xp.min(ratios) if mode == self.ResizingMode.PAD else xp.max(ratios)
            if anchor == self.ResizingAnchor.TOP_OR_LEFT:
                shift = xp.zeros((2,), np.float32)
            elif anchor in (self.ResizingAnchor.CENTER, self.ResizingAnchor.BOTTOM_OR_RIGHT):
                frac = 0.5 if anchor == self.ResizingAnchor.CENTER else 1.0
                shift_x = out_w * frac - s * hw[1] * frac
                shift_y = out_h * frac - s * hw[0] * frac
                shift = xp.stack([shift_x, shift_y])
            else:
                raise ValueError(f"Resizing anchor {anchor} not supported.")
            zero = xp.zeros_like(s)
            return xp.stack(
                [xp.stack([s, zero, shift[0]]), xp.stack([zero, s, shift[1]])]
            )
        raise ValueError(f"Resizing mode {mode} not supported.")

    # -- step interface -------------------------------------------------- #

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        # determine the input size (all matching images must share it)
        if self._extract_size_from_images:
            first_image = data.get_item_in_path(
                data.find_all_occurrences(self._image_field_names[0])[0]
            )
            image_hw = np.asarray(first_image.shape[-3:-1], np.int32)
            xp = _jnp()
        else:
            image_hw = data.get_item_in_path(
                data.find_all_occurrences(self._image_hw_field_names[0])[0]
            )
            xp = _jnp()

        transform = self._get_transformation(image_hw, xp)

        for image_field_name in self._image_field_names:
            for ip in data.find_all_occurrences(image_field_name):
                image = data.get_item_in_path(ip)
                data.set_item_in_path(
                    ip, warp_affine(image, transform, self._output_hw, fill_value=0.0)
                )
        for name in self._projection_matrix_field_names:
            for pp in data.find_all_occurrences(name):
                parent = data.get_parent_of_path(pp)
                parent[name] = add_post_transform_to_projection_matrix(
                    parent[name], transform
                )
        for name in self._point_field_names:
            for pp in data.find_all_occurrences(name):
                parent = data.get_parent_of_path(pp)
                parent[name] = apply_transform_to_points(parent[name], transform)
        if not self._extract_size_from_images:
            for name in self._image_hw_field_names:
                for sp in data.find_all_occurrences(name):
                    parent = data.get_parent_of_path(sp)
                    parent[name] = np.asarray(self._output_hw, np.int32)
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        def require(names, what):
            for name in names:
                if len(data_empty.find_all_occurrences(name)) == 0:
                    raise KeyError(f"No occurrences of {what} with name `{name}` found.")

        if self._extract_size_from_images:
            require(self._image_field_names, "images")
        else:
            require(self._image_hw_field_names, "image sizes")
            require(self._image_field_names, "images")
        require(self._projection_matrix_field_names, "projection matrices")
        require(self._point_field_names, "point sets")
        return data_empty
