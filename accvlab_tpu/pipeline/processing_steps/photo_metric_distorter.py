"""Photometric augmentation step.

Parity: reference ``processing_steps/photo_metric_distorter.py:32-240``:
random brightness / contrast (random pre- or post- color ops) / saturation /
hue / channel swap, with ONE set of per-sample random decisions applied
consistently to all matching images. Runs in the fused device program; DALI's
graph conditionals become ``where``-selects (same math, branch-free — the way
XLA wants it).

Hue/saturation use the standard linear YIQ-rotation / luma-lerp operators
(DALI's ``fn.hue`` / ``fn.saturation`` use the same linear color math).
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

from ._common import xp_for
from .pipeline_step_base import PipelineStepBase
from ..dtypes import DType
from ..sample_data_group import SampleDataGroup

# the 6 channel permutations, indexed like the reference's enumerated cases
# (photo_metric_distorter.py:193-216)
_CHANNEL_PERMS = np.array(
    [[0, 1, 2], [0, 2, 1], [1, 0, 2], [2, 1, 0], [2, 0, 1], [1, 2, 0]], np.int32
)

_RGB_LUMA = np.array([0.299, 0.587, 0.114], np.float32)

# RGB <-> YIQ (the classic NTSC matrices used by linear hue rotation)
_RGB2YIQ = np.array(
    [[0.299, 0.587, 0.114], [0.5959, -0.2746, -0.3213], [0.2115, -0.5227, 0.3112]],
    np.float32,
)
_YIQ2RGB = np.linalg.inv(_RGB2YIQ).astype(np.float32)


def _saturation(image, s, luma_weights):
    gray = image @ luma_weights
    return gray[..., None] + s * (image - gray[..., None])


def _hue_rotate(image, degrees, is_bgr):
    xp = xp_for(image)
    if is_bgr:
        image = image[..., ::-1]
    rad = degrees * np.float32(np.pi / 180.0)
    c, s = xp.cos(rad), xp.sin(rad)
    one = xp.ones_like(c)
    zero = xp.zeros_like(c)
    rot = xp.stack(
        [
            xp.stack([one, zero, zero]),
            xp.stack([zero, c, -s]),
            xp.stack([zero, s, c]),
        ]
    )
    m = xp.asarray(_YIQ2RGB) @ rot @ xp.asarray(_RGB2YIQ)
    out = image @ m.T
    if is_bgr:
        out = out[..., ::-1]
    return out


class PhotoMetricDistorter(PipelineStepBase):
    """Random photometric distortion with shared per-sample decisions."""

    placement = "device"

    def __init__(
        self,
        image_name: Union[str, int],
        min_max_brightness: Sequence[float],
        min_max_hue: Sequence[float],
        min_max_contrast: Sequence[float],
        min_max_saturation: Sequence[float],
        prob_brightness_aug: float = 0.5,
        prob_hue_aug: float = 0.5,
        prob_contrast_aug: float = 0.5,
        prob_saturation_aug: float = 0.5,
        prob_swap_channels: float = 0.5,
        is_bgr: bool = False,
        enforce_process_on_gpu: bool = True,  # parity arg; device placement is implied
    ):
        super().__init__()
        self._image_name = image_name
        self._min_max_brightness = tuple(min_max_brightness)
        self._min_max_hue = tuple(min_max_hue)
        self._min_max_contrast = tuple(min_max_contrast)
        self._min_max_saturation = tuple(min_max_saturation)
        self._prob_brightness = prob_brightness_aug
        self._prob_hue = prob_hue_aug
        self._prob_contrast = prob_contrast_aug
        self._prob_saturation = prob_saturation_aug
        self._prob_swap = prob_swap_channels
        self._is_bgr = is_bgr
        del enforce_process_on_gpu

    def _rand_in_range(self, rng, lo_hi):
        lo, hi = lo_hi
        if hi == lo:
            return np.float32(lo)
        return rng.uniform(lo, hi)

    def _draw_decisions(self):
        """Fixed draw order (documented for ScriptedRandomContext tests):
        5x uniform[0,1) gates, randint[0,2) contrast mode, then value draws
        (brightness, contrast, hue, saturation ranges), randint[0,6) perm."""
        rng = self.random
        aug_brightness = rng.uniform(0.0, 1.0) < self._prob_brightness
        aug_contrast = rng.uniform(0.0, 1.0) < self._prob_contrast
        aug_saturation = rng.uniform(0.0, 1.0) < self._prob_saturation
        aug_hue = rng.uniform(0.0, 1.0) < self._prob_hue
        aug_swap = rng.uniform(0.0, 1.0) < self._prob_swap
        contrast_mode = rng.randint(0, 2)
        delta = self._rand_in_range(rng, self._min_max_brightness)
        alpha = self._rand_in_range(rng, self._min_max_contrast)
        hue = self._rand_in_range(rng, self._min_max_hue)
        saturation = self._rand_in_range(rng, self._min_max_saturation)
        perm_index = rng.randint(0, 6)
        return dict(
            aug_brightness=aug_brightness,
            aug_contrast=aug_contrast,
            aug_saturation=aug_saturation,
            aug_hue=aug_hue,
            aug_swap=aug_swap,
            contrast_mode=contrast_mode,
            delta=delta,
            alpha=alpha,
            hue=hue,
            saturation=saturation,
            perm_index=perm_index,
        )

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        aug = self._draw_decisions()
        for ip in data.find_all_occurrences(self._image_name):
            image = data.get_item_in_path(ip)
            t = data.get_type_of_item_in_path(ip)
            assert t in (DType.FLOAT, DType.UINT8), f"Image type {t} not supported"
            is_uint8 = t == DType.UINT8
            xp = xp_for(image)
            img = xp.asarray(image).astype(np.float32)
            intensity = np.float32(1.0 / 255.0) if is_uint8 else np.float32(1.0)
            if is_uint8:
                img = img * intensity

            def sel(cond, new, old):
                return xp.where(cond, new, old)

            img = sel(
                aug["aug_brightness"],
                xp.clip(img + aug["delta"] * intensity, 0.0, 1.0),
                img,
            )
            pre_contrast = aug["aug_contrast"] & (aug["contrast_mode"] == 1)
            img = sel(pre_contrast, xp.clip(img * aug["alpha"], 0.0, 1.0), img)
            luma = xp.asarray(_RGB_LUMA[::-1].copy() if self._is_bgr else _RGB_LUMA)
            img = sel(
                aug["aug_saturation"], _saturation(img, aug["saturation"], luma), img
            )
            img = sel(aug["aug_hue"], _hue_rotate(img, aug["hue"], self._is_bgr), img)
            post_contrast = aug["aug_contrast"] & (aug["contrast_mode"] == 0)
            img = sel(post_contrast, xp.clip(img * aug["alpha"], 0.0, 1.0), img)
            perm = xp.asarray(_CHANNEL_PERMS)[aug["perm_index"]]
            img = sel(aug["aug_swap"], xp.take(img, perm, axis=-1), img)

            if is_uint8:
                img = xp.clip(img * 255.0, 0.0, 255.0).astype(np.uint8)
            else:
                img = xp.clip(img, 0.0, 1.0)
            data.set_item_in_path(ip, img)
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        if len(data_empty.find_all_occurrences(self._image_name)) == 0:
            raise KeyError(
                f"No occurrences of images found with name '{self._image_name}'."
            )
        return data_empty
