"""Padding steps.

Parity: reference ``processing_steps/image_to_tile_size_padder.py`` (pad each
image so H/W are tile multiples) and ``padding_to_uniform.py`` (pad fields to
the per-batch maximum shape). On TPU these define the static-shape boundary:
everything after them has uniform shapes and runs in the fused device program.
"""

from __future__ import annotations

from collections.abc import Sequence as ABCSequence
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from ._common import as_name_list
from .pipeline_step_base import BatchLevelStepBase, PipelineStepBase
from ..sample_data_group import SampleDataGroup

Name = Union[str, int]


class ImageToTileSizePadder(PipelineStepBase):
    """Right/bottom-pad each image so H and W are multiples of the tile size.

    Runs on the host (input image sizes may vary per sample); for uniform
    inputs this also bounds XLA recompilation by quantizing shapes.
    """

    placement = "host"

    def __init__(
        self,
        image_name: Name,
        tile_size_to_pad_to: Union[int, Sequence[int]],
    ):
        super().__init__()
        self._image_name = image_name
        self._tile = (
            list(tile_size_to_pad_to)
            if isinstance(tile_size_to_pad_to, ABCSequence)
            else [tile_size_to_pad_to, tile_size_to_pad_to]
        )
        assert self._tile[0] > 0 and self._tile[1] > 0, (
            "Tile size must be greater than 0. To retain the original image "
            "size, use tile size 1."
        )

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        for ip in data.find_all_occurrences(self._image_name):
            image = np.asarray(data.get_item_in_path(ip))
            h, w = image.shape[0], image.shape[1]
            th = (h + self._tile[0] - 1) // self._tile[0] * self._tile[0]
            tw = (w + self._tile[1] - 1) // self._tile[1] * self._tile[1]
            if (th, tw) != (h, w):
                pad = [(0, th - h), (0, tw - w)] + [(0, 0)] * (image.ndim - 2)
                image = np.pad(image, pad)
            data.set_item_in_path(ip, image)
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        if len(data_empty.find_all_occurrences(self._image_name)) == 0:
            raise KeyError(
                f"No occurrences of images found with name '{self._image_name}'."
            )
        return data_empty


class PaddingToUniform(BatchLevelStepBase):
    """Pad selected fields (or all data fields) to the per-batch maximum
    shape, filling with ``fill_value``.

    Batch-level host step: it needs the whole batch to know the target shape
    (the reference's DALI graph sees whole batches implicitly).
    """

    def __init__(
        self,
        field_names: Optional[Union[Name, List[Name], Tuple[Name, ...]]] = None,
        fill_value: Union[int, float] = 0.0,
        size_buckets: Optional[Sequence[int]] = None,
    ):
        """``size_buckets``: optional ascending sizes; the per-batch maximum
        of each padded dimension is rounded UP to the next bucket. This bounds
        XLA recompilation (SURVEY §7 "static shapes vs raggedness"): without
        buckets every new batch maximum is a new device-program shape."""
        super().__init__()
        self._field_names = as_name_list(field_names)
        self._fill_value = fill_value
        self._size_buckets = sorted(size_buckets) if size_buckets else None

    def _bucketed(self, size: int) -> int:
        if self._size_buckets is None:
            return size
        for b in self._size_buckets:
            if size <= b:
                return b
        return size  # beyond the largest bucket: exact (rare, recompiles)

    def _target_paths(self, sample: SampleDataGroup):
        if self._field_names is None:
            # all data-field leaves
            paths = []

            def recurse(group, prefix):
                for name in group.contained_top_level_field_names:
                    if group.is_data_group_field(name):
                        recurse(group[name], prefix + (name,))
                    else:
                        paths.append(prefix + (name,))

            recurse(sample, ())
            return paths
        paths = []
        for fnm in self._field_names:
            for pth in sample.find_all_occurrences(fnm):
                if sample.path_exists_and_is_data_group_field(pth):
                    # data-field arrays: pad each element
                    group = sample.get_item_in_path(pth)
                    for name in group.contained_top_level_field_names:
                        if group.is_data_field(name):
                            paths.append(tuple(pth) + (name,))
                else:
                    paths.append(tuple(pth))
        return paths

    def _process_batch(self, samples: List[SampleDataGroup]) -> List[SampleDataGroup]:
        if not samples:
            return samples
        for path in self._target_paths(samples[0]):
            arrs = [np.atleast_1d(np.asarray(s.get_item_in_path(list(path)))) for s in samples]
            ndim = max(a.ndim for a in arrs)
            arrs = [a.reshape(a.shape + (1,) * (ndim - a.ndim)) for a in arrs]
            target = tuple(
                self._bucketed(max(a.shape[d] for a in arrs)) for d in range(ndim)
            )
            for s, a in zip(samples, arrs):
                pad = [(0, target[d] - a.shape[d]) for d in range(ndim)]
                if any(p[1] for p in pad):
                    a = np.pad(a, pad, constant_values=self._fill_value)
                s.set_item_in_path(list(path), a)
        return samples

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        if self._field_names is not None:
            for fnm in self._field_names:
                if len(data_empty.find_all_occurrences(fnm)) == 0:
                    raise KeyError(f"No occurrences of field '{fnm}' found.")
        return data_empty
