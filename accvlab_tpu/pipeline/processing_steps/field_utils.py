"""Field-utility steps: AxesLayoutSetter, UnneededFieldRemover,
TensorSizeAdder.

Parity: reference ``processing_steps/axes_layout_setter.py:32``,
``unneeded_field_remover.py``, ``tensor_size_adder.py:44``.
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

from ._common import as_name_list, xp_for
from .pipeline_step_base import PipelineStepBase
from ..dtypes import DType, numpy_dtype_for
from ..sample_data_group import SampleDataGroup

Name = Union[str, int]


class AxesLayoutSetter(PipelineStepBase):
    """Set the axis layout of matching fields (e.g. HWC -> CHW).

    The reference re-labels DALI layout metadata (``fn.reshape(layout=...)``);
    arrays here carry no layout metadata, so this step performs the actual
    axis permutation from ``current_layout`` to ``layout_to_set`` — which is
    what downstream consumers observe either way.
    """

    placement = "any"

    def __init__(
        self,
        names_fields_to_set: Union[Name, Sequence[Name]],
        layout_to_set: str,
        current_layout: str = "HWC",
    ):
        super().__init__()
        self._names = as_name_list(names_fields_to_set)
        assert sorted(layout_to_set) == sorted(current_layout), (
            f"Layouts must be permutations of each other: {current_layout} -> {layout_to_set}"
        )
        self._perm = tuple(current_layout.index(ax) for ax in layout_to_set)
        self._identity = self._perm == tuple(range(len(self._perm)))

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        if self._identity:
            return data
        for field_name in self._names:
            for fp in data.find_all_occurrences(field_name):
                field = data.get_item_in_path(fp)
                xp = xp_for(field)
                data.set_item_in_path(fp, xp.transpose(xp.asarray(field), self._perm))
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        for field_name in self._names:
            if len(data_empty.find_all_occurrences(field_name)) == 0:
                raise KeyError(f"No occurrences of field '{field_name}' found.")
        return data_empty


class UnneededFieldRemover(PipelineStepBase):
    """Remove all occurrences of the given field names from the structure.

    Dropping unused fields before the device boundary saves host->HBM
    bandwidth (the reference's motivation is the same for GPU).
    """

    placement = "any"

    def __init__(
        self,
        unneeded_field_names: Union[Name, Sequence[Name], None] = None,
        *,
        field_names: Union[Name, Sequence[Name], None] = None,
    ):
        """``unneeded_field_names`` is the reference's parameter name
        (``unneeded_fields_remover.py:41``); ``field_names`` is kept as a
        keyword alias for earlier accvlab_tpu call sites."""
        super().__init__()
        if unneeded_field_names is None:
            unneeded_field_names = field_names
        assert unneeded_field_names is not None, "unneeded_field_names is required"
        self._field_names = as_name_list(unneeded_field_names)

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        for name in self._field_names:
            data.remove_all_occurrences(name)
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        for name in self._field_names:
            data_empty.remove_all_occurrences(name)
        return data_empty


class TensorSizeAdder(PipelineStepBase):
    """Store each matching tensor's (H, W) size — dims -3 and -2 — as a new
    sibling field named ``tensor_name + size_postfix``."""

    placement = "any"

    def __init__(
        self,
        tensor_name: str,
        size_postfix: str,
        store_size_as_type: DType = DType.INT32,
    ):
        super().__init__()
        self._tensor_name = tensor_name
        self._size_postfix = size_postfix
        self._store_type = store_size_as_type

    @property
    def _size_name(self) -> str:
        return f"{self._tensor_name}{self._size_postfix}"

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        np_type = numpy_dtype_for(self._store_type)
        for tp in data.find_all_occurrences(self._tensor_name):
            tensor = data.get_item_in_path(tp)
            parent = data.get_parent_of_path(tp)
            size = np.asarray(tensor.shape[-3:-1], dtype=np_type)
            parent.add_data_field(self._size_name, self._store_type)
            xp = xp_for(tensor)
            parent[self._size_name] = xp.asarray(size)
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        paths = data_empty.find_all_occurrences(self._tensor_name)
        if len(paths) == 0:
            raise KeyError(f"No occurrences of field '{self._tensor_name}' found.")
        for tp in paths:
            data_empty.get_parent_of_path(tp).add_data_field(self._size_name, self._store_type)
        return data_empty
