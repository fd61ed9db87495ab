"""Shared helpers for processing steps."""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

Name = Union[str, int]


from ..._array_ns import xp_for  # noqa: F401 — re-export: the shared
# numpy-vs-jnp dispatcher lets a step with ``placement = "any"`` run
# identically on host (numpy) and inside the fused device program (jnp)


def as_name_list(names: Union[Name, Sequence[Name], None]):
    if names is None:
        return None
    if isinstance(names, (str, int)):
        return [names]
    return list(names)
