"""Shared helpers for processing steps."""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

Name = Union[str, int]


def xp_for(value):
    """Array namespace for a value: jnp for traced/device values, numpy else.

    Lets a step with ``placement = "any"`` run identically on host (numpy)
    and inside the fused device program (jnp).
    """
    import jax
    import jax.numpy as jnp

    if isinstance(value, (jax.Array, jax.core.Tracer)):
        return jnp
    return np


def as_name_list(names: Union[Name, Sequence[Name], None]):
    if names is None:
        return None
    if isinstance(names, (str, int)):
        return [names]
    return list(names)
