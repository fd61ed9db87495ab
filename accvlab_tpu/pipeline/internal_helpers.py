"""In-graph debug helpers.

Parity: reference ``dali_pipeline_framework/accvlab/.../internal_helpers``
(``check_type.py:23``, ``debug_helpers.py:21,57``, ``helper_functions.py:23,66``).
The DALI python_function-based printers map to ``jax.debug.print`` /
``jax.debug.callback``, which work inside the fused device program.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import numpy as np


def check_type(input, expected_type_np, identifier: str):
    """Assert the array's dtype; returns the input unchanged.

    Inside a trace this is a free static check (shapes/dtypes are known at
    trace time) — unlike the reference, no runtime op is needed.
    """
    actual = np.dtype(input.dtype)
    expected = np.dtype(expected_type_np)
    if actual != expected:
        raise TypeError(
            f"check_type('{identifier}'): expected dtype {expected}, got {actual}"
        )
    return input


def print_tensor_op(tensor, name: str):
    """Print a tensor's value at execution time (works under jit)."""
    import jax

    jax.debug.print(name + ": {}", tensor)
    return tensor


def print_tensor_size_op(tensor, name: str):
    """Print a tensor's shape (static under jit, printed at trace)."""
    print(f"{name}: shape={tuple(tensor.shape)} dtype={tensor.dtype}")
    return tensor


def get_as_data_node(value):
    """Wrap a constant as an in-graph array (the DALI ``get_as_data_node``
    becomes a plain jnp constant under tracing)."""
    import jax.numpy as jnp

    return jnp.asarray(value)


def get_mapped(val: Union[Sequence, Any], mapping: dict, encapsulate: bool = False) -> list:
    """Map value(s) through a dict; optionally wrap a scalar into a list.

    Parity: ``helper_functions.py:66``.
    """
    if isinstance(val, (list, tuple)):
        return [mapping[v] for v in val]
    res = mapping[val]
    return [res] if encapsulate else res
