"""Single home for the numpy-vs-jnp namespace dispatch.

Several host/device-polymorphic modules (color conversion, ``placement=
"any"`` processing steps, the pipeline operator functions) need to run the
same code on numpy arrays (host workers) and traced jax values (inside the
fused device program). They all dispatch here so a jax API change (e.g. a
``jax.core.Tracer`` relocation) is a one-line fix.
"""

from __future__ import annotations

import numpy as np


def xp_for(value):
    """``jax.numpy`` for traced/device values, ``numpy`` otherwise."""
    import jax
    import jax.numpy as jnp

    if isinstance(value, (jax.Array, jax.core.Tracer)):
        return jnp
    return np
