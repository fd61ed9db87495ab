"""GPipe-style pipeline parallelism over a mesh ``pipe`` axis (TPU-native).

The canonical jax pipeline recipe (scaling-book style): stage parameters
carry a leading stage dim sharded over ``pipe``; ``shard_map`` gives each
device its stage; a ``lax.scan`` over ``n_micro + n_stages - 1`` ticks
streams microbatches through the ring with ``lax.ppermute`` moving
activations stage-to-stage over ICI. The first/last ``n_stages - 1`` ticks
are the pipeline bubble; valid outputs are sliced out at the end.

This is the ``pp`` member of the dp/tp/sp/ep/pp sharding family exercised
by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:  # promoted API (jax >= 0.8)
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def pipeline_apply(
    stage_params,
    xs: jnp.ndarray,
    stage_fn,
    *,
    mesh,
    pipe_axis: str = "pipe",
    data_spec: P = P(),
):
    """Run ``stage_fn`` as an ``n_stages``-deep pipeline over microbatches.

    Args:
        stage_params: pytree whose leaves have a LEADING stage dim of size
            ``n_stages`` (shard it over ``pipe_axis``).
        xs: ``(n_micro, micro_batch, ...)`` microbatched input (replicated
            over ``pipe_axis``; optionally sharded over a data axis via
            ``data_spec`` applied to the trailing dims).
        stage_fn: ``stage_fn(params_slice, x) -> y`` with ``y.shape ==
            x.shape`` (uniform inter-stage activation shape — the usual
            transformer-block contract).

    Returns:
        ``(n_micro, micro_batch, ...)`` outputs of the final stage.
    """
    n_stages = mesh.shape[pipe_axis]
    n_micro = xs.shape[0]

    param_specs = jax.tree_util.tree_map(lambda _: P(pipe_axis), stage_params)
    xs_spec = P(None, *data_spec)  # PartitionSpec is publicly iterable

    # the promoted jax.shard_map (>=0.8) tracks varying-manual-axes itself
    # and no longer takes check_rep; the experimental fallback still does
    _kw = {} if shard_map.__module__.startswith("jax.") and "experimental" not in shard_map.__module__ else {"check_rep": False}
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, xs_spec),
        out_specs=xs_spec,
        **_kw,
    )
    def run(params_local, xs_local):
        stage = lax.axis_index(pipe_axis)
        params_slice = jax.tree_util.tree_map(lambda p: p[0], params_local)
        ticks = n_micro + n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(buf, t):
            # stage 0 ingests microbatch t (clamped in the drain phase);
            # later stages consume what the previous stage sent last tick
            x_in = jnp.where(stage == 0, xs_local[jnp.clip(t, 0, n_micro - 1)], buf)
            y = stage_fn(params_slice, x_in)
            buf_next = lax.ppermute(y, pipe_axis, perm)
            out = jnp.where(stage == n_stages - 1, y, jnp.zeros_like(y))
            return buf_next, out

        init = jnp.zeros_like(xs_local[0])
        # promoted shard_map tracks varying-manual-axes: the carry becomes
        # pipe-varying after the first ppermute, so mark the init to match
        if hasattr(lax, "pcast"):
            init = lax.pcast(init, (pipe_axis,), to="varying")
        elif hasattr(lax, "pvary"):
            init = lax.pvary(init, (pipe_axis,))
        _, outs = lax.scan(tick, init, jnp.arange(ticks))
        # last stage emitted microbatch i at tick (n_stages - 1) + i; other
        # stages contributed zeros, so the cross-stage psum just selects it
        outs = outs[n_stages - 1 :]
        return lax.psum(outs, pipe_axis)

    return run(stage_params, xs)
