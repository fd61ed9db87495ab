"""GPipe-style pipeline parallelism over a mesh ``pipe`` axis (TPU-native).

The canonical jax pipeline recipe (scaling-book style): stage parameters
carry a leading stage dim sharded over ``pipe``; ``shard_map`` gives each
device its stage; a ``lax.scan`` over ``n_micro + n_stages - 1`` ticks
streams microbatches through the ring with ``lax.ppermute`` moving
activations stage-to-stage over ICI. The first/last ``n_stages - 1`` ticks
are the pipeline bubble; valid outputs are sliced out at the end.

Production properties (not just a dryrun sketch):

* **Output collection is collective-free.** Final-stage outputs leave the
  ``shard_map`` as a ``pipe``-sharded array and the caller slices the last
  stage's shard — no cross-stage ``psum`` broadcast (each stage's slice is
  written locally; only the consumer of the slice moves bytes, once).
  :func:`pipeline_loss` goes further: only the per-tick scalar loss leaves
  the pipeline, so activations never cross the shard_map boundary at all.
* **GPipe activation memory via remat.** With ``remat=True`` (default)
  each stage application is wrapped in :func:`jax.checkpoint`, so the
  backward pass saves only the inter-stage activations (one microbatch per
  tick per stage — the GPipe schedule's residency) and recomputes the
  intra-stage intermediates. Without it the scan transpose would hold every
  intermediate of every stage application for all ticks.
* **Microbatch gradient accumulation comes from the scan transpose.**
  ``jax.grad`` of :func:`pipeline_loss` accumulates parameter cotangents
  across the scan ticks into a single ``(stage, ...)`` gradient buffer —
  exactly GPipe's "accumulate grads over microbatches, apply once"
  schedule, with O(1)-in-``n_micro`` parameter-grad memory. XLA schedules
  the interleaving of recompute/backward per tick (on TPU this is the 1F1B
  analogue: the hand-written 1F1B ordering exists to bound live
  activations, which remat already does here; JAX/XLA own the instruction
  schedule, so there is no separate schedule to write).

Inputs are replicated over ``pipe`` (every stage holds the microbatched
input array); shard big inputs over the data axes via ``data_spec``. The
pipeline bubble is ``(n_stages - 1) / (n_micro + n_stages - 1)`` of the
ticks — use ``n_micro >= 4 * n_stages`` to keep it under ~20%.

This is the ``pp`` member of the dp/tp/sp/ep/pp sharding family exercised
by ``__graft_entry__.dryrun_multichip``. The reference framework has no
pipeline-parallel component (its parallelism is DDP data-parallel input
sharding, SURVEY §2.3); this module is beyond-parity capability.
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


def _shard_map_kwargs():
    # the promoted jax.shard_map (>=0.8) tracks varying-manual-axes itself
    # and no longer takes check_rep; the experimental fallback still does
    mod = shard_map.__module__
    if mod.startswith("jax.") and "experimental" not in mod:
        return {}
    return {"check_rep": False}


def _mark_pipe_varying(x, pipe_axis: str):
    # promoted shard_map tracks varying-manual-axes: the scan carry becomes
    # pipe-varying after the first ppermute, so mark the init to match
    if hasattr(lax, "pcast"):
        return lax.pcast(x, (pipe_axis,), to="varying")
    if hasattr(lax, "pvary"):  # pragma: no cover - older spelling
        return lax.pvary(x, (pipe_axis,))
    return x  # pragma: no cover - experimental shard_map, no tracking


def _data_axis_names(data_spec: P):
    """Flatten a PartitionSpec's entries to the mesh-axis names it uses."""
    names = []
    for entry in data_spec:
        if entry is None:
            continue
        if isinstance(entry, (tuple, list)):
            names.extend(entry)
        else:
            names.append(entry)
    return tuple(names)


def _pipeline_ticks(stage_fn, params_slice, xs_local, *, n_stages, n_micro,
                    pipe_axis, emit):
    """Shared tick loop: stream ``n_micro`` microbatches through the stage
    ring, calling ``emit(y, t)`` on each tick's local stage output to form
    the per-tick scan output (``emit`` decides what, if anything, the tick
    contributes — the final-stage activation, a loss scalar, ...)."""
    stage = lax.axis_index(pipe_axis)
    ticks = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(buf, t):
        # stage 0 ingests microbatch t (clamped in the drain phase);
        # later stages consume what the previous stage sent last tick
        x_in = jnp.where(stage == 0, xs_local[jnp.clip(t, 0, n_micro - 1)], buf)
        y = stage_fn(params_slice, x_in)
        buf_next = lax.ppermute(y, pipe_axis, perm)
        return buf_next, emit(y, t)

    init = _mark_pipe_varying(jnp.zeros_like(xs_local[0]), pipe_axis)
    return lax.scan(tick, init, jnp.arange(ticks))


def pipeline_apply(
    stage_params,
    xs: jnp.ndarray,
    stage_fn,
    *,
    mesh,
    pipe_axis: str = "pipe",
    data_spec: P = P(),
    remat: bool = True,
    param_specs=None,
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
        remat: wrap each stage application in :func:`jax.checkpoint` so the
            backward pass keeps only inter-stage activations (GPipe memory).
            Forward values are unchanged; set ``False`` to trade memory for
            skipping the recompute.
        param_specs: optional pytree of :class:`PartitionSpec` matching
            ``stage_params`` for COMPOSING pipeline with tensor parallelism:
            every leaf spec must keep ``pipe_axis`` on the leading stage dim
            and may shard other dims over further mesh axes (e.g.
            ``P('pipe', None, 'model')`` for a column-parallel kernel);
            ``stage_fn`` then sees per-device shards and owns the matching
            collectives (``lax.psum(..., 'model')`` for row-parallel
            contractions). Default: every leaf ``P(pipe_axis)``.

    Returns:
        ``(n_micro, micro_batch, ...)`` outputs of the final stage. The
        values live on the final pipeline stage's devices (sharded per
        ``data_spec`` over the data axes); downstream consumers pull them
        from there — there is no cross-stage collective in this function.
    """
    n_stages = mesh.shape[pipe_axis]
    n_micro = xs.shape[0]

    if param_specs is None:
        param_specs = jax.tree_util.tree_map(lambda _: P(pipe_axis), stage_params)
    xs_spec = P(None, *data_spec)  # PartitionSpec is publicly iterable
    out_spec = P(pipe_axis, None, *data_spec)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, xs_spec),
        out_specs=out_spec,
        **_shard_map_kwargs(),
    )
    def run(params_local, xs_local):
        stage = lax.axis_index(pipe_axis)
        params_slice = jax.tree_util.tree_map(lambda p: p[0], params_local)
        fn = jax.checkpoint(stage_fn) if remat else stage_fn

        def emit(y, t):
            # only the final stage's steady/drain-phase outputs are real;
            # other stages fill their shard of the output with zeros that
            # the caller-side slice discards without communicating them
            return jnp.where(stage == n_stages - 1, y, jnp.zeros_like(y))

        _, outs = _pipeline_ticks(
            fn, params_slice, xs_local,
            n_stages=n_stages, n_micro=n_micro, pipe_axis=pipe_axis, emit=emit,
        )
        # last stage emitted microbatch i at tick (n_stages - 1) + i
        return outs[n_stages - 1:][None]

    # (n_stages, n_micro, mb, ...) sharded over pipe on dim 0: slicing the
    # last stage's shard replaces the old psum broadcast — O(output) bytes
    # moved once to the consumer instead of O(stages * output) ICI traffic
    return run(stage_params, xs)[n_stages - 1]


def pipeline_loss(
    stage_params,
    xs: jnp.ndarray,
    targets,
    stage_fn,
    loss_fn,
    *,
    mesh,
    pipe_axis: str = "pipe",
    data_spec: P = P(),
    remat: bool = True,
    param_specs=None,
):
    """Pipelined forward + per-microbatch loss, fused into the tick loop.

    The loss is evaluated on the final stage *inside* the scan, so only a
    scalar per tick leaves the pipeline (activations never cross the
    shard_map boundary); ``jax.grad`` of this function is the GPipe
    training schedule — microbatch gradient accumulation via the scan
    transpose, remat-bounded activation memory (see module docstring).

    Args:
        targets: pytree of ``(n_micro, micro_batch, ...)`` arrays aligned
            with ``xs``'s microbatch dim (sharded like ``xs`` over the data
            axes).
        loss_fn: ``loss_fn(y, target_slice) -> scalar`` mean loss over the
            (local shard of the) microbatch. It is also evaluated on
            zeroed activations during bubble ticks (masked out of the
            result) — keep it finite at zero inputs, as standard losses
            are.
        param_specs: see :func:`pipeline_apply` — shard stage-parameter
            dims over further mesh axes to run tensor-parallel stages
            inside the pipeline (``stage_fn`` owns the tp collectives).

    Returns:
        Scalar mean loss over all microbatches (and over the data axes in
        ``data_spec``), replicated across the mesh.
    """
    n_stages = mesh.shape[pipe_axis]
    n_micro = xs.shape[0]

    if param_specs is None:
        param_specs = jax.tree_util.tree_map(lambda _: P(pipe_axis), stage_params)
    xs_spec = P(None, *data_spec)
    tgt_specs = jax.tree_util.tree_map(lambda _: xs_spec, targets)
    data_axes = _data_axis_names(data_spec)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, xs_spec, tgt_specs),
        out_specs=P(),
        **_shard_map_kwargs(),
    )
    def run(params_local, xs_local, tgt_local):
        stage = lax.axis_index(pipe_axis)
        params_slice = jax.tree_util.tree_map(lambda p: p[0], params_local)
        fn = jax.checkpoint(stage_fn) if remat else stage_fn

        def emit(y, t):
            # tick t >= n_stages-1 completes microbatch t - (n_stages-1)
            i = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
            valid = (t >= n_stages - 1) & (stage == n_stages - 1)
            # double-where: zero the activation on invalid ticks BEFORE the
            # loss so bubble-tick garbage can't poison grads via NaN * 0
            y_safe = jnp.where(valid, y, jnp.zeros_like(y))
            tgt_i = jax.tree_util.tree_map(lambda a: a[i], tgt_local)
            return jnp.where(valid, loss_fn(y_safe, tgt_i), 0.0)

        _, per_tick = _pipeline_ticks(
            fn, params_slice, xs_local,
            n_stages=n_stages, n_micro=n_micro, pipe_axis=pipe_axis, emit=emit,
        )
        total = jnp.sum(per_tick) / n_micro
        # O(1) collectives on a scalar: psum pulls the loss off the final
        # stage; pmean averages the per-data-shard means
        total = lax.psum(total, pipe_axis)
        if data_axes:
            total = lax.pmean(total, data_axes)
        return total

    return run(stage_params, xs, targets)
