"""Training-step utilities (TPU-idiomatic composition helpers).

Beyond reference parity (the reference leaves the training loop to the
user): utilities every large-scale trainer ends up writing, shaped for
XLA — compiler-friendly control flow (``lax.scan``), static shapes, and
compatibility with ``jit``/``pjit`` sharding and
:func:`accvlab_tpu.tools.shared_jit`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["make_grad_accum_step", "ema_init", "ema_update", "ema_params"]


def ema_init(params):
    """Initialize an exponential-moving-average state as a COPY of
    ``params`` (same pytree/shardings — the EMA shards with the model).
    A real copy, not an alias: the standard production step donates its
    param buffers (``jit(step, donate_argnums=0)``), and an aliased EMA
    would be deleted with them on the first step."""
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)


def ema_update(ema, params, decay: float = 0.999, step=None):
    """One EMA step: ``ema = decay * ema + (1 - decay) * params``.

    Serving from EMA weights is the standard production stabilizer for
    detection models (CenterNet-family training ships EMA'd weights).
    Pure function of pytrees — jit/pjit-compatible, so it fuses into the
    train step at negligible cost (one fma per weight, HBM-bound).

    Args:
        decay: the asymptotic decay.
        step: optional current step (int or traced scalar) enabling the
            standard warmup correction ``min(decay, (1 + step) / (10 +
            step))`` so early steps track the fast-moving params instead
            of the random init.
    """
    d = jnp.asarray(decay, jnp.float32)
    if step is not None:
        s = jnp.asarray(step, jnp.float32)
        d = jnp.minimum(d, (1.0 + s) / (10.0 + s))

    def upd(e, p):
        if not jnp.issubdtype(jnp.asarray(e).dtype, jnp.inexact):
            return p  # integer leaves (step counters) track params directly
        de = d.astype(e.dtype)
        return e * de + p.astype(e.dtype) * (1 - de)

    return jax.tree_util.tree_map(upd, ema, params)


def ema_params(ema):
    """The EMA state IS the serving params pytree; returned as-is (named
    for call-site clarity: ``save_inference(path, apply, ema_params(ema),
    ...)``)."""
    return ema


def make_grad_accum_step(loss_fn, optimizer, accum_steps: int, remat: bool = False):
    """Build a gradient-accumulation train step.

    Splits the leading (batch) axis of every batch leaf into
    ``accum_steps`` equal microbatches, accumulates the mean of the
    per-microbatch gradients with one ``lax.scan`` (ONE compiled loop body
    — not ``accum_steps`` unrolled copies), and applies a single optimizer
    update. For a mean-reduced ``loss_fn`` this is numerically the
    full-batch step at ~1/``accum_steps`` of the activation memory — the
    standard lever when the per-step batch does not fit HBM
    (``jax.checkpoint`` on top via ``remat=True`` trades further memory
    for recompute).

    Args:
        loss_fn: ``loss_fn(params, microbatch) -> scalar`` (mean over the
            microbatch; any aux must be folded in by the caller).
        optimizer: an optax ``GradientTransformation``.
        accum_steps: number of microbatches; every batch leaf's leading
            dim must be divisible by it.
        remat: rematerialize the loss computation in the backward pass.

    Returns:
        ``train_step(params, opt_state, batch) -> (params, opt_state,
        loss)`` — jit/pjit-compatible (batch leaves shard over the data
        axis as usual; the scan carries only the gradient tree).
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps={accum_steps} must be >= 1")
    grad_fn = jax.value_and_grad(loss_fn)
    if remat:
        grad_fn = jax.checkpoint(grad_fn)

    def _split(leaf):
        n = leaf.shape[0]
        if n % accum_steps:
            raise ValueError(
                f"batch leading dim {n} is not divisible by "
                f"accum_steps={accum_steps}"
            )
        return leaf.reshape(accum_steps, n // accum_steps, *leaf.shape[1:])

    def train_step(params, opt_state, batch):
        micro = jax.tree_util.tree_map(_split, batch)

        def body(acc, mb):
            acc_grads, acc_loss = acc
            loss, grads = grad_fn(params, mb)
            acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
            return (acc_grads, acc_loss + loss), None

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        (grads, loss_sum), _ = jax.lax.scan(body, (zero, 0.0), micro)
        scale = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss_sum * scale

    return train_step
