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

__all__ = ["make_grad_accum_step"]


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
