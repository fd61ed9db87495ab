"""Weight-only int8/int4 quantization for serving artifacts.

Serving inference is usually weight-bandwidth-bound on small batches: the
params stream from HBM every step while activations stay tiny. Per-channel
symmetric int8 weight quantization cuts that stream (and the serving
artifact, and the checkpoint) by ~4x vs float32 at sub-percent output
error for conv/dense models — the standard production trade, built here
the TPU way: quantized leaves are ordinary pytree nodes, and
:func:`dequantize_params` is traced INTO the served program, so the
artifact's baked constants are the int8 tensors and XLA fuses the
``q * scale`` dequant into the consumer matmul/conv (weights leave HBM as
int8; the MXU consumes the bf16/f32 product).

Scope: weight-only (activations stay float). This preserves accuracy
without calibration data and needs no changes to the model code —
``model.apply(dequantize_params(qp), x)`` is the whole integration.

``bits=4`` halves the stream again (~8x vs float32): nibbles pack two per
byte over the flattened reduction rows, with per-``group_size``-rows
scales recovering the accuracy a 15-level grid costs; the elementwise
unpack fuses into the consumer op, so HBM traffic is the packed bytes.

Typical flow::

    qp = quantize_params(params)                       # pytree, int8 leaves
    fn = freeze_params_quantized(model.apply, qp)      # dequant inside trace
    art = export_inference(fn, (example,), ...)        # int8 consts baked
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

#: leaves smaller than this many elements stay unquantized (biases, norm
#: scales — negligible bytes, disproportionate accuracy cost)
_DEFAULT_MIN_SIZE = 1024


@jax.tree_util.register_pytree_node_class
class QuantizedTensor:
    """A quantized weight: ``values ~= q * scale``. A pytree node, so
    quantized params trees flow through jit, device_put, checkpointing,
    and export like any other params tree.

    Two storage formats:

    * ``bits=8`` — int8 ``q`` in the weight's own shape, per-last-axis
      (output-channel) scales.
    * ``bits=4`` — two's-complement nibbles packed two-per-uint8 over the
      flattened reduction rows (``q`` has shape ``(rows_padded/2, C)``),
      with per-``group_size``-rows x per-channel scales. ``shape`` always
      reports the LOGICAL weight shape; :meth:`dequantize` unpacks
      in-graph (elementwise shifts/masks XLA fuses into the consumer, so
      the HBM stream is the packed bytes).
    """

    def __init__(self, q, scale, orig_dtype="float32", *, bits=8,
                 logical_shape=None, group_size=None):
        self.q = q
        self.scale = scale
        self.orig_dtype = str(orig_dtype)
        self.bits = int(bits)
        self._logical_shape = (
            tuple(logical_shape) if logical_shape is not None else None
        )
        self.group_size = group_size

    @property
    def shape(self):
        return self._logical_shape or tuple(np.shape(self.q))

    def dequantize(self, dtype=None):
        dt = jnp.dtype(dtype or self.orig_dtype)
        if self.bits == 8:
            return (self.q.astype(jnp.float32) * self.scale).astype(dt)
        # int4: unpack nibble pairs -> rows, broadcast group scales, slice
        shape = self._logical_shape
        c = shape[-1]
        rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
        lo = self.q & jnp.uint8(0x0F)
        hi = self.q >> jnp.uint8(4)
        # two's-complement nibble decode: [0..15] -> [-8..7]
        dec = lambda n: (n.astype(jnp.int8) ^ jnp.int8(8)) - jnp.int8(8)
        q_rows = jnp.stack([dec(lo), dec(hi)], axis=1).reshape(-1, c)
        g = self.scale.shape[0]
        per_group = q_rows.shape[0] // g
        scale_rows = jnp.broadcast_to(
            self.scale, (g, per_group, c)
        ).reshape(-1, c)
        w = (q_rows.astype(jnp.float32) * scale_rows)[:rows]
        return w.reshape(shape).astype(dt)

    def tree_flatten(self):
        return (self.q, self.scale), (
            self.orig_dtype, self.bits, self._logical_shape, self.group_size,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale = children
        if isinstance(aux, str):  # pre-int4 aux format (plain orig_dtype)
            return cls(q, scale, aux)
        orig_dtype, bits, logical_shape, group_size = aux
        return cls(q, scale, orig_dtype, bits=bits,
                   logical_shape=logical_shape, group_size=group_size)

    def __repr__(self):
        return (
            f"QuantizedTensor(shape={tuple(self.shape)}, bits={self.bits}, "
            f"orig_dtype={self.orig_dtype})"
        )


def _quantize_leaf(w) -> QuantizedTensor:
    """Per-output-channel (last axis) symmetric int8: scale = amax/127."""
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=tuple(range(w32.ndim - 1)), keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q, scale.astype(jnp.float32), jnp.asarray(w).dtype)


def _quantize_leaf_int4(w, group_size: Optional[int]) -> QuantizedTensor:
    """Grouped symmetric int4: the flattened reduction rows split into
    ``group_size``-row groups, each with its own per-channel scale
    (``amax/7``); nibbles pack two rows per uint8 byte."""
    shape = tuple(np.shape(w))
    w32 = jnp.asarray(w, jnp.float32).reshape(-1, shape[-1])
    rows, c = w32.shape
    gs = rows if group_size is None else int(group_size)
    if gs < 1:
        raise ValueError(f"group_size={group_size} must be >= 1")
    n_groups = -(-rows // gs)
    if (n_groups * gs) % 2:
        # nibble pairs need an even total row count; gs odd with an odd
        # row total gets one extra all-padding group (odd+odd = even),
        # keeping every group uniform for the dequant broadcast (the pad
        # group's amax is 0 -> scale 1, its nibbles decode to 0)
        n_groups += 1
    rows_p = n_groups * gs
    w_pad = jnp.pad(w32, ((0, rows_p - rows), (0, 0)))
    wg = w_pad.reshape(n_groups, gs, c)
    amax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)  # (G, 1, C)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
    flat = q.reshape(rows_p, c)
    nib = flat.astype(jnp.uint8) & jnp.uint8(0x0F)
    packed = nib[0::2] | (nib[1::2] << jnp.uint8(4))  # (rows_p/2, C)
    return QuantizedTensor(
        packed, scale, jnp.asarray(w).dtype, bits=4,
        logical_shape=shape, group_size=gs,
    )


def quantize_params(
    params,
    *,
    min_size: int = _DEFAULT_MIN_SIZE,
    predicate: Optional[Callable[[Any], bool]] = None,
    bits: int = 8,
    group_size: Optional[int] = None,
):
    """Quantize every float leaf with ``ndim >= 2`` and ``size >= min_size``.

    Biases, norm parameters, and tiny tensors stay as-is (their bytes are
    negligible; their precision is not). ``predicate(leaf) -> bool``
    overrides the default rule when given. Returns a same-structure tree
    with :class:`QuantizedTensor` nodes at the quantized positions.

    Args:
        bits: 8 (per-channel int8, the default) or 4 (nibble-packed int4 —
            ~8x smaller than float32; weights leave HBM as packed bytes and
            the unpack is elementwise, fused by XLA into the consumer).
        group_size: int4 only — rows per scale group over the flattened
            reduction axis (e.g. 64/128). Smaller groups recover accuracy
            the 15-level grid costs; ``None`` = one group (per-channel
            scales like int8).
    """
    if bits not in (8, 4):
        raise ValueError(f"bits={bits} must be 8 or 4")
    if bits == 8 and group_size is not None:
        raise ValueError("group_size applies to bits=4 only")

    def should(leaf) -> bool:
        if isinstance(leaf, QuantizedTensor):
            return False  # idempotent: never re-quantize (nor its scales)
        if predicate is not None:
            return bool(predicate(leaf))
        # dtype read without materializing: jnp.asarray would device-
        # transfer every leaf (incl. never-quantized biases) just to ask
        return (
            hasattr(leaf, "ndim")
            and hasattr(leaf, "dtype")
            and leaf.ndim >= 2
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and np.prod(np.shape(leaf)) >= min_size
        )

    quant = (
        _quantize_leaf if bits == 8
        else (lambda w: _quantize_leaf_int4(w, group_size))
    )
    return jax.tree_util.tree_map(
        lambda leaf: quant(leaf) if should(leaf) else leaf,
        params,
        is_leaf=lambda x: isinstance(x, QuantizedTensor),
    )


def dequantize_params(qparams, dtype=None):
    """Reconstruct a float params tree; jit/trace-safe (use INSIDE the
    served function so the int8 tensors are what gets baked/stored)."""
    return jax.tree_util.tree_map(
        lambda leaf: leaf.dequantize(dtype) if isinstance(leaf, QuantizedTensor) else leaf,
        qparams,
        is_leaf=lambda x: isinstance(x, QuantizedTensor),
    )


def freeze_params_quantized(apply_fn: Callable, qparams, dtype=None) -> Callable:
    """Close ``apply_fn`` over quantized params with the dequant traced in —
    the quantized counterpart of :func:`serving.freeze_params`."""

    def frozen(*args):
        return apply_fn(dequantize_params(qparams, dtype), *args)

    return frozen


def params_nbytes(params) -> int:
    """Total leaf bytes (QuantizedTensor counts q + scale) — for reporting
    the quantization win."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    ):
        if isinstance(leaf, QuantizedTensor):
            total += int(np.prod(leaf.q.shape)) + int(np.prod(leaf.scale.shape)) * 4
        else:
            arr = np.asarray(leaf)
            total += arr.size * arr.itemsize
    return total
