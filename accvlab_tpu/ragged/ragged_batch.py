"""RaggedBatch: padded-dense representation of variable-size-per-sample batches.

TPU-native re-design of the reference's ``RaggedBatch``
(``packages/batching_helpers/accvlab/batching_helpers/data_format/ragged_batch.py:31-1111``
in ACCV-Lab). The semantics are identical — a batch is represented by

* ``tensor``: padded data, shape ``(*batch_shape, ..., max_sample_size, ...)``
  with the non-uniform dimension at ``non_uniform_dim``;
* ``mask``: bool validity mask, shape ``(*batch_shape, max_sample_size)``;
* ``sample_sizes``: per-sample valid counts, shape ``batch_shape``;

— but the implementation is functional JAX:

* ``RaggedBatch`` is a **registered pytree**, so instances flow through
  ``jax.jit`` / ``jax.vmap`` / ``jax.grad`` / ``pjit`` transparently, and can be
  sharded over a :class:`jax.sharding.Mesh` (shard the leading batch dim).
* "In-place" reference operations (``set_padded_to``, ``__setitem__``) rebind
  the instance's ``tensor`` to a new functional array; XLA's buffer donation
  removes the copy in compiled code.
* ``mask`` <-> ``sample_sizes`` lazy derivation is preserved (both are cheap
  fused XLA element-wise ops: ``iota < sizes`` and ``sum(mask)``).
* Shapes are static under ``jit``; size-data-dependent constructors
  (``FromOversizeTensor``) take an optional static bound for jitted use.

Integer sizes use int32 (the native TPU integer width) instead of the
reference's int64.
"""

from __future__ import annotations

import inspect
from typing import Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _callable_positional_arity(fn: Callable) -> int:
    """Positional arity of any callable — plain functions, lambdas,
    ``functools.partial``, bound methods, and ``__call__`` objects.

    ``inspect.signature`` already accounts for ``self`` binding and
    partial-applied arguments; callables it cannot introspect (C functions)
    default to arity 1, as does ``*args``.
    """
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return 1
    n = 0
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            n += 1
        elif p.kind == p.VAR_POSITIONAL:
            return 1
    return n

Array = jax.Array
ArrayLike = Union[Array, np.ndarray]

SIZE_DTYPE = jnp.int32


def _as_array(x) -> Array:
    if isinstance(x, Array):
        return x
    return jnp.asarray(x)


class RaggedBatch:
    """Batch container for samples with variable size in one dimension.

    See module docstring; behavioral parity with the reference class at
    ``batching_helpers/data_format/ragged_batch.py:31``.

    The instance is a pytree whose leaves are ``(tensor, mask, sample_sizes)``
    (``None`` entries for not-yet-derived mask/sizes are preserved through
    flatten/unflatten), with ``(non_uniform_dim, num_batch_dims)`` as static
    aux data.

    Warning:
        ``mask`` and ``sample_sizes`` must be consistent if both are given;
        this is not checked (same contract as the reference).
    """

    __slots__ = (
        "_tensor",
        "_mask",
        "_sample_sizes",
        "_non_uniform_dim",
        "_num_batch_dims",
        "_batch_shape",
        "_total_num_targets",
    )

    def __init__(
        self,
        tensor: ArrayLike,
        mask: Optional[ArrayLike] = None,
        sample_sizes: Optional[ArrayLike] = None,
        non_uniform_dim: Optional[int] = None,
    ):
        assert (
            mask is not None or sample_sizes is not None
        ), "At least one of `mask` or `sample_sizes` needs to be set"

        tensor = _as_array(tensor)
        mask = _as_array(mask) if mask is not None else None
        sample_sizes = _as_array(sample_sizes) if sample_sizes is not None else None

        if sample_sizes is not None:
            num_batch_dims = sample_sizes.ndim
        else:
            num_batch_dims = mask.ndim - 1

        assert num_batch_dims > 0, "Number of batch dimensions needs to be greater than 0"
        assert (
            num_batch_dims < tensor.ndim
        ), "The number of dimensions of the tensor needs to be at least num_batch_dims + 1"

        if non_uniform_dim is None:
            non_uniform_dim = num_batch_dims
        if non_uniform_dim < 0:
            non_uniform_dim = tensor.ndim + non_uniform_dim

        assert (
            num_batch_dims <= non_uniform_dim < tensor.ndim
        ), "Non-uniform dimension needs to be in the range [num_batch_dims; tensor.ndim["

        assert mask is None or (
            mask.shape[:num_batch_dims] == tensor.shape[:num_batch_dims]
            and mask.shape[num_batch_dims] == tensor.shape[non_uniform_dim]
        ), (
            "Shape of `tensor` does not match the required shape:\n"
            f"  According to mask: batch {mask.shape[:num_batch_dims]}, max sample size {mask.shape[num_batch_dims]}\n"
            f"  According to tensor: batch {tensor.shape[:num_batch_dims]}, max sample size {tensor.shape[non_uniform_dim]}"
        )
        assert sample_sizes is None or (
            sample_sizes.shape[:num_batch_dims] == tensor.shape[:num_batch_dims]
        ), (
            "Batch shape according to `tensor` does not match `sample_sizes`:\n"
            f"  tensor: {tensor.shape[:num_batch_dims]}  sample_sizes: {sample_sizes.shape[:num_batch_dims]}"
        )

        self._tensor = tensor
        self._mask = mask
        self._sample_sizes = sample_sizes
        self._non_uniform_dim = int(non_uniform_dim)
        self._num_batch_dims = int(num_batch_dims)
        self._batch_shape = tuple(tensor.shape[:num_batch_dims])
        self._total_num_targets = None

    # ------------------------------------------------------------------ #
    # Constructors                                                       #
    # ------------------------------------------------------------------ #

    @classmethod
    def FromOversizeTensor(
        cls,
        tensor: ArrayLike,
        mask: Optional[ArrayLike] = None,
        sample_sizes: Optional[ArrayLike] = None,
        non_uniform_dim: Optional[int] = None,
        max_sample_size: Optional[int] = None,
    ) -> "RaggedBatch":
        """Create from a tensor over-sized in the non-uniform dimension.

        Parity: ``ragged_batch.py:174``. The tensor (and mask) are truncated
        to the maximum sample size in the batch.

        Note:
            The truncation size is data dependent. Outside ``jit`` it is
            computed on the host; under ``jit`` pass a static
            ``max_sample_size`` bound instead (TPU shapes must be static).
        """
        tensor = _as_array(tensor)
        if non_uniform_dim is None:
            if sample_sizes is not None:
                non_uniform_dim = _as_array(sample_sizes).ndim
            elif mask is not None:
                non_uniform_dim = _as_array(mask).ndim - 1
            else:
                raise ValueError("Either `sample_sizes` or `mask` needs to be set")
        if non_uniform_dim < 0:
            non_uniform_dim = tensor.ndim + non_uniform_dim

        if sample_sizes is None:
            sample_sizes = jnp.sum(_as_array(mask), axis=non_uniform_dim, dtype=SIZE_DTYPE)
        else:
            sample_sizes = _as_array(sample_sizes)

        if max_sample_size is None:
            if sample_sizes.size == 0:
                max_sample_size = 0
            else:
                max_sample_size = int(jnp.max(sample_sizes))  # host sync
        tensor = jax.lax.slice_in_dim(tensor, 0, max_sample_size, axis=non_uniform_dim)
        if mask is not None:
            mask = jax.lax.slice_in_dim(_as_array(mask), 0, max_sample_size, axis=non_uniform_dim)
        return cls(tensor, mask, sample_sizes, non_uniform_dim)

    @classmethod
    def Empty(
        cls,
        num_dims: int,
        non_uniform_dim: int,
        device=None,
        num_batch_dims: Optional[int] = None,
        batch_shape: Optional[Union[Sequence[int], int]] = None,
        dtype=jnp.float32,
    ) -> "RaggedBatch":
        """Create an empty instance (size 0 along all dims). Parity: ``ragged_batch.py:234``."""
        assert (
            num_batch_dims is None or batch_shape is None
        ), "Either num_batch_dims or batch_shape can be provided, but not both"

        if num_batch_dims is None and batch_shape is None:
            num_batch_dims = 1
            batch_shape = (0,)
        elif batch_shape is not None:
            if isinstance(batch_shape, int):
                batch_shape = (batch_shape,)
            batch_shape = tuple(batch_shape)
            assert len(batch_shape) > 0, "Batch shape needs to be a non-empty sequence"
            num_batch_dims = len(batch_shape)
        else:
            assert num_batch_dims > 0, "Number of batch dimensions needs to be greater than 0"
            batch_shape = (0,) * num_batch_dims

        assert len(batch_shape) < num_dims
        assert num_batch_dims <= non_uniform_dim < num_dims

        tensor_shape = batch_shape + (0,) * (num_dims - len(batch_shape))
        tensor = jnp.zeros(tensor_shape, dtype=dtype)
        mask = jnp.zeros(batch_shape + (0,), dtype=jnp.bool_)
        sizes = jnp.zeros(batch_shape, dtype=SIZE_DTYPE)
        res = cls(tensor, mask, sizes, non_uniform_dim)
        if device is not None:
            res = res.to_device(device)
        return res

    @classmethod
    def FromFullTensor(
        cls, full_tensor: ArrayLike, non_uniform_dim: int = 1, num_batch_dims: int = 1
    ) -> "RaggedBatch":
        """Create from a uniform-sized batch tensor. Parity: ``ragged_batch.py:295``."""
        full_tensor = _as_array(full_tensor)
        batch_shape = full_tensor.shape[:num_batch_dims]
        assert num_batch_dims > 0
        if non_uniform_dim < 0:
            non_uniform_dim = full_tensor.ndim + non_uniform_dim
        assert num_batch_dims <= non_uniform_dim < full_tensor.ndim
        sample_size = full_tensor.shape[non_uniform_dim]
        mask = jnp.ones((*batch_shape, sample_size), dtype=jnp.bool_)
        sample_sizes = jnp.full(batch_shape, sample_size, dtype=SIZE_DTYPE)
        return cls(full_tensor, mask, sample_sizes, non_uniform_dim)

    # ------------------------------------------------------------------ #
    # Lazy derivation                                                    #
    # ------------------------------------------------------------------ #

    def _init_mask(self):
        sizes = self._sample_sizes
        max_size = self._tensor.shape[self._non_uniform_dim]
        iota = jnp.arange(max_size, dtype=sizes.dtype)
        self._mask = iota < sizes[..., None]

    def _init_sample_sizes(self):
        self._sample_sizes = jnp.sum(self._mask, axis=self._num_batch_dims, dtype=SIZE_DTYPE)

    # ------------------------------------------------------------------ #
    # Properties                                                         #
    # ------------------------------------------------------------------ #

    @property
    def tensor(self) -> Array:
        """The padded data tensor."""
        return self._tensor

    @property
    def mask(self) -> Array:
        """Bool validity mask of shape ``(*batch_shape, max_sample_size)``."""
        if self._mask is None:
            self._init_mask()
        return self._mask

    @property
    def sample_sizes(self) -> Array:
        """Per-sample valid counts of shape ``batch_shape``."""
        if self._sample_sizes is None:
            self._init_sample_sizes()
        return self._sample_sizes

    @property
    def non_uniform_dim(self) -> int:
        return self._non_uniform_dim

    @property
    def num_batch_dims(self) -> int:
        return self._num_batch_dims

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self._batch_shape

    @property
    def total_num_samples_in_batch(self) -> int:
        return int(np.prod(self._batch_shape)) if len(self._batch_shape) else 1

    @property
    def total_num_entries(self):
        """Total number of valid entries (int on host, traced scalar under jit)."""
        if self._total_num_targets is None:
            total = jnp.sum(self.sample_sizes)
            try:
                total = int(total)
            except (jax.errors.TracerIntegerConversionError, jax.errors.ConcretizationTypeError):
                pass
            self._total_num_targets = total
        return self._total_num_targets

    @property
    def max_sample_size(self) -> int:
        return self._tensor.shape[self._non_uniform_dim]

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self._tensor.shape)

    @property
    def dtype(self):
        return self._tensor.dtype

    @property
    def device(self):
        devs = getattr(self._tensor, "devices", None)
        if devs is None:
            return None
        ds = devs()
        return next(iter(ds)) if len(ds) == 1 else ds

    # ------------------------------------------------------------------ #
    # Derived-instance helpers                                           #
    # ------------------------------------------------------------------ #

    def as_self_with_cloned_data(self) -> "RaggedBatch":
        """Copy sharing mask/sizes. JAX arrays are immutable, so no actual clone."""
        return RaggedBatch(self._tensor, self.mask, self.sample_sizes, self._non_uniform_dim)

    def create_with_sample_sizes_like_self(
        self,
        tensor: ArrayLike,
        non_uniform_dim: Optional[int] = None,
        device=None,
    ) -> "RaggedBatch":
        """Create an instance with the same batch shape / sample sizes as ``self``.

        Parity: ``ragged_batch.py:409``.
        """
        tensor = _as_array(tensor)
        if non_uniform_dim is None:
            non_uniform_dim = self._non_uniform_dim
        elif non_uniform_dim < 0:
            non_uniform_dim = tensor.ndim + non_uniform_dim

        assert self._num_batch_dims <= non_uniform_dim < tensor.ndim, (
            f"Non-uniform dimension needs to be in [{self._num_batch_dims}; {tensor.ndim}["
        )
        assert tensor.shape[: self._num_batch_dims] == self._batch_shape, (
            f"Batch shape mismatch: expected {self._batch_shape}, "
            f"got {tensor.shape[: self._num_batch_dims]}"
        )
        assert tensor.shape[non_uniform_dim] == self.shape[self._non_uniform_dim], (
            f"Non-uniform dim size mismatch: expected {self.shape[self._non_uniform_dim]}, "
            f"got {tensor.shape[non_uniform_dim]}"
        )
        if device is not None:
            tensor = jax.device_put(tensor, device)
        res = RaggedBatch(tensor, self.mask, self.sample_sizes, non_uniform_dim)
        res._total_num_targets = self._total_num_targets
        return res

    def get_non_uniform_dimension_transposed_to(self, dim: int) -> "RaggedBatch":
        """Transpose the non-uniform dimension to ``dim``. Parity: ``ragged_batch.py:469``."""
        assert self._num_batch_dims <= dim < self._tensor.ndim
        if dim == self._non_uniform_dim:
            return self
        tensor_t = jnp.swapaxes(self._tensor, self._non_uniform_dim, dim)
        return self.create_with_sample_sizes_like_self(tensor_t, dim)

    # ------------------------------------------------------------------ #
    # Mask application                                                   #
    # ------------------------------------------------------------------ #

    def _mask_shaped_for_data(self) -> Array:
        """Mask reshaped so its size-``max_sample_size`` axis sits at
        ``non_uniform_dim`` and all other non-batch axes are singleton."""
        nbd, nud = self._num_batch_dims, self._non_uniform_dim
        ndim = self._tensor.ndim
        shape = list(self._batch_shape) + [1] * (ndim - nbd)
        shape[nud] = self._tensor.shape[nud]
        return self.mask.reshape(shape)

    def get_existence_weights(self, dtype=jnp.float32) -> Array:
        """1.0 for valid entries, 0.0 for fillers, broadcast to ``tensor.shape``.

        Parity: ``ragged_batch.py:493``.
        """
        return jnp.broadcast_to(self._mask_shaped_for_data(), self._tensor.shape).astype(dtype)

    def with_padded_set_to(self, value_to_set) -> "RaggedBatch":
        """Return a copy with filler entries set to ``value_to_set``.

        Parity: ``ragged_batch.py:524`` (the reference's non-in-place variant).
        """
        masked = jnp.where(
            self._mask_shaped_for_data(),
            self._tensor,
            jnp.asarray(value_to_set, dtype=self._tensor.dtype),
        )
        return self.create_with_sample_sizes_like_self(masked)

    def set_padded_to(self, value_to_set) -> None:
        """Set filler entries to ``value_to_set``, rebinding ``self.tensor``.

        Functionally pure under the hood (JAX arrays are immutable); matches
        the observable behavior of the reference's in-place
        ``set_padded_to`` (``ragged_batch.py:541``). Gradients through the
        padded region are zeroed, like the reference ``SetPaddedTo`` autograd
        function (``data_format/set_padded_to.py:20-43``).
        """
        self._tensor = self.with_padded_set_to(value_to_set)._tensor

    # ------------------------------------------------------------------ #
    # Batch-dim transforms                                               #
    # ------------------------------------------------------------------ #

    def repeat_samples(
        self,
        num_repeats: Union[int, Sequence[int]],
        batch_dim: Optional[int] = None,
    ) -> "RaggedBatch":
        """Repeat (tile) along batch dimension(s). Parity: ``ragged_batch.py:560``."""
        if isinstance(num_repeats, (int, np.integer)):
            if batch_dim is None:
                batch_dim = 0
            assert 0 <= batch_dim < self._num_batch_dims, (
                f"batch_dim must be in range [0, {self._num_batch_dims})"
            )
            tensor_reps = [1] * self._tensor.ndim
            tensor_reps[batch_dim] = num_repeats
            mask_reps = [1] * (self._num_batch_dims + 1)
            mask_reps[batch_dim] = num_repeats
            sizes_reps = [1] * self._num_batch_dims
            sizes_reps[batch_dim] = num_repeats
        else:
            num_repeats = [int(r) for r in num_repeats]
            assert len(num_repeats) == self._num_batch_dims, (
                f"num_repeats must be a sequence of length {self._num_batch_dims}"
            )
            assert batch_dim is None, "batch_dim must be None if num_repeats is a sequence"
            tensor_reps = num_repeats + [1] * (self._tensor.ndim - self._num_batch_dims)
            mask_reps = num_repeats + [1]
            sizes_reps = num_repeats

        tensor = jnp.tile(self._tensor, tensor_reps)
        mask = jnp.tile(self._mask, mask_reps) if self._mask is not None else None
        sizes = jnp.tile(self._sample_sizes, sizes_reps) if self._sample_sizes is not None else None
        return RaggedBatch(tensor, mask, sizes, self._non_uniform_dim)

    def unsqueeze_batch_dim(self, dim: int) -> "RaggedBatch":
        """Add a batch dimension. Parity: ``ragged_batch.py:615``."""
        assert 0 <= dim <= self._num_batch_dims, f"dim must be in range [0, {self._num_batch_dims}]"
        tensor = jnp.expand_dims(self._tensor, dim)
        mask = jnp.expand_dims(self._mask, dim) if self._mask is not None else None
        sizes = jnp.expand_dims(self._sample_sizes, dim) if self._sample_sizes is not None else None
        return RaggedBatch(tensor, mask, sizes, self._non_uniform_dim + 1)

    def squeeze_batch_dim(self, batch_dim: int) -> "RaggedBatch":
        """Remove a size-1 batch dimension. Parity: ``ragged_batch.py:651``."""
        assert 0 <= batch_dim < self._num_batch_dims
        if self._batch_shape[batch_dim] > 1:
            raise ValueError(
                f"Batch dimension {batch_dim} has size {self._batch_shape[batch_dim]} > 1. Cannot squeeze."
            )
        tensor = jnp.squeeze(self._tensor, batch_dim)
        mask = jnp.squeeze(self._mask, batch_dim) if self._mask is not None else None
        sizes = jnp.squeeze(self._sample_sizes, batch_dim) if self._sample_sizes is not None else None
        return RaggedBatch(tensor, mask, sizes, self._non_uniform_dim - 1)

    def reshape_batch_dims(self, new_batch_shape: Union[int, Tuple[int, ...]]) -> "RaggedBatch":
        """Reshape batch dimensions. Parity: ``ragged_batch.py:678``."""
        if isinstance(new_batch_shape, int):
            new_batch_shape = (new_batch_shape,)
        nbd = self._num_batch_dims
        tensor = self._tensor.reshape(*new_batch_shape, *self._tensor.shape[nbd:])
        mask = (
            self._mask.reshape(*new_batch_shape, *self._mask.shape[nbd:])
            if self._mask is not None
            else None
        )
        sizes = (
            self._sample_sizes.reshape(new_batch_shape) if self._sample_sizes is not None else None
        )
        new_nbd = tensor.ndim - (self._tensor.ndim - nbd)
        return RaggedBatch(tensor, mask, sizes, self._non_uniform_dim - nbd + new_nbd)

    def flatten_batch_dims(self) -> "RaggedBatch":
        """Flatten all batch dims into one. Parity: ``ragged_batch.py:711``."""
        return self.reshape_batch_dims(-1)

    def broadcast_batch_dims_to_shape(self, new_batch_shape: Sequence[int]) -> "RaggedBatch":
        new_batch_shape = tuple(int(s) for s in new_batch_shape)
        assert len(new_batch_shape) == self._num_batch_dims
        mult = []
        for cur, new in zip(self._batch_shape, new_batch_shape):
            assert cur != 0 and new % cur == 0, (
                f"Cannot broadcast batch dimensions of {self._batch_shape} to {new_batch_shape}."
            )
            mult.append(new // cur)
        return self.repeat_samples(mult)

    @staticmethod
    def broadcast_batch_dims(data: Sequence["RaggedBatch"]) -> List["RaggedBatch"]:
        """Broadcast several instances to a common batch shape. Parity: ``ragged_batch.py:736``."""
        nbds = {dt.num_batch_dims for dt in data}
        assert len(nbds) == 1, "Cannot broadcast as number of batch dimensions does not match."
        shapes = np.array([dt.batch_shape for dt in data])
        max_shape = shapes.max(axis=0)
        res = []
        for dt, shape in zip(data, shapes):
            assert np.all(shape > 0) and np.all(max_shape % shape == 0), (
                f"Cannot broadcast batch dimensions of {tuple(shape)} to {tuple(max_shape)}."
            )
            res.append(dt.repeat_samples(list(max_shape // shape)))
        return res

    # ------------------------------------------------------------------ #
    # Device / dtype                                                     #
    # ------------------------------------------------------------------ #

    def to_device(self, device) -> "RaggedBatch":
        tensor = jax.device_put(self._tensor, device)
        mask = jax.device_put(self._mask, device) if self._mask is not None else None
        sizes = jax.device_put(self._sample_sizes, device) if self._sample_sizes is not None else None
        return RaggedBatch(tensor, mask, sizes, self._non_uniform_dim)

    def cpu(self) -> "RaggedBatch":
        return self.to_device(jax.devices("cpu")[0])

    def to_dtype(self, dtype) -> "RaggedBatch":
        return RaggedBatch(
            self._tensor.astype(dtype), self.mask, self.sample_sizes, self._non_uniform_dim
        )

    def astype(self, dtype) -> "RaggedBatch":
        return self.to_dtype(dtype)

    def detach(self) -> "RaggedBatch":
        return RaggedBatch(
            jax.lax.stop_gradient(self._tensor), self.mask, self.sample_sizes, self._non_uniform_dim
        )

    def int(self) -> "RaggedBatch":
        return self.create_with_sample_sizes_like_self(self._tensor.astype(jnp.int32))

    def long(self) -> "RaggedBatch":
        # int32 is the native TPU integer width; int64 requires jax_enable_x64.
        target = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        return self.create_with_sample_sizes_like_self(self._tensor.astype(target))

    def bool(self) -> "RaggedBatch":
        return self.create_with_sample_sizes_like_self(self._tensor.astype(jnp.bool_))

    def half(self) -> "RaggedBatch":
        return self.create_with_sample_sizes_like_self(self._tensor.astype(jnp.float16))

    def bfloat16(self) -> "RaggedBatch":
        return self.create_with_sample_sizes_like_self(self._tensor.astype(jnp.bfloat16))

    def float(self) -> "RaggedBatch":
        return self.create_with_sample_sizes_like_self(self._tensor.astype(jnp.float32))

    def double(self) -> "RaggedBatch":
        target = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return self.create_with_sample_sizes_like_self(self._tensor.astype(target))

    def cfloat(self) -> "RaggedBatch":
        """Complex64 conversion (parity: ``ragged_batch.py:1075``)."""
        return self.create_with_sample_sizes_like_self(self._tensor.astype(jnp.complex64))

    def cdouble(self) -> "RaggedBatch":
        """Complex conversion (parity: ``:1079``; complex128 needs
        jax_enable_x64, otherwise canonicalizes to complex64)."""
        target = jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64
        return self.create_with_sample_sizes_like_self(self._tensor.astype(target))

    def to(self, *, dtype=None, device=None) -> "RaggedBatch":
        res = self
        if dtype is not None:
            res = res.create_with_sample_sizes_like_self(res._tensor.astype(dtype))
        if device is not None:
            res = res.to_device(device)
        return res

    # ------------------------------------------------------------------ #
    # Functional application                                             #
    # ------------------------------------------------------------------ #

    def apply(self, proc_step: Callable) -> Union["RaggedBatch", Tuple["RaggedBatch", ...]]:
        """Apply a function to ``tensor`` (optionally with mask / sample_sizes).

        Parity: ``ragged_batch.py:787``. The function receives 1-3 positional
        args depending on its arity: ``(tensor)``, ``(tensor, mask)``, or
        ``(tensor, mask, sample_sizes)``. Outputs must keep the non-uniform
        dimension size and valid-entries-first layout.
        """
        num_args = _callable_positional_arity(proc_step)
        if num_args == 1:
            args = (self._tensor,)
        elif num_args == 2:
            args = (self._tensor, self.mask)
        elif num_args == 3:
            args = (self._tensor, self.mask, self.sample_sizes)
        else:
            raise ValueError(
                f"Function {proc_step} has {num_args} arguments, but only 1, 2, or 3 are supported."
            )
        res_tensor = proc_step(*args)
        if isinstance(res_tensor, tuple):
            return tuple(
                RaggedBatch(rt, self.mask, self.sample_sizes, self._non_uniform_dim)
                for rt in res_tensor
            )
        return RaggedBatch(res_tensor, self.mask, self.sample_sizes, self._non_uniform_dim)

    def set_tensor(self, tensor: ArrayLike) -> None:
        """Rebind the data tensor (shape-checked). Parity: ``ragged_batch.py:842``."""
        tensor = _as_array(tensor)
        assert tensor.shape[: self._num_batch_dims] == self._batch_shape, (
            f"Batch shape of data to set {tensor.shape[: self._num_batch_dims]} does not match "
            f"current batch shape {self._batch_shape}."
        )
        assert tensor.shape[self._non_uniform_dim] == self._tensor.shape[self._non_uniform_dim], (
            "Maximum sample size of data to set does not match current maximum sample size."
        )
        self._tensor = tensor

    def unsqueeze_data_dim(self, dim: int) -> "RaggedBatch":
        """Unsqueeze a data dimension. Parity: ``ragged_batch.py:936``."""
        if dim < 0:
            dim = self._tensor.ndim + 1 + dim
            assert 0 <= dim <= self._tensor.ndim, "Dimension outside the available range"
        assert dim >= self._num_batch_dims, "Can only add dimensions after the batch dimensions"
        tensor = jnp.expand_dims(self._tensor, dim)
        nud = self._non_uniform_dim + 1 if dim <= self._non_uniform_dim else self._non_uniform_dim
        return self.create_with_sample_sizes_like_self(tensor, nud)

    def split(self) -> Union[List[Array], List[list]]:
        """Split into per-sample arrays cropped to actual sizes (host-only).

        Parity: ``ragged_batch.py:870``. Output shapes are data dependent, so
        this cannot run under ``jit``.
        """
        need_transpose = self._non_uniform_dim != self._num_batch_dims
        if need_transpose:
            pre = self.get_non_uniform_dimension_transposed_to(self._num_batch_dims)
        else:
            pre = self
        tensor = pre.tensor
        sizes = np.asarray(pre.sample_sizes)
        orig_nud_unbatched = self._non_uniform_dim - self._num_batch_dims

        def _recurse(batch_idx, batch_dim):
            if batch_dim == self._num_batch_dims:
                size = int(sizes[batch_idx])
                sample = tensor[batch_idx][:size]
                if need_transpose:
                    sample = jnp.swapaxes(sample, 0, orig_nud_unbatched)
                return sample
            return [
                _recurse(batch_idx + (i,), batch_dim + 1)
                for i in range(tensor.shape[batch_dim])
            ]

        return _recurse((), 0)

    # ------------------------------------------------------------------ #
    # Item access                                                        #
    # ------------------------------------------------------------------ #

    def __getitem__(self, item) -> Array:
        return self._tensor[item]

    def __setitem__(self, item, value) -> None:
        """Functional item write: rebinds ``tensor`` to ``tensor.at[item].set(value)``."""
        self._tensor = self._tensor.at[item].set(value)

    def size(self, dim: Optional[int] = None):
        return tuple(self._tensor.shape) if dim is None else self._tensor.shape[dim]

    def dim(self) -> int:
        return self._tensor.ndim

    def __repr__(self) -> str:
        mask_str = "*uninitialized*" if self._mask is None else f"mask={self._mask}"
        sizes_str = (
            "*uninitialized*"
            if self._sample_sizes is None
            else f"sample_sizes={self._sample_sizes}"
        )
        return (
            f"RaggedBatch(tensor={self._tensor}, {mask_str}, {sizes_str}, "
            f"non_uniform_dim={self._non_uniform_dim}, batch_shape={self._batch_shape})"
        )


# ---------------------------------------------------------------------- #
# Pytree registration                                                    #
# ---------------------------------------------------------------------- #


def _rb_flatten(rb: RaggedBatch):
    children = (rb._tensor, rb._mask, rb._sample_sizes)
    aux = (rb._non_uniform_dim, rb._num_batch_dims)
    return children, aux


def _rb_unflatten(aux, children):
    tensor, mask, sample_sizes = children
    non_uniform_dim, num_batch_dims = aux
    obj = object.__new__(RaggedBatch)
    obj._tensor = tensor
    obj._mask = mask
    obj._sample_sizes = sample_sizes
    obj._non_uniform_dim = non_uniform_dim
    obj._num_batch_dims = num_batch_dims
    shape = getattr(tensor, "shape", None)
    obj._batch_shape = tuple(shape[:num_batch_dims]) if shape is not None else ()
    obj._total_num_targets = None
    return obj


jax.tree_util.register_pytree_node(RaggedBatch, _rb_flatten, _rb_unflatten)
