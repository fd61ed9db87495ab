"""Mesh construction and batch sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a 2-D (data, model) device mesh.

    Args:
        data_parallel: size of the data axis; defaults to
            ``num_devices // model_parallel``.
        model_parallel: size of the model axis.
        devices: devices to use (default: all).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        assert n % model_parallel == 0, (
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (
        f"mesh {data_parallel}x{model_parallel} != {n} devices"
    )
    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, axis_names)


def host_shard_info(mesh: Optional[Mesh] = None) -> Tuple[int, int]:
    """(shard_id, num_shards) for this host's input pipeline — feed these to
    ``ShuffledShardedInputCallable`` (the reference's rank/world_size)."""
    return jax.process_index(), jax.process_count()


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place a (pytree of) process-local host batch array(s) onto the mesh,
    sharded along the leading (batch) dimension over ``data_axis``.

    Single-process: equivalent to a sharded ``jax.device_put``. Multi-host:
    uses ``jax.make_array_from_process_local_data`` so each host contributes
    its local shard (the DDP-free batch distribution path, SURVEY §2.3).
    """

    def put(x):
        x = np.asarray(x)
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)


def shard_like_batch(mesh: Mesh, ndim: int, data_axis: str = "data") -> NamedSharding:
    """NamedSharding for a rank-``ndim`` array sharded on its leading dim."""
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))
