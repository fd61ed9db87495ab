"""accvlab_tpu.parallel — device-mesh input sharding & batch distribution.

The TPU-native substrate replacing what the reference gets from DALI
per-rank ``device_id`` + ``torch.distributed`` DDP (SURVEY §2.3/§5.8):

* :func:`make_mesh` / :func:`make_mesh_nd` — build a ``jax.sharding.Mesh``
  over (data, model) axes, or any N-D layout (dp/sp/tp/...).
* :func:`shard_batch` — place a process-local host batch onto the mesh,
  sharded over the data axis (``jax.make_array_from_process_local_data``);
  this is the ICI/DCN-aware replacement for both the reference copy engine's
  H2D path and DDP batch placement.
* :func:`host_shard_info` — the per-host (shard_id, num_shards) pair to feed
  :class:`~accvlab_tpu.pipeline.inputs.ShuffledShardedInputCallable`.
* :func:`make_fsdp_shardings` — ZeRO-3/FSDP-style parameter shardings over
  the data axis (GSPMD inserts per-use all-gathers and gradient
  reduce-scatters; ~1/axis_size weight memory per device).
"""

from .mesh import (
    host_shard_info,
    make_fsdp_shardings,
    make_mesh,
    make_mesh_nd,
    shard_batch,
    shard_like_batch,
)
from .pipeline_parallel import pipeline_apply, pipeline_loss

__all__ = [
    "host_shard_info",
    "make_fsdp_shardings",
    "make_mesh",
    "make_mesh_nd",
    "pipeline_apply",
    "pipeline_loss",
    "shard_batch",
    "shard_like_batch",
]
