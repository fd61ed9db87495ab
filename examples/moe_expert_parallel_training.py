"""Expert-parallel MoE training over a (data x expert) mesh.

The Mixture-of-Experts scaling pattern on TPU: expert weights carry a
leading expert dimension that shards over the mesh ``expert`` axis, batches
shard over ``data``, and GSPMD inserts the cross-expert combine — no
host-side routing, no dynamic shapes (dense dispatch keeps everything
MXU-shaped; see ``accvlab_tpu/models/moe.py``). Both routings run:
``num_selected=1`` (Switch) and ``num_selected=2`` (GShard-style top-2 with
renormalized gates).

Run (single chip or CPU mesh):
    python examples/moe_expert_parallel_training.py
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/moe_expert_parallel_training.py   # 2x4 data x expert
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from accvlab_tpu.models.moe import (
    MoEClassifier,
    make_moe_example_batch,
    make_moe_shardings,
    make_moe_train_step,
)


def _expert_mesh():
    n = len(jax.devices())
    expert = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    data = max(1, n // expert)
    devices = mesh_utils.create_device_mesh((data, expert))
    return Mesh(devices, axis_names=("data", "expert"))


def train(num_selected: int, steps: int = 40):
    model = MoEClassifier(
        num_experts=8, dim=32, num_classes=5, num_selected=num_selected
    )
    batch = make_moe_example_batch(batch_size=8, tokens=16, in_dim=12, num_classes=5)
    init_fn, train_step = make_moe_train_step(model)
    params = init_fn(jax.random.PRNGKey(0), batch["tokens"])

    mesh = _expert_mesh()
    params_sh, batch_sh = make_moe_shardings(mesh, params, batch)
    with mesh:
        params = jax.device_put(params, params_sh)
        b = jax.device_put(batch, batch_sh)
        # pin the OUTPUT params to the same layout so the update loop is a
        # fixed point (GSPMD would otherwise re-shard small replicated
        # params over 'expert' and the next call's in_shardings mismatch)
        step = jax.jit(train_step, static_argnums=(2,),
                       in_shardings=(params_sh, batch_sh),
                       out_shardings=(params_sh, None))
        first = None
        for _ in range(steps):
            params, metrics = step(params, b, 5e-2)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first, "training did not reduce the loss"

    # the expert weights really live sharded over the expert axis
    w_in = params["params"]["SwitchFFN_0"]["w_in"]
    n_expert_shards = mesh.devices.shape[1]
    shard_experts = {s.data.shape[0] for s in w_in.addressable_shards}
    assert shard_experts == {8 // n_expert_shards}, shard_experts
    return mesh, float(metrics["loss"])


def main():
    for k in (1, 2):
        mesh, loss = train(num_selected=k)
        d, e = mesh.devices.shape
        print(
            f"top-{k} routing on a {d}x{e} (data x expert) mesh: "
            f"final loss {loss:.4f} — each device holds {8 // e} experts"
        )


if __name__ == "__main__":
    main()
