"""Worker for the 2-process elastic-resume test (test_elastic_multihost.py).

One shard of a W-process preemptible fleet: real ``jax.distributed``
process, full ``TPUPipeline`` over :class:`ElasticShardedInputCallable`
with the multi-host device mesh (``shard_batch`` assembles the global
batch), consumes ``n_deliveries`` batches in lockstep, then emits its
consumed sample ids and the pipeline checkpoint as ONE JSON line — the
process boundary the single-process elastic tests cannot cross.

Reference analog: the DDP input contract,
``inputs/sfuffled_sharded_input_callable.py:32-126``.
"""

import json
import os
import sys

# 2 virtual CPU devices per process -> 4 global devices over 2 processes
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=2"


def main():
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])
    num_processes = int(sys.argv[3])
    n_deliveries = int(sys.argv[4])
    echo_factor = int(sys.argv[5])
    seed = int(sys.argv[6])
    n_samples = int(sys.argv[7])
    batch_size = int(sys.argv[8])
    # optional: path to a JSON file {"kwargs": ..., "state": ...} produced
    # by elastic_reshard on ANOTHER fleet's checkpoint — this worker then
    # joins a RESUMED fleet (the growth direction, e.g. W=1 -> W'=2)
    resume = None
    if len(sys.argv) > 9 and sys.argv[9]:
        with open(sys.argv[9]) as f:
            resume = json.load(f)

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from accvlab_tpu.parallel import host_shard_info, make_mesh
    from accvlab_tpu.pipeline import PipelineDefinition
    from accvlab_tpu.pipeline.inputs import ElasticShardedInputCallable
    from test_elastic_sharding import IdxProvider

    shard_id, num_shards = host_shard_info()
    assert (shard_id, num_shards) == (process_id, num_processes)

    inp = ElasticShardedInputCallable(
        IdxProvider(n_samples),
        batch_size,
        shard_id=shard_id,
        num_shards=num_shards,
        shuffle=True,
        seed=seed,
        **(resume["kwargs"] if resume else {}),
    )
    defn = PipelineDefinition(
        inp, [], copy_external_source_passthrough_outputs=False
    )
    mesh = make_mesh()  # (data=4, model=1) over the 2-process global mesh
    pipe = defn.get_pipeline(
        batch_size=batch_size,
        num_threads=1,
        seed=1,
        mesh=mesh,
        echo_factor=echo_factor,
    )

    @jax.jit
    def global_sum(b):
        return jnp.sum(b)

    ids_per_delivery = []
    global_sums = []
    try:
        if resume:
            pipe.set_state(resume["state"])
        for _ in range(n_deliveries):
            out = pipe.run()["idx"]  # global (B*W, 1) array on the mesh
            # this process's rows = its addressable shards (its input shard)
            local = np.concatenate(
                [np.asarray(s.data) for s in out.addressable_shards]
            )
            ids_per_delivery.append(sorted(local.ravel().tolist()))
            # SPMD agreement probe: the jitted global reduction must see the
            # SAME assembled global batch on every process
            global_sums.append(float(global_sum(out)))
        state = pipe.get_state()
    finally:
        pipe.stop()

    print(
        "ELASTIC "
        + json.dumps(
            {
                "pid": process_id,
                "ids_per_delivery": ids_per_delivery,
                "global_sums": global_sums,
                "state": state,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
