"""Micro-batching inference server (models/server.py).

The reference ships no serving runtime (SURVEY §5.4 — training state is the
user's; deployment ends at training), so this is beyond-parity capability;
the tests pin the batching policy (bucket selection, padding, delay window),
the client contract (futures, per-request error fan-out, drain-on-close),
and artifact-backed serving end to end.
"""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accvlab_tpu.models.server import InferenceServer, ServerClosed, _stack_samples
from accvlab_tpu.ragged import RaggedBatch


def _double_fn(x):
    return x * 2.0


def test_results_match_direct_under_concurrency():
    server = InferenceServer(jax.jit(_double_fn), batch_sizes=(1, 2, 4), max_delay_ms=1.0)
    samples = [np.full((3,), i, np.float32) for i in range(24)]
    results = [None] * len(samples)

    def client(lo, hi):
        for i in range(lo, hi):
            results[i] = server.infer(samples[i], timeout=60)

    threads = [threading.Thread(target=client, args=(i * 8, (i + 1) * 8)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.close()
    for i, r in enumerate(results):
        assert r.shape == (1, 3)  # leading dim preserved
        np.testing.assert_array_equal(np.asarray(r), samples[i][None] * 2.0)
    st = server.stats()
    assert st["requests"] == 24
    assert st["errors"] == 0
    assert st["batches"] <= 24
    assert sum(st["batch_size_counts"].values()) == st["batches"]


def test_bucket_selection_and_padding():
    seen = []

    def spy_fn(x):
        seen.append(x.shape[0])
        return x + 1.0

    server = InferenceServer(spy_fn, batch_sizes=(1, 2, 4), max_delay_ms=250.0)
    futs = [server.submit(np.float32([i])) for i in range(3)]
    outs = [f.result(timeout=60) for f in futs]
    server.close()
    # 3 requests inside one delay window -> one batch padded to bucket 4
    assert seen == [4]
    for i, o in enumerate(outs):
        np.testing.assert_array_equal(np.asarray(o), [[i + 1.0]])
    st = server.stats()
    assert st["padded_samples"] == 1
    assert st["batch_size_counts"] == {4: 1}


def test_oversized_burst_splits_into_max_bucket_batches():
    seen = []

    def spy_fn(x):
        seen.append(x.shape[0])
        return x

    server = InferenceServer(spy_fn, batch_sizes=(2,), max_delay_ms=100.0)
    futs = [server.submit(np.float32([i])) for i in range(5)]
    for f in futs:
        f.result(timeout=60)
    server.close()
    assert all(s == 2 for s in seen) and sum(seen) >= 5


def test_error_fans_out_per_batch_and_server_survives():
    def picky_fn(x):
        if float(np.max(x)) > 100.0:
            raise ValueError("bad sample")
        return x

    server = InferenceServer(picky_fn, batch_sizes=(1,), max_delay_ms=0.0)
    bad = server.submit(np.float32([101.0]))
    with pytest.raises(ValueError, match="bad sample"):
        bad.result(timeout=60)
    # server keeps serving after an error
    ok = server.infer(np.float32([1.0]), timeout=60)
    np.testing.assert_array_equal(np.asarray(ok), [[1.0]])
    st = server.stats()
    assert st["errors"] == 1
    server.close()


def test_close_drains_queued_requests():
    release = threading.Event()

    def slow_fn(x):
        release.wait(30)
        return x

    server = InferenceServer(slow_fn, batch_sizes=(1,), max_delay_ms=0.0)
    futs = [server.submit(np.float32([i])) for i in range(4)]
    release.set()
    server.close(drain=True)
    for i, f in enumerate(futs):
        np.testing.assert_array_equal(np.asarray(f.result(timeout=0)), [[float(i)]])
    with pytest.raises(ServerClosed):
        server.submit(np.float32([0.0]))


def test_drain_covers_requests_racing_with_close():
    """A request that lands in the queue AFTER the close sentinel (the
    submit/close race the closed-flag check cannot eliminate) is still
    completed when drain=True."""
    from accvlab_tpu.models.server import _Request

    started = threading.Event()
    release = threading.Event()

    def slow_fn(x):
        started.set()
        release.wait(30)
        return x

    server = InferenceServer(slow_fn, batch_sizes=(1,), max_delay_ms=0.0)
    first = server.submit(np.float32([7.0]))
    assert started.wait(30)
    closer = threading.Thread(target=server.close, kwargs={"drain": True})
    closer.start()
    time.sleep(0.05)  # let close() enqueue the sentinel
    racer = _Request((np.float32([9.0]),))
    server._q.put(racer)  # simulates a submit that lost the race
    release.set()
    closer.join(30)
    assert not closer.is_alive()
    np.testing.assert_array_equal(np.asarray(first.result(timeout=0)), [[7.0]])
    np.testing.assert_array_equal(np.asarray(racer.future.result(timeout=0)), [[9.0]])


def test_close_without_drain_fails_pending():
    started = threading.Event()
    release = threading.Event()

    def slow_fn(x):
        started.set()
        release.wait(30)
        return x

    server = InferenceServer(slow_fn, batch_sizes=(1,), max_delay_ms=0.0)
    first = server.submit(np.float32([0.0]))
    assert started.wait(30)
    # enqueued behind the in-flight batch; will be cancelled
    pending = [server.submit(np.float32([i])) for i in range(3)]
    closer = threading.Thread(target=server.close, kwargs={"drain": False})
    closer.start()
    time.sleep(0.05)
    release.set()
    closer.join(30)
    assert not closer.is_alive()
    first.result(timeout=30)  # in-flight batch still completes
    for f in pending:
        with pytest.raises(ServerClosed):
            f.result(timeout=30)


def test_structured_ragged_output_splits_intact():
    def detect_fn(x):  # (B, 4) -> RaggedBatch (B, 3) with per-sample sizes
        b = x.shape[0]
        tensor = jnp.tile(x[:, :3], (1, 1)) + 1.0
        sizes = jnp.clip(x[:, 0].astype(jnp.int32), 0, 3)
        return {"dets": RaggedBatch(tensor, sample_sizes=sizes), "plain": x * 0.5}

    server = InferenceServer(detect_fn, batch_sizes=(1, 4), max_delay_ms=100.0)
    futs = [server.submit(np.float32([i, 10 + i, 20 + i, 0])) for i in range(4)]
    outs = [f.result(timeout=60) for f in futs]
    server.close()
    for i, out in enumerate(outs):
        rb = out["dets"]
        assert isinstance(rb, RaggedBatch)
        assert rb.tensor.shape == (1, 3)
        np.testing.assert_allclose(
            np.asarray(rb.tensor), [[i + 1.0, 11.0 + i, 21.0 + i]]
        )
        assert int(np.asarray(rb.sample_sizes)[0]) == min(i, 3)
        assert out["plain"].shape == (1, 4)


def test_warmup_compiles_every_bucket_and_serving_retraces_nothing():
    traces = []

    @jax.jit
    def fn(x):
        traces.append(x.shape[0])
        return x * 3.0

    server = InferenceServer(fn, batch_sizes=(1, 2, 4), max_delay_ms=50.0)
    server.warmup(np.zeros((5,), np.float32))
    assert sorted(traces) == [1, 2, 4]
    futs = [server.submit(np.full((5,), i, np.float32)) for i in range(3)]
    for f in futs:
        f.result(timeout=60)
    server.close()
    assert sorted(traces) == [1, 2, 4]  # no new compile during traffic


def test_artifact_backed_server(tmp_path):
    from accvlab_tpu.models import serving

    w = np.arange(12, dtype=np.float32).reshape(3, 4)

    def apply_fn(params, x):
        return {"y": x @ params, "norm": jnp.sum(x, axis=-1)}

    path = str(tmp_path / "model.accvserve")
    serving.save_inference(
        path, apply_fn, jnp.asarray(w), np.zeros((2, 3), np.float32),
        batch_polymorphic=True,
    )
    server = InferenceServer.from_artifact(path, batch_sizes=(1, 2), max_delay_ms=100.0)
    server.warmup(np.zeros((3,), np.float32))
    x0 = np.float32([1, 2, 3])
    x1 = np.float32([4, 5, 6])
    f0, f1 = server.submit(x0), server.submit(x1)
    r0, r1 = f0.result(60), f1.result(60)
    server.close()
    np.testing.assert_allclose(np.asarray(r0["y"]), (x0[None] @ w))
    np.testing.assert_allclose(np.asarray(r1["y"]), (x1[None] @ w))
    np.testing.assert_allclose(np.asarray(r1["norm"]), [15.0])


def test_output_contract_violation_fails_futures_not_thread():
    def bad_fn(x):  # scalar output — no leading batch dim
        return jnp.sum(x)

    server = InferenceServer(bad_fn, batch_sizes=(1,), max_delay_ms=0.0)
    with pytest.raises(ValueError, match="leading batch dim"):
        server.infer(np.float32([1.0]), timeout=60)
    # dispatcher survived; a well-formed fn error path still responds
    with pytest.raises(ValueError, match="leading batch dim"):
        server.infer(np.float32([2.0]), timeout=60)
    server.close()


def test_stack_samples_pads_by_replication():
    stacked = _stack_samples([(np.float32([1, 2]),), (np.float32([3, 4]),)], 4)
    np.testing.assert_array_equal(stacked[0], [[1, 2], [3, 4], [3, 4], [3, 4]])


def test_invalid_batch_sizes_rejected():
    with pytest.raises(ValueError):
        InferenceServer(_double_fn, batch_sizes=())
    with pytest.raises(ValueError):
        InferenceServer(_double_fn, batch_sizes=(0, 2))


def test_context_manager_closes():
    with InferenceServer(jax.jit(_double_fn), batch_sizes=(1,), max_delay_ms=0.0) as server:
        np.testing.assert_array_equal(
            np.asarray(server.infer(np.float32([2.0]), timeout=60)), [[4.0]]
        )
    with pytest.raises(ServerClosed):
        server.submit(np.float32([0.0]))


def test_cancelled_future_does_not_kill_dispatcher():
    """A client cancelling a queued Future must not wedge the server
    (fulfilling a cancelled future raises InvalidStateError)."""
    release = threading.Event()

    def slow_fn(x):
        release.wait(30)
        return x

    server = InferenceServer(slow_fn, batch_sizes=(1,), max_delay_ms=0.0)
    blocker = server.submit(np.float32([0.0]))  # occupies the dispatcher
    queued = server.submit(np.float32([1.0]))
    assert queued.cancel()  # still queued -> cancellable
    release.set()
    blocker.result(timeout=60)
    # dispatcher survived the cancelled request; server keeps serving
    np.testing.assert_array_equal(
        np.asarray(server.infer(np.float32([3.0]), timeout=60)), [[3.0]]
    )
    server.close()


def test_submit_close_race_straggler_is_reaped():
    """A request that lands in the queue after close() fully drained (the
    TOCTOU window submit's closed-check cannot eliminate) is completed by
    the reap path instead of hanging forever."""
    from accvlab_tpu.models.server import _Request

    server = InferenceServer(_double_fn, batch_sizes=(1,), max_delay_ms=0.0)
    server.close()  # dispatcher fully drained and exited
    # simulate the losing side of the race: enqueue directly, then reap as
    # submit() would on noticing closed+dead
    racer = _Request((np.float32([4.0]),))
    server._q.put(racer)
    server._reap_stragglers()
    np.testing.assert_array_equal(np.asarray(racer.future.result(timeout=0)), [[8.0]])


@pytest.mark.parametrize("depth", [2, 3])
def test_pipeline_depth_correctness_under_burst(depth):
    """Overlapped dispatch (pipeline_depth > 1) must deliver the same
    per-request results, in completion order, and flush when idle."""
    server = InferenceServer(
        jax.jit(_double_fn), batch_sizes=(1, 2), max_delay_ms=1.0,
        pipeline_depth=depth,
    )
    futs = [server.submit(np.full((2,), i, np.float32)) for i in range(12)]
    for i, f in enumerate(futs):
        np.testing.assert_array_equal(np.asarray(f.result(timeout=60)),
                                      np.full((1, 2), i) * 2.0)
    # idle flush: nothing should remain unresolved without more traffic
    extra = server.infer(np.float32([5.0, 5.0]), timeout=60)
    np.testing.assert_array_equal(np.asarray(extra), [[10.0, 10.0]])
    st = server.stats()
    server.close()
    assert st["requests"] == 13
    assert st["errors"] == 0


def test_pipeline_depth_dispatch_error_attributed_to_its_batch():
    def picky_fn(x):
        if float(np.max(x)) > 100.0:
            raise ValueError("poison")
        return x

    server = InferenceServer(picky_fn, batch_sizes=(1,), max_delay_ms=0.0,
                             pipeline_depth=2)
    good1 = server.submit(np.float32([1.0]))
    bad = server.submit(np.float32([200.0]))
    good2 = server.submit(np.float32([2.0]))
    np.testing.assert_array_equal(np.asarray(good1.result(60)), [[1.0]])
    with pytest.raises(ValueError, match="poison"):
        bad.result(60)
    np.testing.assert_array_equal(np.asarray(good2.result(60)), [[2.0]])
    server.close()


def test_pipeline_depth_validation():
    with pytest.raises(ValueError, match="pipeline_depth"):
        InferenceServer(_double_fn, pipeline_depth=0)


def test_sharded_artifact_served_through_server():
    """Multi-chip serving: a model-parallel sharded artifact (weights split
    over the 'model' axis, inputs replicated) served through the
    micro-batching server on a fresh mesh."""
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from accvlab_tpu.models import serving

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(
        mesh_utils.create_device_mesh((2,), devices=jax.devices()[:2]),
        axis_names=("model",),
    )
    w = np.arange(24, dtype=np.float32).reshape(4, 6)
    w_sharded = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P(None, "model")))
    art = serving.export_inference(
        lambda x: {"y": x @ w_sharded},
        (np.zeros((2, 4), np.float32),),  # sharded exports fix the batch
        mesh=mesh,
        in_shardings=(NamedSharding(mesh, P()),),  # inputs replicated
    )
    # serve on a FRESH same-shape mesh (different device permutation)
    mesh2 = Mesh(
        mesh_utils.create_device_mesh((2,), devices=jax.devices()[1::-1]),
        axis_names=("model",),
    )
    server = InferenceServer.from_artifact(
        art, mesh=mesh2, batch_sizes=(2,), max_delay_ms=50.0
    )
    x0 = np.float32([1, 0, 0, 0])
    x1 = np.float32([0, 1, 0, 1])
    f0, f1 = server.submit(x0), server.submit(x1)
    np.testing.assert_allclose(np.asarray(f0.result(60)["y"]), (x0[None] @ w))
    np.testing.assert_allclose(np.asarray(f1.result(60)["y"]), (x1[None] @ w))
    # a lone request pads to the exported batch and still serves
    np.testing.assert_allclose(
        np.asarray(server.infer(x0, timeout=60)["y"]), (x0[None] @ w)
    )
    server.close()


def test_from_artifact_fixed_batch_defaults_to_export_bucket(tmp_path):
    """A non-polymorphic artifact accepts exactly its export batch; the
    server must default to that single bucket, not (1, 2, 4, 8)."""
    from accvlab_tpu.models import serving

    w = np.eye(3, dtype=np.float32) * 3.0
    path = str(tmp_path / "fixed.accvserve")
    serving.save_inference(
        path, lambda p, x: x @ p, jnp.asarray(w), np.zeros((4, 3), np.float32)
    )
    server = InferenceServer.from_artifact(path, max_delay_ms=50.0)
    assert server._buckets == (4,)
    out = server.infer(np.float32([1, 2, 3]), timeout=60)  # padded 1 -> 4
    server.close()
    np.testing.assert_allclose(np.asarray(out), [[3.0, 6.0, 9.0]])
