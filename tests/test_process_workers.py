"""Process-worker-mode pipeline test (DALI parallel external source parity)."""

import numpy as np
import pytest

from accvlab_tpu.pipeline import DType, PipelineDefinition, SampleDataGroup
from accvlab_tpu.pipeline.inputs import DataProvider, ShuffledShardedInputCallable
from accvlab_tpu.pipeline.processing_steps import ImageRange01Normalizer


class TinyProvider(DataProvider):
    """Picklable provider (module-level class; spawn workers re-import it)."""

    @property
    def sample_data_structure(self):
        sdg = SampleDataGroup()
        sdg.add_data_field("image", DType.UINT8)
        sdg.add_data_field("idx", DType.INT32)
        return sdg

    def get_data(self, sample_index):
        sdg = self.sample_data_structure
        sdg["image"] = np.full((4, 6, 3), sample_index % 250, np.uint8)
        sdg["idx"] = sample_index
        return sdg

    def get_number_of_samples(self):
        return 8


@pytest.mark.parametrize("worker_mode", ["thread", "process"])
def test_pipeline_worker_modes_agree(worker_mode):
    inp = ShuffledShardedInputCallable(TinyProvider(), batch_size=4, shuffle=False)
    definition = PipelineDefinition(
        inp, [ImageRange01Normalizer("image")],
        check_data_format=False, copy_external_source_passthrough_outputs=False,
    )
    pipe = definition.get_pipeline(
        batch_size=4, num_threads=2, seed=0, worker_mode=worker_mode
    )
    try:
        batch = pipe.run()
        np.testing.assert_array_equal(np.asarray(batch["idx"]), [0, 1, 2, 3])
        img = np.asarray(batch["image"])
        np.testing.assert_allclose(img[1].max(), 1 / 255, atol=1e-6)
        batch2 = pipe.run()
        np.testing.assert_array_equal(np.asarray(batch2["idx"]), [4, 5, 6, 7])
        with pytest.raises(StopIteration):
            pipe.run()
        pipe.reset()
        b3 = pipe.run()
        np.testing.assert_array_equal(np.asarray(b3["idx"]), [0, 1, 2, 3])
    finally:
        pipe.stop()


class BigProvider(DataProvider):
    """Image-sized samples: leaves above the shm threshold ride shared
    memory, small ones the pickle pipe — outputs must be identical."""

    @property
    def sample_data_structure(self):
        sdg = SampleDataGroup()
        sdg.add_data_field("image", DType.UINT8)
        sdg.add_data_field("idx", DType.INT32)
        return sdg

    def get_data(self, sample_index):
        sdg = self.sample_data_structure
        rng = np.random.default_rng(sample_index)
        sdg["image"] = rng.integers(0, 255, (128, 256, 3), np.uint8)  # 96 KB
        sdg["idx"] = sample_index
        return sdg

    def get_number_of_samples(self):
        return 8


def test_process_workers_shm_transport_bit_identical_and_no_leak():
    import glob

    def run(worker_mode):
        inp = ShuffledShardedInputCallable(BigProvider(), batch_size=4, shuffle=False)
        definition = PipelineDefinition(
            inp, [ImageRange01Normalizer("image")],
            check_data_format=False, copy_external_source_passthrough_outputs=False,
        )
        pipe = definition.get_pipeline(
            batch_size=4, num_threads=2, seed=0, worker_mode=worker_mode
        )
        try:
            out = [np.asarray(pipe.run()["image"]) for _ in range(2)]
        finally:
            pipe.stop()
        return out

    before = set(glob.glob("/dev/shm/accvlab*"))
    thread_out = run("thread")
    process_out = run("process")
    for a, b in zip(thread_out, process_out):
        np.testing.assert_array_equal(a, b)
    leaked = set(glob.glob("/dev/shm/accvlab*")) - before
    assert not leaked, f"leaked shm segments: {leaked}"


class FailingProvider(BigProvider):
    """Sample 2 of each batch raises — the other samples' shm segments must
    still be attached and freed (no /dev/shm leak), and the error surfaces."""

    def get_data(self, sample_index):
        if sample_index % 4 == 2:
            raise ValueError("synthetic sample failure")
        return super().get_data(sample_index)


def test_process_worker_error_surfaces_without_shm_leak():
    import glob

    before = set(glob.glob("/dev/shm/accvlab*"))
    inp = ShuffledShardedInputCallable(FailingProvider(), batch_size=4, shuffle=False)
    definition = PipelineDefinition(
        inp, [ImageRange01Normalizer("image")],
        check_data_format=False, copy_external_source_passthrough_outputs=False,
    )
    pipe = definition.get_pipeline(
        batch_size=4, num_threads=2, seed=0, worker_mode="process"
    )
    try:
        with pytest.raises(Exception, match="synthetic sample failure"):
            pipe.run()
    finally:
        pipe.stop()
    leaked = set(glob.glob("/dev/shm/accvlab*")) - before
    assert not leaked, f"leaked shm segments after worker failure: {leaked}"


class SlowProvider(DataProvider):
    """Picklable slow provider: keeps a batch in flight long enough for the
    test to kill a worker mid-map."""

    @property
    def sample_data_structure(self):
        sdg = SampleDataGroup()
        sdg.add_data_field("x", DType.FLOAT)
        return sdg

    def get_data(self, sample_index):
        import time

        time.sleep(0.08)
        sdg = self.sample_data_structure
        sdg["x"] = np.zeros((4,), np.float32)
        return sdg

    def get_number_of_samples(self):
        return 256


def test_hard_killed_worker_raises_instead_of_hanging():
    """OOM-killer scenario: SIGKILL a process worker mid-batch. mp.Pool
    silently replaces the dead worker but its in-flight sample is lost —
    a bare pool.map blocks forever. The liveness watchdog must surface a
    RuntimeError to the consumer within seconds, and the pipeline must
    still stop cleanly (regression: pipe.run() hung until an external
    timeout killed the process)."""
    import os
    import signal
    import time

    inp = ShuffledShardedInputCallable(SlowProvider(), batch_size=4, shuffle=False)
    definition = PipelineDefinition(
        inp, [], check_data_format=False,
        copy_external_source_passthrough_outputs=False,
    )
    pipe = definition.get_pipeline(
        batch_size=4, num_threads=2, seed=0, worker_mode="process"
    )
    try:
        pipe.run()  # pool is warm, a batch is in flight in the producer
        victim = pipe._workers._pool._pool[0].pid
        os.kill(victim, signal.SIGKILL)
        t0 = time.time()
        with pytest.raises(RuntimeError, match="worker process died"):
            for _ in range(8):
                pipe.run()
        assert time.time() - t0 < 30.0, "watchdog too slow"
        # the pool is marked broken: further production fails fast
        with pytest.raises(RuntimeError, match="broken|died"):
            pipe._workers.produce_batch(4, 0, 0)
    finally:
        pipe.stop()  # must not hang


def test_shutdown_after_idle_kill_does_not_deadlock():
    """The deadlock the watchdog CANNOT prevent: a worker blocked in
    ``inqueue.get()`` holds the queue's reader lock while it waits, so
    SIGKILLing an IDLE worker orphans that POSIX semaphore forever and
    ``Pool.terminate()`` deadlocks acquiring it (_help_stuff_finish,
    multiprocessing/pool.py:675 — the intermittent CI suite hang).
    Killing BOTH idle workers guarantees the lock died held; shutdown()
    must still return promptly via the force-kill path."""
    import os
    import signal
    import time

    from accvlab_tpu.pipeline.worker_pool import ProcessSampleWorkers

    inp = ShuffledShardedInputCallable(TinyProvider(), batch_size=4, shuffle=False)
    workers = ProcessSampleWorkers(
        2, inp, [], TinyProvider().sample_data_structure, False, 0
    )
    try:
        workers.produce_batch(4, 0, 0)  # pool warm
        time.sleep(0.5)  # both workers settle back into inqueue.get()
        for w in list(workers._pool._pool):
            os.kill(w.pid, signal.SIGKILL)
        # the next batch can never complete; the watchdog must raise
        with pytest.raises(RuntimeError, match="worker process died"):
            workers.produce_batch(4, 1, 0)
    finally:
        t0 = time.time()
        workers.shutdown()
        assert time.time() - t0 < 15.0, "shutdown deadlocked on the orphaned lock"
