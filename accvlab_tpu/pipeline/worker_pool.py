"""Process-based sample workers for the pipeline executor.

Equivalent of DALI's parallel external source worker processes
(``pipeline.py:246-254`` in the reference: ``parallel=True`` +
``prefetch_queue_depth``): the input callable and the host-placed steps run
in spawned worker processes, sidestepping the GIL for host stages that are
pure-Python-bound. Thread workers (the default) are cheaper and sufficient
when the host stage releases the GIL (JPEG/video decode via C libraries).

The callable and host steps are pickled once at pool start (spawn), mirroring
DALI's requirement that external-source callables be picklable.

Sample RESULTS avoid the pickle pipe for bulk data: leaves above
``_SHM_THRESHOLD`` bytes travel through POSIX shared memory (one segment per
sample, written once by the worker, copied once by the parent, then
unlinked) — the pickle path costs ~0.5 ms/sample for image-sized arrays
(measured, docs/performance.md), the shm path a ~10x cheaper mmap + memcpy.
Small leaves keep the simple pickle path.
"""

from __future__ import annotations

import multiprocessing as mp
import os
from multiprocessing import resource_tracker, shared_memory

import numpy as np

_SHM_THRESHOLD = 64 * 1024  # bytes; below this, pickling is cheaper than mmap

# worker-process globals (set by the initializer)
_W_INPUT = None
_W_STEPS = None
_W_INPUT_BLUEPRINT = None
_W_CHECK = False
_W_SEED = 0
_W_POOL_PID = 0  # pool-parent pid, captured AT POOL INIT (os.getppid() at
# export time would report pid 1 for a worker orphaned by a crashed parent,
# shielding its segments from the orphan sweep forever)


def _init_worker(input_callable, host_steps, input_blueprint, check, seed, pool_pid):
    global _W_INPUT, _W_STEPS, _W_INPUT_BLUEPRINT, _W_CHECK, _W_SEED, _W_POOL_PID
    _W_INPUT = input_callable
    _W_STEPS = host_steps
    _W_INPUT_BLUEPRINT = input_blueprint
    _W_CHECK = check
    _W_SEED = seed
    _W_POOL_PID = pool_pid


def _worker_process_sample(args):
    """Load one sample and run the per-sample host steps; returns the flat
    numpy leaf list (or the string 'EPOCH_END')."""
    from .inputs.base import SampleInfo
    from .random_context import HostRandomContext

    idx_in_batch, iteration, epoch, batch_size = args
    info = SampleInfo(
        idx_in_epoch=iteration * batch_size + idx_in_batch,
        idx_in_batch=idx_in_batch,
        iteration=iteration,
        epoch_idx=epoch,
    )
    # never let an exception escape to pool.map: a raising task makes map()
    # DISCARD the other samples' results — and with shm transport those
    # results own /dev/shm segments only the parent can unlink. Errors ride
    # back as values so the parent imports (and frees) every result first.
    try:
        try:
            flat = _W_INPUT(info)
        except StopIteration:
            return "EPOCH_END"
        sdg = _W_INPUT_BLUEPRINT.get_empty_like_self()
        sdg.set_data(list(flat))
        if _W_STEPS:
            rng = HostRandomContext(
                np.random.default_rng((_W_SEED, epoch, iteration, idx_in_batch))
            )
            for step in _W_STEPS:
                if step.is_batch_level:
                    continue
                step.set_random_context(rng)
                sdg = step(sdg) if _W_CHECK else step._process(sdg)
        return _export_flat([np.asarray(v) for v in sdg.get_data()])
    except BaseException as e:  # noqa: BLE001
        import traceback

        return ("error", f"{type(e).__name__}: {e}\n{traceback.format_exc()}")


def _export_flat(flat):
    """Pack large leaves into one shared-memory segment; return a transport
    descriptor list (small leaves ride the pickle pipe as-is).

    Segment names are tagged with the POOL PARENT's pid
    (``accvlab<ppid>_...``): the parent sweeps dead-parent orphans at pool
    start (see :func:`_sweep_orphan_segments`), so segments leaked by a
    hard-crashed worker/parent are reclaimed by the next run rather than
    accumulating in /dev/shm forever."""
    import uuid

    big = [
        (i, a) for i, a in enumerate(flat)
        if a.nbytes >= _SHM_THRESHOLD and a.dtype != object
    ]
    if not big:
        return ("pickle", flat)
    total = sum(int(np.ascontiguousarray(a).nbytes) for _, a in big)
    name = f"accvlab{_W_POOL_PID}_{uuid.uuid4().hex[:12]}"
    shm = shared_memory.SharedMemory(create=True, size=total, name=name)
    try:
        descriptors = list(flat)
        off = 0
        for i, a in big:
            a = np.ascontiguousarray(a)
            shm.buf[off : off + a.nbytes] = memoryview(a).cast("B")
            descriptors[i] = ("__shm__", off, a.shape, a.dtype.str)
            off += a.nbytes
    except BaseException:
        shm.close()
        shm.unlink()  # never orphan a half-written segment
        try:  # and drop it from this worker's tracker (already gone)
            resource_tracker.unregister(shm._name, "shared_memory")  # noqa: SLF001
        except Exception:
            pass
        raise
    shm.close()
    # the parent owns the segment's lifetime (it unlinks after copying);
    # unregister so this worker's resource tracker doesn't also unlink it
    try:
        resource_tracker.unregister(shm._name, "shared_memory")  # noqa: SLF001
    except Exception:
        pass
    return ("shm", shm.name, descriptors)


def _sweep_orphan_segments():
    """Unlink /dev/shm segments tagged with a pool-parent pid that is no
    longer alive (crashed parent / hard-killed worker left them behind)."""
    try:
        entries = os.listdir("/dev/shm")
    except OSError:
        return
    for entry in entries:
        if not entry.startswith("accvlab"):
            continue
        pid_part = entry[len("accvlab"):].split("_", 1)[0]
        if not pid_part.isdigit():
            continue
        pid = int(pid_part)
        if pid == os.getpid():
            continue  # may be in flight in this very process
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            try:
                os.unlink(os.path.join("/dev/shm", entry))
            except OSError:
                pass
        except PermissionError:
            pass  # alive under another uid — not ours to touch


def _import_result(result):
    """Parent-side inverse of ``_export_flat``."""
    if isinstance(result, str):
        return result
    kind = result[0]
    if kind == "error":
        return result  # handled (raised) by produce_batch AFTER all imports
    if kind == "pickle":
        return result[1]
    _, shm_name, descriptors = result
    shm = shared_memory.SharedMemory(name=shm_name)
    try:
        flat = []
        for d in descriptors:
            if isinstance(d, tuple) and len(d) == 4 and d[0] == "__shm__":
                _, off, shape, dtype = d
                view = np.ndarray(shape, np.dtype(dtype), buffer=shm.buf, offset=off)
                flat.append(view.copy())  # one memcpy; segment freed below
            else:
                flat.append(d)
        return flat
    finally:
        shm.close()
        shm.unlink()


class ProcessSampleWorkers:
    """Spawned worker pool running input-callable + host steps per sample."""

    def __init__(self, num_workers, input_callable, host_steps, input_blueprint, check, seed):
        _sweep_orphan_segments()  # reclaim dead-parent /dev/shm leftovers
        ctx = mp.get_context("spawn")
        self._pool = ctx.Pool(
            processes=num_workers,
            initializer=_init_worker,
            initargs=(input_callable, host_steps, input_blueprint, check, seed,
                      os.getpid()),
        )
        # liveness baseline for the produce_batch watchdog (reading the
        # private worker list is the only visibility mp.Pool offers; the
        # attribute has been stable across CPython 3.x)
        self._worker_pids = {w.pid for w in self._pool._pool}
        self._broken = False

    def _check_workers_alive(self):
        """Detect a hard-killed worker (OOM killer, SIGKILL). mp.Pool
        silently REPLACES a dead worker but the task it was running is
        lost, so a bare ``map`` blocks forever — the watchdog turns that
        into a loud error. Both signals are needed: ``exitcode`` catches a
        death the pool has not reaped yet; a changed pid set catches one
        it already replaced."""
        workers = list(self._pool._pool)
        dead = [w for w in workers if w.exitcode not in (None, 0)]
        now_pids = {w.pid for w in workers}
        if dead or now_pids != self._worker_pids:
            self._broken = True
            detail = (
                f"exitcode {dead[0].exitcode} (pid {dead[0].pid})"
                if dead
                else f"worker set changed {sorted(self._worker_pids)} -> "
                     f"{sorted(now_pids)}"
            )
            raise RuntimeError(
                "a pipeline worker process died mid-batch — "
                f"{detail}. The in-flight sample is lost (commonly the OOM "
                "killer: reduce num_threads/batch memory or use "
                "worker_mode='thread'); the pool is marked broken."
            )

    def produce_batch(self, batch_size: int, iteration: int, epoch: int):
        """Returns a list of flat-leaf lists, or raises StopIteration."""
        if self._broken:
            raise RuntimeError(
                "pipeline worker pool is broken (a worker died earlier); "
                "re-create the pipeline"
            )
        # check BEFORE dispatch too: a worker killed while idle is silently
        # replaced by the pool and fast batches can complete inside the
        # first wait() below without ever consulting the watchdog — the
        # death would go unreported (and an idle-killed worker leaves the
        # inqueue lock orphaned, so the pool MUST be declared broken for
        # shutdown() to take the force path)
        self._check_workers_alive()
        args = [(i, iteration, epoch, batch_size) for i in range(batch_size)]
        async_res = self._pool.map_async(_worker_process_sample, args)
        while True:
            async_res.wait(0.5)
            if async_res.ready():
                break
            self._check_workers_alive()
        results = [_import_result(r) for r in async_res.get()]
        # every successful sample's shm is now attached+freed; only then
        # surface worker errors
        for r in results:
            if isinstance(r, tuple) and len(r) == 2 and r[0] == "error":
                raise RuntimeError(f"pipeline worker failed:\n{r[1]}")
        if any(isinstance(r, str) and r == "EPOCH_END" for r in results):
            raise StopIteration
        return results

    def shutdown(self):
        """Stop the pool — safe even after a hard-killed worker.

        ``Pool.terminate()`` is NOT safe then: a worker blocked in
        ``inqueue.get()`` holds the queue's reader lock while it waits, so
        SIGKILLing it orphans the lock (POSIX semaphore — nothing releases
        it), and ``_terminate_pool -> _help_stuff_finish`` deadlocks on
        ``inqueue._rlock.acquire()`` (observed as a forever-hang of
        ``pipe.stop()`` in CI). When the pool is broken we bypass the
        graceful path entirely; when it looks healthy we still bound the
        graceful path with a timeout and fall back, because a worker death
        the watchdog never observed leaves the same orphaned lock."""
        import threading

        if not self._broken:
            done = threading.Event()

            def _graceful():
                try:
                    self._pool.terminate()
                    self._pool.join()
                except Exception:
                    pass
                finally:
                    done.set()

            t = threading.Thread(
                target=_graceful, name="accvlab-pool-shutdown", daemon=True
            )
            t.start()
            if done.wait(10.0):
                return
            self._broken = True  # abandoned; fall through to force-kill
        self._force_shutdown()

    def _force_shutdown(self):
        """Kill-path teardown that never touches the (possibly orphaned)
        inqueue lock: stop the respawn loop, SIGKILL the workers, and cancel
        the pool's atexit finalizer so interpreter exit cannot re-enter the
        deadlocking ``_terminate_pool``. Helper threads are daemons; the
        queues' fds are reclaimed with the process."""
        from multiprocessing import pool as mp_pool

        p = self._pool
        try:
            p._state = mp_pool.TERMINATE  # noqa: SLF001
            p._worker_handler._state = mp_pool.TERMINATE  # noqa: SLF001
            p._change_notifier.put(None)  # noqa: SLF001 — wake the handler
        except Exception:
            pass
        try:
            p._worker_handler.join(5.0)  # noqa: SLF001 — stop respawns
        except Exception:
            pass
        for w in list(getattr(p, "_pool", [])):
            try:
                w.kill()
            except Exception:
                pass
        for w in list(getattr(p, "_pool", [])):
            try:
                w.join(5.0)
            except Exception:
                pass
        try:
            p._terminate.cancel()  # noqa: SLF001 — disarm the atexit path
        except Exception:
            pass
