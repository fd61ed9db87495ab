"""Training-state checkpoint/resume helpers (orbax-backed).

The reference ships no checkpoint/restart support (SURVEY §5.4 — "training
state is the user's"); a production TPU training framework needs it, so this
goes beyond parity: save/restore of (params, opt_state, step) plus the input
pipeline's full resume state (``TPUPipeline.get_state()``) so a run resumes
mid-training with a bit-identical batch stream.

Production surface:

* **Asynchronous saves** (``asynchronous=True``): the device arrays are
  snapshotted synchronously (cheap) and serialization runs in a background
  thread — the train loop never blocks on checkpoint I/O. Call
  :func:`wait_for_checkpoints` before exiting (or rely on the next save,
  which serializes behind the previous one).
* **Retention** (``keep=N``): completed older checkpoints beyond the newest
  ``N`` are garbage-collected at save time.
* **Sharded restore**: pass a restore template whose leaves are
  ``jax.ShapeDtypeStruct`` with a ``sharding`` — parameters land directly
  on the target mesh layout (restore-on-resize: the saving and restoring
  topologies are independent). Concrete template leaves restore host-side
  as before.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
from typing import Any, Dict, Optional, Tuple

_async_ckptr = None
_async_lock = threading.Lock()


def _get_async_checkpointer():
    """One process-wide AsyncCheckpointer (owns the background thread)."""
    global _async_ckptr
    import orbax.checkpoint as ocp

    with _async_lock:
        if _async_ckptr is None:
            _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def wait_for_checkpoints():
    """Block until every in-flight asynchronous save has committed."""
    with _async_lock:
        ckptr = _async_ckptr
    if ckptr is not None:
        ckptr.wait_until_finished()


_STEP_DIR = re.compile(r"^step_\d{8}$")


def _committed_steps(directory: str):
    """Sorted names of COMMITTED checkpoint directories. The name must match
    ``step_NNNNNNNN`` exactly: orbax writes an in-flight async save to
    ``step_NNNNNNNN.orbax-checkpoint-tmp`` in the same parent and renames on
    commit — a loose ``startswith`` filter would list (and worse, collect or
    resume from) the uncommitted tmp."""
    return sorted(
        d
        for d in os.listdir(directory)
        if _STEP_DIR.match(d) and os.path.isdir(os.path.join(directory, d))
    )


def _gc_old(directory: str, keep: int):
    """Delete committed checkpoints beyond the newest ``keep``; an in-flight
    async save is neither listed nor counted toward ``keep``."""
    steps = _committed_steps(directory)
    for d in steps[:-keep] if keep > 0 else []:
        path = os.path.join(directory, d)
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.remove(path + ".meta.json")
        except OSError:
            pass


def save_checkpoint(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any,
    pipeline_state: Optional[Dict] = None,
    *,
    asynchronous: bool = False,
    keep: Optional[int] = None,
):
    """Write a checkpoint for ``step`` under ``directory``.

    ``pipeline_state``: ``TPUPipeline.get_state()`` (or any JSON-able dict)
    — restored verbatim by :func:`restore_checkpoint` for
    ``pipe.set_state``.

    ``asynchronous=True`` returns as soon as the on-device state is
    snapshotted; serialization runs on orbax's background thread (saves
    queue behind each other). ``keep=N`` prunes completed checkpoints
    beyond the newest ``N`` (the one being written counts toward N).
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    path = os.path.join(directory, f"step_{step:08d}")
    state = {"params": params, "opt_state": opt_state}
    if asynchronous:
        ckptr = _get_async_checkpointer()
        ckptr.save(path, state, force=True)
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
    # In a jax.distributed fleet orbax's save() is a collective every
    # process enters, but the host-side bookkeeping (sidecar write, GC)
    # must happen once: concurrent truncate-and-write of the same sidecar
    # on shared storage can expose partial JSON to a reader, and W-fold
    # rmtree races are wasted work.
    try:
        import jax

        is_primary = jax.process_index() == 0
    except Exception:
        is_primary = True
    if is_primary:
        # meta as a JSON sidecar, written immediately: structure-free
        # restore. If an async save later fails, the stale sidecar is
        # harmless — latest_checkpoint() lists only COMMITTED directories.
        with open(path + ".meta.json", "w") as f:
            json.dump({"step": step, "pipeline": pipeline_state or {}}, f)
        if keep is not None:
            _gc_old(directory, int(keep))
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    """Path of the newest COMMITTED checkpoint under ``directory``, or None
    (an in-flight or orphaned async save — orbax's
    ``*.orbax-checkpoint-tmp`` — is never returned)."""
    if not os.path.isdir(directory):
        return None
    steps = _committed_steps(directory)
    return os.path.join(directory, steps[-1]) if steps else None


def restore_checkpoint(path: str, abstract_state: Any) -> Tuple[Any, Any, Dict]:
    """Restore ``(params, opt_state, meta)``.

    ``abstract_state`` is a pytree of the same structure used as the
    restore template: concrete arrays restore like-for-like; leaves that
    are ``jax.ShapeDtypeStruct`` with a ``sharding`` restore DIRECTLY onto
    that sharding (mesh-aware restore — the saving topology does not
    constrain the restoring one).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {"params": abstract_state["params"], "opt_state": abstract_state["opt_state"]}
    restored = ckptr.restore(path, template)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    return restored["params"], restored["opt_state"], meta
