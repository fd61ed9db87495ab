"""Training-state checkpoint/resume helpers (orbax-backed).

The reference ships no checkpoint/restart support (SURVEY §5.4 — "training
state is the user's"); a production TPU training framework needs it, so this
goes beyond parity: save/restore of (params, opt_state, step) plus the input
pipeline's reproducibility anchors (seed, epoch, iteration) so a run can
resume mid-training with the same shuffling stream.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple


def save_checkpoint(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any,
    pipeline_state: Optional[Dict[str, int]] = None,
):
    """Write a checkpoint for ``step`` under ``directory``.

    ``pipeline_state``: e.g. ``{"seed": s, "epoch": e, "iteration": i}`` —
    enough to reconstruct the ShuffledSharded permutation stream (per-epoch
    permutations are pure functions of (seed, epoch)).
    """
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "opt_state": opt_state}, force=True)
    ckptr.wait_until_finished()
    # meta as a JSON sidecar: structure-free restore
    with open(path + ".meta.json", "w") as f:
        json.dump({"step": step, "pipeline": pipeline_state or {}}, f)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    """Path of the newest checkpoint under ``directory``, or None."""
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        d for d in os.listdir(directory) if d.startswith("step_") and
        os.path.isdir(os.path.join(directory, d))
    )
    return os.path.join(directory, steps[-1]) if steps else None


def restore_checkpoint(path: str, abstract_state: Any) -> Tuple[Any, Any, Dict]:
    """Restore ``(params, opt_state, meta)``; ``abstract_state`` is a pytree
    of the same structure (e.g. the freshly initialized state) used as the
    restore template."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {"params": abstract_state["params"], "opt_state": abstract_state["opt_state"]}
    restored = ckptr.restore(path, template)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    return restored["params"], restored["opt_state"], meta
