"""Shared wedge-safe tunnel probe for the bench scripts.

A wedged remote-attach tunnel HANGS ``jax.devices()`` rather than raising
(NEXT_STEPS.md), so no bench may initialize the real backend in-process
before a killable subprocess has proven it answers. One implementation so
the skip condition cannot drift between scripts (``JAX_PLATFORMS``
starting with ``cpu`` — including compound values — means an intentional
CPU run: nothing to probe).
"""

import os
import subprocess
import sys


def probe_tpu_or_exit(timeout_s: float = 75.0, exit_code: int = 3) -> None:
    """Exit ``exit_code`` (without touching the backend) if the tunnel is
    wedged; return normally if healthy or if this is an explicit CPU run."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    if os.environ.get("ACCVLAB_WATCHER") == "1":
        # the heal-watcher probed (two-stage, up to 275 s) seconds before
        # launching this script and wraps it in `timeout -k`; a second
        # probe here pays ANOTHER full remote compile (~70-200 s — axon
        # never serializes remote executables) and can time out in weather
        # the watcher's long box just survived, burning the window
        # (observed 2026-08-20T12:34Z: watcher heal -> dctdev probe rc=124
        # 70 s later).
        return
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tpu_probe.py")
    try:
        rc = subprocess.run(
            [sys.executable, probe], timeout=timeout_s, capture_output=True
        ).returncode
    except subprocess.TimeoutExpired:
        rc = 124
    if rc != 0:
        print(
            f"tunnel probe failed (rc={rc}) — refusing to wedge; exit {exit_code}",
            file=sys.stderr,
            flush=True,
        )
        sys.exit(exit_code)
