"""Tunnel health probe: is the remote-attach TPU reachable RIGHT NOW?

The axon remote-attach tunnel wedges for hours at a time (even an 8-float
``device_put`` hangs; episodes of 1-13+ hours observed). Every TPU job in
this repo should be gated on this probe with a short timeout:

    timeout 75 python scripts/tpu_probe.py && timeout 590 python bench.py

Exit 0 = a real transfer + execute + materialize round trip completed (the
compile leg is only exercised on a COLD persistent-compilation cache — a
warm probe reuses the cached executable and validates the data path only);
nonzero/timeout = wedged, do CPU work instead. The watcher
pattern (loop the probe every few minutes in a background task and fire
the bench the moment it heals) is how round 3 caught measurement windows.
"""

import os
import sys
import time

# Share bench.py's persistent compilation cache: a cold probe pays a full
# remote compile over the tunnel (~70s of its budget even when healthy);
# a warm one is a pure transfer+execute round trip (seconds). Without this,
# a slow-but-alive tunnel is indistinguishable from a wedged one inside a
# 75s probe timeout. Must be set before jax initializes.
if not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "jax"
        ),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main() -> int:
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    x = jax.device_put(jnp.arange(8.0))
    v = float(x.sum())  # value materialization = the only true sync here
    dev = jax.devices()[0]
    print(f"tunnel ok: sum={v} on {dev} in {time.time() - t0:.1f}s")
    return 0 if v == 28.0 else 1


if __name__ == "__main__":
    sys.exit(main())
