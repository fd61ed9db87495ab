"""Run every example end to end (anti-rot sweep; too slow for the suite).

Usage::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/run_examples.py
    python scripts/run_examples.py --only object_detection_2d_pipeline

Runs each example as a subprocess with a per-example timeout and reports a
pass/fail table. On a wedged TPU tunnel, set the CPU env as above —
examples target the default backend.
"""

import argparse
import os
import subprocess
import sys
import time

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def discover_examples(directory=None):
    """Example module names (shared with tests/test_examples_import.py so
    the sweep and the import guard can never diverge)."""
    directory = directory or EXAMPLES_DIR
    return sorted(
        f[:-3]
        for f in os.listdir(directory)
        if f.endswith(".py") and not f.startswith("_")
    )

#: per-example timeout seconds (video/training examples do real work)
TIMEOUTS = {
    "video_vs_image_benchmark": 900,
    "stream_petr_video_training": 900,
    "video_stream_training": 600,
}
DEFAULT_TIMEOUT = 420


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", help="example module names to run")
    args = ap.parse_args()

    names = discover_examples()
    if args.only:
        unknown = set(args.only) - set(names)
        if unknown:
            print(f"unknown example(s): {sorted(unknown)}; available: {names}")
            return 2
        names = [n for n in names if n in set(args.only)]

    failures = []
    for name in names:
        path = os.path.join(EXAMPLES_DIR, f"{name}.py")
        timeout = TIMEOUTS.get(name, DEFAULT_TIMEOUT)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-u", path],
                timeout=timeout,
                capture_output=True,
                text=True,
            )
            ok = r.returncode == 0
            tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        except subprocess.TimeoutExpired:
            ok, tail = False, [f"TIMEOUT after {timeout}s"]
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'}  {name:40s} {dt:6.1f}s")
        if not ok:
            failures.append(name)
            for line in tail:
                print(f"      {line}")
    print(f"\n{len(names) - len(failures)}/{len(names)} examples passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
