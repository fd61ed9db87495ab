"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform virtual devices instead (the compiled
collectives are identical modulo the transport layer).

If a TPU PJRT plugin was pre-registered by a sitecustomize hook (it loads
before conftest and can stall host-platform compiles via its remote-compile
path), re-exec pytest once with the plugin disabled so tests always run on
the local CPU backend.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

_CPU_ENV = {
    "_ACCVLAB_TESTS_REEXEC": "1",
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
}


def _needs_reexec() -> bool:
    if os.environ.get("_ACCVLAB_TESTS_REEXEC") == "1":
        return False
    # A TPU plugin hook was active at interpreter start.
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) or (
        os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
    )


def _cpu_mesh_env(env):
    env.update(_CPU_ENV)
    flags = env.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # Suite wall time is XLA:CPU-compile-dominated (the persistent cache is
    # not an option — see the note below). Backend optimization level 0
    # cuts the full suite ~1/3 (20m04s -> 13m26s measured on the 1-core CI
    # box, 898 tests) with every test green INCLUDING the bitwise golden
    # comparisons (the repro_exp design is optimization-level-independent).
    # Tests that need full optimization can override per-process.
    if "--xla_backend_optimization_level" not in flags:
        flags = (flags + " --xla_backend_optimization_level=0").strip()
    env["XLA_FLAGS"] = flags
    # NOTE (round 4): a persistent XLA:CPU compile cache for the suite was
    # tried and reverted — XLA's AOT loader flags every reload with
    # SIGILL-risk feature-mismatch errors even for SAME-host entries (its
    # feature comparison includes compile-side pseudo-features like
    # +prefer-no-scatter that the host probe never reports), flooding
    # stderr on every test. Do not re-add without verifying that loader
    # check has been fixed upstream.
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    return env


def pytest_configure(config):
    if not _needs_reexec():
        return
    # Restore the real stdout/stderr before exec so the child's report is
    # visible (global fd capture is already active at this point).
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        _cpu_mesh_env(dict(os.environ)),
    )


if not _needs_reexec():
    _cpu_mesh_env(os.environ)
