"""The driver-facing bench.py contract: a parseable JSON line under ANY
tunnel weather (VERDICT r3 "Never leave BENCH_r0N.json empty").

Three weathers, three paths:

* healthy      — the measurement path itself (exercised by the real runs in
                 docs/bench_watch_r0*.jsonl; too slow for the suite).
* fully wedged — the probe gives up inside its budget and emits the stale
                 watch-log fallback (``_wait_for_tunnel`` -> False).
* heals-then-stalls — the probe answers but a later phase (dataset build,
                 compile, measurement) hangs; the DEADMAN timer fires
                 ~15 s before the deadline and emits the stale fallback.
                 This was the remaining hole: the driver's kill would have
                 recorded nothing.

Both failure paths run bench.py in a subprocess (the deadman ends with
``os._exit``) with the measurement phases stubbed, and assert rc == 0 plus
one parseable stdout line explicitly marked ``"stale": true``.
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench_stubbed(patch_code: str, deadline_s: str, timeout: float):
    """Run bench.main() in a subprocess with phases stubbed by patch_code."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import bench\n"
        "%s\n"
        "bench.main()\n"
    ) % (_REPO, patch_code)
    env = dict(os.environ)
    env.update(
        {
            # never touch the real tunnel from the child
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "ACCVLAB_BENCH_DEADLINE_S": deadline_s,
        }
    )
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=_REPO,
    )


def _assert_stale_json(proc):
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {proc.stdout!r}"
    d = json.loads(lines[0])
    assert d["stale"] is True
    assert d["value"] > 0 and d["unit"] == "frames/sec/chip"
    assert d["vs_baseline"] is not None
    assert d["stale_source_ts"]
    return d


def test_full_wedge_emits_stale_fallback():
    proc = _run_bench_stubbed(
        "bench._wait_for_tunnel = lambda budget_s: False",
        deadline_s="60",
        timeout=90,
    )
    d = _assert_stale_json(proc)
    # the fallback also carries the series-best context for the reader
    assert d["series_best_vs_baseline"] is not None


def test_deadman_fires_when_measurement_stalls_after_probe():
    # probe says healthy, then the first measurement phase hangs forever:
    # the deadman must land the stale JSON inside the deadline and exit 0
    proc = _run_bench_stubbed(
        "bench._wait_for_tunnel = lambda budget_s: True\n"
        "import time\n"
        "bench.build_pipeline = lambda **kw: time.sleep(3600)",
        deadline_s="20",  # deadman fires ~5 s in
        timeout=90,
    )
    _assert_stale_json(proc)


def test_deadman_prefers_banked_fresh_record_over_stale_replay():
    """Once the measurement passes have banked a record, a late-phase stall
    must emit THAT record (fresh, idle null) — never a stale replay. The
    2026-08-20T12:19Z x2.66 run survived its deadman by 13 s; this pins the
    fix."""
    proc = _run_bench_stubbed(
        "bench._wait_for_tunnel = lambda budget_s: True\n"
        "import time\n"
        "def _hang(**kw):\n"
        "    bench._partial_fresh = {'value': 123.4, 'vs_baseline': 2.23,\n"
        "                            'input_idle_frac': None}\n"
        "    time.sleep(3600)\n"
        "bench.build_pipeline = _hang",
        deadline_s="20",
        timeout=90,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {proc.stdout!r}"
    d = json.loads(lines[0])
    assert d == {"value": 123.4, "vs_baseline": 2.23, "input_idle_frac": None}
    assert "stale" not in d


def test_stale_fallback_replays_best_arm_of_freshest_window():
    """The fallback must pick the BEST vs_baseline of the freshest recorded
    measurement window (not a deliberately slower A/B arm), and carry a
    labeled current-config projection. Pinned against the committed
    docs/bench_watch_r05.jsonl series: the 2026-08-20T12:19Z window's best
    arm is the dct-dp16 x2.66 fresh on-chip run."""
    import io
    from contextlib import redirect_stdout

    sys.path.insert(0, _REPO)
    import bench

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert bench._emit_stale_fallback("test-reason") is True
    d = json.loads(buf.getvalue().strip())
    assert d["stale"] is True
    assert d["vs_baseline"] >= 2.66  # never replay a worse arm of that window
    assert d["stale_reason"].startswith("test-reason")
    proj = d["projected_current_config"]
    assert proj and proj["vs_baseline"] > 0 and "assumptions" in proj
