#!/bin/bash
# Tunnel heal-watcher: probe the remote-attach TPU tunnel every 4 minutes in
# a time-boxed subprocess (a wedged tunnel HANGS jax.devices(); never probe
# in a process you can't kill — see NEXT_STEPS.md), and on each heal run the
# full bench matrix:
#
#   1. headline     — DCT wire, DP-tuned dp16 grouping (bench.py default),
#                     with a phase-timeline capture (ACCVLAB_BENCH_TRACE)
#   2. dct-split12  — grouping A/B (field-count overhead on the real wire)
#   3. yuv-packed   — pixel wire + bitplane codec (the r03 configuration)
#   4. raw          — uncompressed YUV wire (the r02/r03 A/B base)
#   5. echo         — data-echoing delivered-rate scaling (factors 1,2)
#   6. dctdev       — device-half-only microbench (is the DCT decode eating
#                     the wire saving? scripts/bench_dct_device.py)
#
# The watcher stays armed for up to MAX_ROUNDS matrix rounds (cool-down
# between them): tunnel weather varies by hours, so a second window later
# can beat a marginal first one. Round r results overwrite-protect by
# suffixing _rN for N>1.
#
# Usage:   nohup scripts/heal_watch.sh <tag> >/dev/null 2>&1 &
# Results: /tmp/bench_heal_<tag>_{dct,dct_split12,yuvpacked,raw,echo,dctdev}[_rN].json|log
#          /tmp/bench_heal_<tag>_dct_trace[_rN].json (phase timeline)
# Status:  /tmp/bench_heal_<tag>_status (append-only probe/run log)
# PID:     /tmp/heal_watch_<tag>.pid (kill "$(cat ...)" to stop — by pid,
#          never by pattern)
#
# After a heal: convert each result into a docs/bench_watch_r0N.jsonl
# datapoint with fps_per_wire_MBps so the series stays interpretable
# against effective_wire_MBps (VERDICT r3 "keep the watch discipline").
set -u
TAG="${1:?usage: heal_watch.sh <tag, e.g. r4e>}"
OUT="/tmp/bench_heal_${TAG}"
MAX_ROUNDS="${2:-3}"
COOLDOWN_S="${3:-7200}"
echo $$ > "/tmp/heal_watch_${TAG}.pid"
cd "$(dirname "$0")/.."
echo "watch-${TAG} started $(date -u +%FT%TZ) max_rounds=${MAX_ROUNDS}" >> "${OUT}_status"

SFX=""  # per-round suffix; empty for the first round

run_bench() {  # run_bench <name> <env...>
  local name="$1"; shift
  env "$@" ACCVLAB_BENCH_DEADLINE_S=520 timeout 590 \
    python -u bench.py > "${OUT}_${name}${SFX}.json" 2> "${OUT}_${name}${SFX}.log"
  echo "bench ${name}${SFX} rc=$? $(date -u +%FT%TZ)" >> "${OUT}_status"
}

ROUND=0
while [ "$ROUND" -lt "$MAX_ROUNDS" ]; do
  if timeout 75 python scripts/tpu_probe.py >/dev/null 2>&1; then
    ROUND=$((ROUND + 1))
    [ "$ROUND" -gt 1 ] && SFX="_r${ROUND}" || SFX=""
    echo "healed $(date -u +%FT%TZ) -> matrix round ${ROUND}/${MAX_ROUNDS}" >> "${OUT}_status"
    run_bench dct ACCVLAB_BENCH_TRACE="${OUT}_dct_trace${SFX}.json"
    run_bench dct_split12 ACCVLAB_BENCH_DCT_GROUPING=split12
    run_bench yuvpacked ACCVLAB_BENCH_WIRE=yuv
    run_bench raw ACCVLAB_BENCH_WIRE=yuv ACCVLAB_BENCH_WIRE_PACK=0
    timeout 590 python -u scripts/bench_echo.py --factors 1,2 --batches 8 \
      > "${OUT}_echo${SFX}.json" 2> "${OUT}_echo${SFX}.log"
    echo "echo${SFX} rc=$? $(date -u +%FT%TZ)" >> "${OUT}_status"
    timeout 590 python -u scripts/bench_dct_device.py \
      > "${OUT}_dctdev${SFX}.json" 2> "${OUT}_dctdev${SFX}.log"
    echo "dctdev${SFX} rc=$? $(date -u +%FT%TZ)" >> "${OUT}_status"
    timeout 590 python -u scripts/bench_serving.py --iters 20 \
      > "${OUT}_serving${SFX}.json" 2> "${OUT}_serving${SFX}.log"
    echo "serving${SFX} rc=$? $(date -u +%FT%TZ)" >> "${OUT}_status"
    timeout 590 python -u scripts/bench_serving.py --iters 20 --quantize int8 \
      > "${OUT}_serving_int8${SFX}.json" 2> "${OUT}_serving_int8${SFX}.log"
    echo "serving_int8${SFX} rc=$? $(date -u +%FT%TZ)" >> "${OUT}_status"
    [ "$ROUND" -ge "$MAX_ROUNDS" ] && exit 0
    echo "cooldown ${COOLDOWN_S}s before re-arming $(date -u +%FT%TZ)" >> "${OUT}_status"
    sleep "$COOLDOWN_S"
  else
    echo "wedged $(date -u +%FT%TZ)" >> "${OUT}_status"
    sleep 240
  fi
done
