#!/bin/bash
# Tunnel heal-watcher: probe the remote-attach TPU tunnel every 4 minutes in
# a time-boxed subprocess (a wedged tunnel HANGS jax.devices(); never probe
# in a process you can't kill — see NEXT_STEPS.md), and on the FIRST heal
# run the full bench matrix, then exit:
#
#   1. headline     — DCT wire, DP-tuned dp16 grouping (bench.py default),
#                     with a phase-timeline capture (ACCVLAB_BENCH_TRACE)
#   2. dct-split12  — grouping A/B (field-count overhead on the real wire)
#   3. yuv-packed   — pixel wire + bitplane codec (the r03 configuration)
#   4. raw          — uncompressed YUV wire (the r02/r03 A/B base)
#   5. echo         — data-echoing delivered-rate scaling (factors 1,2)
#
# Usage:   nohup scripts/heal_watch.sh <tag> >/dev/null 2>&1 &
# Results: /tmp/bench_heal_<tag>_{dct,dct_split12,yuvpacked,raw,echo}.json|log
#          /tmp/bench_heal_<tag>_dct_trace.json (phase timeline)
# Status:  /tmp/bench_heal_<tag>_status (append-only probe/run log)
# PID:     /tmp/heal_watch_<tag>.pid (kill "$(cat ...)" to stop — by pid,
#          never by pattern)
#
# After a heal: convert each result into a docs/bench_watch_r0N.jsonl
# datapoint with fps_per_wire_MBps so the series stays interpretable
# against effective_wire_MBps (VERDICT r3 "keep the watch discipline").
set -u
TAG="${1:?usage: heal_watch.sh <tag, e.g. r4d>}"
OUT="/tmp/bench_heal_${TAG}"
echo $$ > "/tmp/heal_watch_${TAG}.pid"
cd "$(dirname "$0")/.."
echo "watch-${TAG} started $(date -u +%FT%TZ)" >> "${OUT}_status"

run_bench() {  # run_bench <name> <env...>
  local name="$1"; shift
  env "$@" ACCVLAB_BENCH_DEADLINE_S=520 timeout 590 \
    python -u bench.py > "${OUT}_${name}.json" 2> "${OUT}_${name}.log"
  echo "bench ${name} rc=$? $(date -u +%FT%TZ)" >> "${OUT}_status"
}

while true; do
  if timeout 75 python scripts/tpu_probe.py >/dev/null 2>&1; then
    echo "healed $(date -u +%FT%TZ)" >> "${OUT}_status"
    run_bench dct ACCVLAB_BENCH_TRACE="${OUT}_dct_trace.json"
    run_bench dct_split12 ACCVLAB_BENCH_DCT_GROUPING=split12
    run_bench yuvpacked ACCVLAB_BENCH_WIRE=yuv
    run_bench raw ACCVLAB_BENCH_WIRE=yuv ACCVLAB_BENCH_WIRE_PACK=0
    timeout 590 python -u scripts/bench_echo.py --factors 1,2 --batches 8 \
      > "${OUT}_echo.json" 2> "${OUT}_echo.log"
    echo "echo rc=$? $(date -u +%FT%TZ)" >> "${OUT}_status"
    exit 0
  fi
  echo "wedged $(date -u +%FT%TZ)" >> "${OUT}_status"
  sleep 240
done
