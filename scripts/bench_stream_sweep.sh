#!/bin/bash
# Unattended stream-vs-episodic bench sweep (run when the axon TPU
# service is reachable).  Writes one line per config to the log; each
# bench run is self-contained (bench.py prints one JSON line + a
# comment line to stderr).  Never run concurrently with anything else
# on the host core (BENCH_NOTES.md: ~2% contention penalty).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/bench_sweep.log}
# Each stream geometry is a separate multi-minute remote compile (the
# AOT cache only helps repeats).  Short on TPU time?  Run with
# DASA_SWEEP_SHORT=1 to stop after the first stream config.
echo "=== sweep start $(date) ===" >> "$LOG"

run() {
  local tag="$1"; shift
  echo "--- $tag ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout 3600 env "$@" python bench.py >> "$LOG" 2>&1
  echo "exit=$? ($(date +%H:%M:%S))" >> "$LOG"
}

# 1. episodic baseline re-confirm (committed-state number)
run episodic DASA_BENCH_STREAM=0
# 2. stream, auto geometry (S=max_action=35, pool 1.3x steady-state)
run stream-auto DASA_BENCH_STREAM=1
if [ "${DASA_SWEEP_SHORT:-0}" = "1" ]; then
  echo "=== short sweep done $(date) ===" >> "$LOG"; exit 0
fi
# 3. stream, shorter window (more optimizer steps, smaller pool/encode)
run stream-s20 DASA_BENCH_STREAM=1 DASA_BENCH_STREAM_STEPS=20
# 4. stream, larger-than-auto pool (fewer starved slots on cold policy)
run stream-p200 DASA_BENCH_STREAM=1 DASA_BENCH_STREAM_POOL=200
# 5. stream, smaller pool (less per-window text encode; starvation probe
#    — watch the starved counter in the logs)
run stream-p110 DASA_BENCH_STREAM=1 DASA_BENCH_STREAM_POOL=110
# 6-7. window width (W = 2*batch slots): wider windows raise MXU row
#    utilization of the per-step matmuls (+6% at b32, round-4 notes)
#    but coarsen optimizer granularity beyond what the quality A/B
#    validated — throughput-headroom data, not the headline config.
run stream-b32 DASA_BENCH_STREAM=1 DASA_BENCH_BATCH=32
run stream-b48 DASA_BENCH_STREAM=1 DASA_BENCH_BATCH=48
echo "=== sweep done $(date) ===" >> "$LOG"
