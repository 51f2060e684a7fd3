#!/bin/bash
# Round-4 second TPU queue (after the delta-wire work landed).
# Order of operations (the round-3 lesson: deliverable FIRST):
#   1. bench.py with repo defaults      -> the official-number insurance run
#   2. ab_ate focused set               -> L1-regression bisect + the two
#      promotion candidates (delta wire, fused 2-frame step)
#   3. bench.py with delta(+fps2)       -> the promotion's full-bench trial
# Invoke via tools/r4_tpu_watch.sh pointing at this queue, or directly when
# the tunnel is up. Run ALONE on the chip.
set -u
cd "$(dirname "$0")/.."
LOG=${R4_QUEUE_LOG:-/tmp/r4b_queue.log}
echo "=== r4b queue start $(date) in $(pwd)" | tee -a "$LOG"
run() {
  echo "--- $* @ $(date)" | tee -a "$LOG"
  timeout "$1" "${@:2}" >>"$LOG" 2>&1
  echo "--- rc=$? @ $(date)" | tee -a "$LOG"
}
echo "--- bench.py (defaults) @ $(date)" | tee -a "$LOG"
BENCH_BACKEND_PROBES=3 timeout 7200 python bench.py \
  >/tmp/BENCH_trial.json 2>>"$LOG"
echo "--- rc=$? bench -> $(head -c 300 /tmp/BENCH_trial.json 2>/dev/null)" | tee -a "$LOG"
run 9000 python tools/ab_ate.py default yc12-8 d12 gray5 fps2 delta delta-fps2
echo "--- bench.py (delta) @ $(date)" | tee -a "$LOG"
BENCH_BACKEND_PROBES=3 BENCH_OVERRIDES='{"tpu_wire_delta": true}' \
  timeout 7200 python bench.py >/tmp/BENCH_delta.json 2>>"$LOG"
echo "--- rc=$? bench-delta -> $(head -c 300 /tmp/BENCH_delta.json 2>/dev/null)" | tee -a "$LOG"
echo "--- bench.py (delta+fps2) @ $(date)" | tee -a "$LOG"
BENCH_BACKEND_PROBES=3 \
  BENCH_OVERRIDES='{"tpu_wire_delta": true, "tpu_frames_per_step": 2}' \
  timeout 7200 python bench.py >/tmp/BENCH_delta_fps2.json 2>>"$LOG"
echo "--- rc=$? bench-delta-fps2 -> $(head -c 300 /tmp/BENCH_delta_fps2.json 2>/dev/null)" | tee -a "$LOG"
echo "=== r4b queue done $(date)" | tee -a "$LOG"
