#!/bin/bash
# Round-4 TPU work queue. Lesson of round 3 (VERDICT.md "What's weak" #1):
# the DELIVERABLE runs FIRST — bench.py captures the official number the
# moment the tunnel is up; experiments ride whatever tunnel time is left.
# Steps run SEQUENTIALLY (single-jax-process rule); a failed step never
# blocks the next. Intended to be invoked by tools/r4_tpu_watch.sh from a
# git-archive snapshot so live source edits can't corrupt in-flight runs.
#
# Usage: bash tools/r4_tpu_queue.sh   (run ALONE on the chip)
set -u
cd "$(dirname "$0")/.."
LOG=${R4_QUEUE_LOG:-/tmp/r4_queue.log}
echo "=== r4 queue start $(date) in $(pwd)" | tee -a "$LOG"
run() {
  echo "--- $* @ $(date)" | tee -a "$LOG"
  timeout "$1" "${@:2}" >>"$LOG" 2>&1
  echo "--- rc=$? @ $(date)" | tee -a "$LOG"
}
# 1. THE NUMBER (also rewarms the compile cache for the driver's own run).
#    Stdout (the JSON line) additionally lands in /tmp/BENCH_trial.json.
echo "--- bench.py @ $(date)" | tee -a "$LOG"
BENCH_BACKEND_PROBES=3 timeout 10800 python bench.py \
  >/tmp/BENCH_trial.json 2>>"$LOG"
echo "--- rc=$? bench -> $(cat /tmp/BENCH_trial.json 2>/dev/null | head -c 300)" | tee -a "$LOG"
# 2. L1 ATE regression bisect (VERDICT #3): round-3 wire defaults vs
#    gray8 vs raw ingest vs 12-bit depth; plus the pending promotion
#    candidates gray5 / fused-2-frame step.
run 10800 python tools/ab_ate.py default yc12-8 raw-8 d12 gray5 fps2
# 3. Device profile + trace (VERDICT #5: explain the busy 5 ms).
run 3600 python tools/profile_device.py --trace
echo "=== r4 queue done $(date)" | tee -a "$LOG"
