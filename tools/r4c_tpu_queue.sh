#!/bin/bash
# Round-4 third TPU queue (chip free after r4b).
#   1. ab_ate bisect: default x3 (run-to-run ATE variance under async
#      optimize timing) + d12 / d12-gray8 / raw-8 (is the 0.030-vs-0.0195
#      L1 gap wire precision or the re-rendered data?)
#   2. hard_sequences full-size -> HARD_SEQUENCES.md (VERDICT r3 #4)
# Run ALONE on the chip.
set -u
cd "$(dirname "$0")/.."
LOG=${R4_QUEUE_LOG:-/tmp/r4c_queue.log}
echo "=== r4c queue start $(date) in $(pwd)" | tee -a "$LOG"
run() {
  echo "--- $* @ $(date)" | tee -a "$LOG"
  timeout "$1" "${@:2}" >>"$LOG" 2>&1
  echo "--- rc=$? @ $(date)" | tee -a "$LOG"
}
run 7200 python tools/ab_ate.py default default default d12 d12-gray8 raw-8
run 7200 python tools/hard_sequences.py --out HARD_SEQUENCES.md
echo "=== r4c queue done $(date)" | tee -a "$LOG"
