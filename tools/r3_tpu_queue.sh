#!/bin/bash
# Round-3 TPU work queue: run the pending chip jobs SEQUENTIALLY (the
# single-jax-process rule) the moment the tunnel is back. Each step logs
# to /tmp/r3_queue.log; a step that fails doesn't block the next.
#
#   1. A/B luma bits 6 vs 5 (also rewarms the compile cache for the
#      bench phase-1 config after the compare-program changes)
#   2. A/B approx_max_k keypoint selection (fps + protocol ATE)
#   3. device profile + trace (verify gumbel/gather wins, find fusion.15)
#   4. bench.py (the round's reported number; cache warm by now)
#
# Usage: bash tools/r3_tpu_queue.sh   (run ALONE, ~1-2 h cold)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_queue.log
echo "=== r3 queue start $(date)" | tee -a "$LOG"
run() {
  echo "--- $* @ $(date)" | tee -a "$LOG"
  timeout "$1" "${@:2}" >>"$LOG" 2>&1
  echo "--- rc=$? @ $(date)" | tee -a "$LOG"
}
run 7200 python tools/ab_gray6.py 6 5
run 5400 python tools/ab_ate.py approx
run 3600 python tools/profile_device.py --trace
run 5400 python bench.py
echo "=== r3 queue done $(date)" | tee -a "$LOG"
