#!/bin/bash
# Round-4 phase-1-only A/B queue (warm frame cache + compile cache):
# 1. default repeat      -> run-to-run variance of fps and protocol ATE
# 2. delta wire          -> fewer bytes on the serialized tunnel
# 3. delta + 2-frame     -> fewer dispatches too
# 4. gray8 + depth12     -> is the wire quantization the L1 ATE regression?
# Verdicts feed the bench.py defaults before the driver's official run.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r4d_ab.log}
run() {
  local name=$1; shift
  echo "=== $name @ $(date -u +%T) ===" >>"$LOG"
  BENCH_PHASE1_ONLY=1 BENCH_BACKEND_PROBES=3 BENCH_OVERRIDES="${1:-{\}}" \
    timeout 900 python bench.py >>"$LOG" 2>&1
  echo "--- $name rc=$? @ $(date -u +%T)" >>"$LOG"
}
run default '{}'
run delta '{"tpu_wire_delta": true}'
run delta-fps2 '{"tpu_wire_delta": true, "tpu_frames_per_step": 2}'
run gray8-d12 '{"tpu_gray_bits": 8, "tpu_depth_bits": 12}'
echo "=== queue done @ $(date -u +%T) ===" >>"$LOG"
