#!/bin/bash
# Tunnel watcher: probe the axon TPU backend until it answers, then run
# tools/r4_tpu_queue.sh from a CLEAN SNAPSHOT of git HEAD (git archive) so
# concurrent source edits in /root/repo can never mix module versions into
# an in-flight run (the round-3 lazy-import failure mode).
#
# Probes are short-lived killable subprocesses; while the tunnel is down
# they hang inside jax.devices() and are killed by timeout. CPU-side work
# stays safe to run concurrently ONLY with PALLAS_AXON_POOL_IPS unset
# (then the axon plugin is never registered). While the queue is running,
# /tmp/tpu_busy exists — avoid heavy CPU work during that window.
#
# Usage: bash tools/r4_tpu_watch.sh [max_hours] [queue.sh]  (background it)
set -u
MAX_HOURS=${1:-11}
QUEUE=${2:-r4_tpu_queue.sh}
LOG=/tmp/r4_watch.log
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
echo "=== r4 watch start $(date), deadline in ${MAX_HOURS}h" | tee -a "$LOG"
i=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  i=$((i + 1))
  if timeout 120 python -c "import jax; jax.devices(); print('ok')" \
      2>>"$LOG" | grep -q ok; then
    echo "=== tunnel UP at $(date) (probe $i)" | tee -a "$LOG"
    SNAP=/tmp/bench_snap_$(date +%s)
    mkdir -p "$SNAP" /root/repo/.bench_cache
    git -C /root/repo archive HEAD | tar -x -C "$SNAP"
    ln -sfn /root/repo/.bench_cache "$SNAP/.bench_cache"
    echo "=== snapshot of $(git -C /root/repo rev-parse --short HEAD) at $SNAP" | tee -a "$LOG"
    touch /tmp/tpu_busy
    bash "$SNAP/tools/$QUEUE"
    rm -f /tmp/tpu_busy
    echo "=== r4 watch done $(date)" | tee -a "$LOG"
    exit 0
  fi
  echo "[watch] probe $i: tunnel down @ $(date)" >>"$LOG"
  sleep 60
done
echo "=== r4 watch deadline reached $(date)" | tee -a "$LOG"
