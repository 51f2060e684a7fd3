#!/bin/bash
# Heavy test tier, sharded across sequential pytest processes.
#
# Why: the heavy tier compiles several multi-GB XLA CPU programs; one
# process accumulating all of them segfaulted inside XLA compile under
# memory pressure in the round-4 driver run (VERDICT r4 weak #8). Sharding
# by test FILE (stable hash, tests/conftest.py --shard) keeps each
# process's compile-arena bounded while preserving per-module program
# reuse. Exit code is non-zero if any shard fails.
#
# Usage: tools/run_heavy.sh [N_SHARDS]   (default 3)
set -u
cd "$(dirname "$0")/.."
N=${1:-3}
rc=0
for k in $(seq 1 "$N"); do
  echo "=== heavy shard $k/$N ==="
  python -m pytest tests/ -q -m heavy --shard "$k/$N" || rc=1
done
exit $rc
