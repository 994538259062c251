#!/bin/bash
# Round-13 measurement runner: evidence-exchange levers at sf5, fallback
# penalty with the frequency BF, encode-regime crossover, sf10 third
# strategy, streaming decade+1 soak. One soak JVM at a time (clean
# measurements on the 32-core box). Usage: tools/soak_r13.sh <tag> <shards>
# <SOAK_ONLY> [extra env as KEY=VAL...]
set -euo pipefail
cd /root/repo
TAG=$1; SHARDS=$2; ONLY=$3; shift 3
for kv in "$@"; do export "$kv"; done
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-96g}
# repo-local shuffle scratch: a run lost shuffle_*.data files under /tmp
# mid-query (29 FileNotFoundExceptions, disk healthy) — keep soak scratch
# away from tmp cleaners
export SPARK_LOCAL_DIRS=${SPARK_LOCAL_DIRS:-/root/repo/.scratch}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_SOAK_ONLY=$ONLY
OUT=tools/soak_r13_${TAG}.json
sbt -batch "runMain graft.tools.Soak /root/testdata/sf0.1 $SHARDS" 2>tools/soak_r13_${TAG}.err \
  | grep '^{' > "$OUT" || true
echo "=== $TAG ==="
cat "$OUT"
