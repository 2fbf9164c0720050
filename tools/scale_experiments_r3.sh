#!/bin/bash
# Round-3 scaling experiments: close the lc1x4 -> lc4x4 axis (r2: 0.72).
# Same input (2M nodes / 16.8M edges), STATS_INTERVAL=5 as in round 2.
# Each candidate config runs at BOTH levels (the north rule compares the
# same job at two parallelism levels). Results append to
# BENCH/scaling_runs.jsonl via the RESULT line.
set -u
cd /root/repo
LOG=BENCH/scaling_runs.jsonl
run() {
  local tag="$1" spec="$2"; shift 2
  echo "=== $tag $spec $(date +%T)" >&2
  TAG="$tag" STATS_INTERVAL=5 timeout 580 python tools/scale_child.py "$spec" sql 2000000 15 "$@" 2>/dev/null \
    | grep '^RESULT ' | sed 's/^RESULT //' >> "$LOG"
}

# B: 2x shuffle partitions (more overlap of remote fetch + compute)
SHUFFLE_PARTS=32 run r3-sp32 lc4x4
# C: locality wait 0 + bigger in-flight fetch
EXTRA_CONF="spark.locality.wait=0ms,spark.reducer.maxSizeInFlight=96m,spark.shuffle.file.buffer=1m" run r3-net lc4x4
# D: combined
SHUFFLE_PARTS=32 EXTRA_CONF="spark.locality.wait=0ms,spark.reducer.maxSizeInFlight=96m,spark.shuffle.file.buffer=1m" run r3-sp32net lc4x4
# baselines for fairness at the 1-executor level with the same knobs
SHUFFLE_PARTS=8 run r3-sp2x lc1x4
EXTRA_CONF="spark.locality.wait=0ms,spark.reducer.maxSizeInFlight=96m,spark.shuffle.file.buffer=1m" run r3-net lc1x4
SHUFFLE_PARTS=8 EXTRA_CONF="spark.locality.wait=0ms,spark.reducer.maxSizeInFlight=96m,spark.shuffle.file.buffer=1m" run r3-sp32net lc1x4
echo DONE >&2
