#!/bin/bash
# 2-core-executor axis under the final (net) config: lc1x2 vs lc4x2,
# interleaved so VM-noise epochs hit both levels equally.
set -u
cd /root/repo
LOG=BENCH/scaling_runs.jsonl
run() {
  local tag="$1" spec="$2"
  echo "=== $tag $spec $(date +%T)" >&2
  TAG="$tag" STATS_INTERVAL=5 timeout 580 python tools/scale_child.py "$spec" sql 2000000 15 2>/dev/null \
    | grep '^RESULT ' | sed 's/^RESULT //' >> "$LOG"
}
NET="spark.locality.wait=0ms,spark.reducer.maxSizeInFlight=96m,spark.shuffle.file.buffer=1m"
EXTRA_CONF="$NET" run r3c2-net lc1x2
EXTRA_CONF="$NET" run r3c2-net lc4x2
echo DONE >&2
