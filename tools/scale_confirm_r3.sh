#!/bin/bash
# Interleaved confirmation: same config measured at BOTH levels
# back-to-back, twice, so VM-noise epochs hit both levels equally.
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
for rep in 1 2; do
  run r3c-base lc1x4
  run r3c-base lc4x4
  EXTRA_CONF="$NET" run r3c-net lc1x4
  EXTRA_CONF="$NET" run r3c-net lc4x4
done
echo DONE >&2
