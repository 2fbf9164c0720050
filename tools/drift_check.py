"""Interleaved A/B re-measure of the r3 wcc/lpa bench drift (VERDICT #8).

BENCH_r03 recorded graph_wcc 4.87 s / graph_lpa 6.15 s while
BENCH/BASELINE.md's warm-repeat note claimed 5.8-6.9 / 6.8-7.0 — the
table and the JSON disagreed on which epoch was clean. This runs the two
queries interleaved (A/B/A/B/...) in one warm session at the bench
configuration and appends one JSON line per leg to
BENCH/scaling_runs.jsonl, so BASELINE.md can quote one consistent
median per query.

Usage: python tools/drift_check.py [legs-per-query, default 4]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from graph_data_science_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    import __spark_entry__ as entrymod

    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="drift-check", cores=CPUS,
                      shuffle_partitions=CPUS, driver_memory="48g")
    qs = entrymod.queries()
    # warm both query paths once (codegen + file-scan caches)
    for name in ("graph_wcc", "graph_lpa"):
        qs[name](spark, SF_DIR).count()

    out_path = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")
    results: dict[str, list[float]] = {"graph_wcc": [], "graph_lpa": []}
    with open(out_path, "a") as f:
        for leg in range(legs):
            for name in ("graph_wcc", "graph_lpa"):
                t0 = time.time()
                qs[name](spark, SF_DIR).count()
                dt = round(time.time() - t0, 3)
                results[name].append(dt)
                rec = {"kind": "drift_check_r4", "query": name, "leg": leg,
                       "wall_sec": dt, "cpus": CPUS, "sf": SF_DIR}
                f.write(json.dumps(rec) + "\n")
                print(rec)
    import statistics

    for name, ts in results.items():
        print(f"{name}: legs={ts} median={statistics.median(ts)}")


if __name__ == "__main__":
    main()
