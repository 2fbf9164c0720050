"""Interleaved A/B: legacy cut_lineage (partitioning lost) vs
partitioning-preserving cut_lineage, on the cut_lineage-heavy bench
queries, one Spark session, alternating legs (CLAUDE.md measurement
discipline — never conclude from one leg)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["graph_wcc", "graph_lpa", "graph_betweenness_tree", "graph_sssp_paths"]
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))

spark = get_spark(app_name="ab-cutlineage", cores=32, shuffle_partitions=32,
                  driver_memory="48g")
import __spark_entry__ as entrymod

qs = entrymod.queries()

# warmup both paths
os.environ["CUT_LINEAGE_LEGACY"] = "1"
qs["graph_wcc"](spark, SF_DIR).count()
os.environ["CUT_LINEAGE_LEGACY"] = "0"
qs["graph_wcc"](spark, SF_DIR).count()

results = {q: {"legacy": [], "preserve": []} for q in QUERIES}
for r in range(ROUNDS):
    for q in QUERIES:
        for mode, env in (("legacy", "1"), ("preserve", "0")):
            os.environ["CUT_LINEAGE_LEGACY"] = env
            t0 = time.time()
            qs[q](spark, SF_DIR).count()
            results[q][mode].append(round(time.time() - t0, 2))
            print(f"# r{r} {q} {mode}: {results[q][mode][-1]}s", file=sys.stderr)

summary = {}
for q in QUERIES:
    lg, pv = sorted(results[q]["legacy"]), sorted(results[q]["preserve"])
    summary[q] = {
        "legacy_legs": results[q]["legacy"],
        "preserve_legs": results[q]["preserve"],
        "legacy_median": lg[len(lg) // 2],
        "preserve_median": pv[len(pv) // 2],
    }
print(json.dumps({"kind": "ab_cut_lineage_r5", "sf": SF_DIR, "summary": summary}))
