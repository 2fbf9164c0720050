"""Per-round benchmark. Prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline (BASELINE.md protocol): PageRank to convergence (tolerance
1e-6, damping 0.85) on the seeded power-law import graph (seed 42) —
reports iterate-phase wall-clock, supersteps, and edges-processed/sec
for BOTH backends. The BLESSED backend is sql (pure-JVM join path):
round-2 measurements show it beats the csr/Arrow SpMV backend at every
sandbox-feasible scale (see BENCH/BASELINE.md "backend decision"), so
sql is the headline metric and csr is tracked as the secondary. Plus
wall-clock for a representative subset of the __spark_entry__ queries
at $SPARK_GRAFT_SF_DIR.

Scaling (N vs 4N) is measured by tools/bench_scaling.py (subprocess per
parallelism level) and recorded in BENCH/BASELINE.md — kept out of the
per-round bench to keep it fast.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_data_science_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_NODES = int(os.environ.get("BENCH_NODES", "100000"))  # sized to finish inside one sandbox uptime window
BENCH_AVG_DEG = int(os.environ.get("BENCH_AVG_DEG", "8"))


def bench_pagerank(spark, backend: str) -> dict:
    from graph_data_science_spark.operators.pagerank import page_rank
    from graph_data_science_spark.sources.generator import random_graph

    g = random_graph(spark, BENCH_NODES, BENCH_AVG_DEG, seed=42)
    g.edges.persist()
    m = g.edges.count()  # materialize outside the timed section
    g.nodes.persist()
    g.nodes.count()

    t0 = time.time()
    # stats_interval=5: convergence detected at the next multiple of 5
    # (ran_iterations is then an upper bound within 4 supersteps) — the
    # per-superstep driver overhead would otherwise dominate the metric
    res = page_rank(
        g, damping_factor=0.85, tolerance=1e-6, max_iterations=100,
        backend=backend, stats_interval=5,
    )
    res.scores.count()
    wall = time.time() - t0
    supersteps = res.ran_iterations if not res.did_converge else res.ran_iterations + 1
    out = {
        "wall_sec": round(wall, 3),
        "supersteps": res.ran_iterations,
        "did_converge": res.did_converge,
        "edges": m,
        "edges_per_sec": round(m * max(supersteps, 1) / wall, 1),
    }
    g.edges.unpersist()
    g.nodes.unpersist()
    return out


def bench_queries(spark) -> dict:
    import __spark_entry__ as entrymod

    # dedup_minhash_lsh excluded: at sf0.1 the synthetic docs' shared
    # vocabulary makes LSH candidate pairs quadratic-ish (millions) — it
    # is correctness-gated at sf0.01 instead; the bench stays bounded
    subset = [
        "graph_pagerank", "graph_wcc", "graph_lpa",
        "graph_triangle_per_node", "graph_degree", "dedup_exact",
        "text_quality", "text_langid", "ann_topk_cosine",
        "graph_modularity", "graph_sssp_paths", "graph_betweenness_tree",
        "ann_embedding_neardup",
    ]
    # graph_louvain excluded from the timed subset: its color-sweep level
    # loop is job-count-bound on the (fixed-size) clique-ring fixture, so
    # it measures scheduler latency, not data path; it stays in the
    # CORRECTNESS gate
    qs = entrymod.queries()
    times = {}
    for name in subset:
        t0 = time.time()
        try:
            qs[name](spark, SF_DIR).count()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # surface breakage as a sentinel, keep benching
            times[name] = -1.0
            print(f"# bench query {name} failed: {e}", file=sys.stderr)
    return times


def warmup(spark) -> None:
    """Untimed warm-up of BOTH backends on a small graph before anything
    is timed: JVM JIT, codegen caches, and Arrow/pandas worker startup
    otherwise penalize whichever backend runs first (round 2's sql-vs-csr
    comparison flipped purely on run order)."""
    from graph_data_science_spark.operators.pagerank import page_rank
    from graph_data_science_spark.sources.generator import random_graph

    g = random_graph(spark, 5000, 4, seed=7)
    g.edges.persist().count()
    g.nodes.persist().count()
    for backend in ("sql", "csr"):
        page_rank(g, damping_factor=0.85, tolerance=1e-3, max_iterations=6,
                  backend=backend, stats_interval=3).scores.count()
    g.edges.unpersist()
    g.nodes.unpersist()


def main():
    spark = get_spark(app_name="gds-spark-bench", cores=CPUS,
                      shuffle_partitions=CPUS, driver_memory="48g")
    warmup(spark)
    t_total = time.time()
    pr_sql = bench_pagerank(spark, "sql")
    pr_csr = bench_pagerank(spark, "csr")
    # BENCH_SKIP_QUERIES=1: pagerank-only run, used for the one-size-up
    # column (BENCH_NODES=1000000) where the sf-dir query subset would
    # just repeat the sf0.1 numbers
    skip_queries = os.environ.get("BENCH_SKIP_QUERIES", "0") == "1"
    queries = {} if skip_queries else bench_queries(spark)
    total = round(time.time() - t_total, 3)
    result = {
        "metric": "pagerank_sql_iterate_sec",
        "value": pr_sql["wall_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "pagerank_csr": pr_csr,
        "pagerank_sql": pr_sql,
        "bench_graph": {"nodes": BENCH_NODES, "avg_degree": BENCH_AVG_DEG, "seed": 42},
        "cpus": CPUS,
        "total_sec": total,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
