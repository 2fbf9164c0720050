"""One scaling measurement: PageRank, fixed 20 supersteps, one
parallelism level. Usage: python tools/scale_child.py <cores> <backend>
<nodes>. Prints one RESULT json line."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.session import get_spark
from graph_data_science_spark.operators.pagerank import page_rank
from graph_data_science_spark.sources.generator import random_graph


def main():
    spec, backend, nodes = sys.argv[1], sys.argv[2], int(sys.argv[3])
    if spec.startswith("lc"):
        # lc<executors>x<cores-per-exec>: Spark's local-cluster master —
        # REAL separate executor JVMs (own block manager / shuffle / GC),
        # the faithful stand-in for N vs 4N executors on one box
        n_exec, per = (int(x) for x in spec[2:].split("x"))
        total = n_exec * per
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(f"local-cluster[{n_exec},{per},6144]")
            .appName(f"scaling-{spec}")
            .config("spark.sql.shuffle.partitions", str(total))
            .config("spark.default.parallelism", str(total))
            .config("spark.driver.memory", "8g")
            .config("spark.executor.memory", "6g")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled",
                    os.environ.get("COALESCE", "true"))
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
        cores = total
    else:
        cores = int(spec)
        spark = get_spark(app_name=f"scaling-{cores}", cores=cores,
                          shuffle_partitions=cores, driver_memory="40g")
    g = random_graph(spark, nodes, 8, seed=42)
    g.edges.persist()
    m = g.edges.count()
    g.nodes.persist()
    g.nodes.count()
    t0 = time.time()
    res = page_rank(g, tolerance=0, max_iterations=20, backend=backend, stats_interval=5)
    res.scores.count()
    wall = time.time() - t0
    print("RESULT " + json.dumps({
        "cores": cores, "backend": backend, "wall_sec": round(wall, 2),
        "edges": m, "supersteps": 20,
        "throughput": round(m * 20 / wall, 1),
    }))


if __name__ == "__main__":
    main()
