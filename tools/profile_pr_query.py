"""Split graph_pagerank (sf0.1) into build vs iterate wall-clock, to see
where its bench seconds go before touching anything. Interleave-safe:
run multiple legs in one session."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_data_science_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = get_spark(app_name="prof-pr", cores=CPUS, shuffle_partitions=CPUS,
                  driver_memory="48g")
import __spark_entry__ as em
from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.operators.pagerank import page_rank

for leg in range(3):
    t0 = time.time()
    edges = em._part_edges(spark, SF_DIR)
    edges = edges.persist()
    m = edges.count()
    t_build = time.time() - t0

    t0 = time.time()
    g = Graph.from_edges(edges)
    n = g.nodes.count()
    t_graph = time.time() - t0

    t0 = time.time()
    res = page_rank(g, tolerance=0, max_iterations=em.PR_MAX_ITERATIONS,
                    stats_interval=5)
    res.scores.count()
    t_iter = time.time() - t0
    edges.unpersist()
    print(f"leg{leg}: edges={m} nodes={n} build={t_build:.2f}s "
          f"graph={t_graph:.2f}s iterate={t_iter:.2f}s "
          f"({t_iter/20:.3f}s/superstep)", flush=True)
