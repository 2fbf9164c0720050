"""Random walks + random-walk-with-restart graph sampling.

Reference surface:
  - gds.randomWalk (algo/.../walking/RandomWalk.java — node2vec-style
    walks with return/in-out factors; we implement the uniform case)
  - gds.graph.sample.rwr (graph-sampling/.../samplers/rw/rwr —
    random walk with restart subgraph sampling; Gemulla-style)

Spark-first: walker steps are pure hash functions of
(seed, walker, step) — deterministic at any parallelism, no RNG state.
One iteration = one join against the cached adjacency-list table and an
element_at pick; walk state stays a DataFrame (walker, position, path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph


def _adjacency(graph: Graph) -> DataFrame:
    """(vid, nbrs sorted array, deg) — cached per sampling run."""
    return (
        graph.edges.groupBy(F.col("src").alias("vid"))
        .agg(F.array_sort(F.collect_list("dst")).alias("nbrs"))
        .withColumn("deg", F.size("nbrs"))
        .persist()
    )


def random_walks(
    graph: Graph,
    walks_per_node: int = 1,
    walk_length: int = 5,
    seed: int = 42,
    start_nodes: DataFrame | None = None,
) -> DataFrame:
    """(walk_id, start, path array<long>). Walks stop early at sinks.

    Uniform next-neighbor choice: index = xxhash64(seed, walk_id, step)
    mod degree — the deterministic analogue of the reference's seeded
    uniform sampler.
    """
    adj = _adjacency(graph)
    starts = (start_nodes or graph.nodes).select("vid")
    walkers = starts.select(
        F.col("vid").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
    ).select(
        F.concat_ws("_", F.col("start"), F.col("w")).alias("walk_id"),
        "start",
        F.col("start").alias("cur"),
        F.array(F.col("start")).alias("path"),
        F.lit(False).alias("stopped"),
    )
    state = walkers.persist()
    for step in range(walk_length):
        nbr = adj.select(F.col("vid").alias("cur"), "nbrs", "deg")
        joined = state.join(nbr, "cur", "left")
        idx = F.pmod(
            F.abs(F.xxhash64(F.lit(seed), F.col("walk_id"), F.lit(step))), F.col("deg")
        )
        nxt = F.when(
            ~F.col("stopped") & F.col("deg").isNotNull() & (F.col("deg") > 0),
            F.element_at(F.col("nbrs"), (idx + 1).cast("int")),
        )
        new_state = joined.select(
            "walk_id",
            "start",
            F.coalesce(nxt, F.col("cur")).alias("cur"),
            F.when(nxt.isNotNull(), F.concat(F.col("path"), F.array(nxt)))
            .otherwise(F.col("path"))
            .alias("path"),
            (F.col("stopped") | nxt.isNull()).alias("stopped"),
        ).persist()
        new_state.count()
        state.unpersist()
        state = new_state
    out = state.select("walk_id", "start", "path")
    adj.unpersist()
    return out


def sample_rwr(
    graph: Graph,
    start_nodes: DataFrame,
    restart_probability: float = 0.1,
    walk_length: int = 10,
    walks_per_node: int = 5,
    seed: int = 42,
) -> Graph:
    """Random-walk-with-restart subgraph sample (gds.graph.sample.rwr):
    the induced subgraph over all nodes visited by restarting walks.

    Restart = with probability p the walker jumps back to its start
    (decided by hash(seed+1, walk_id, step) — deterministic).
    """
    adj = _adjacency(graph)
    walkers = start_nodes.select(
        F.col("vid").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
    ).select(
        F.concat_ws("_", F.col("start"), F.col("w")).alias("walk_id"),
        "start",
        F.col("start").alias("cur"),
    )
    visited = walkers.select(F.col("cur").alias("vid"))
    state = walkers.persist()
    p_scaled = int(restart_probability * (1 << 30))
    for step in range(walk_length):
        nbr = adj.select(F.col("vid").alias("cur"), "nbrs", "deg")
        joined = state.join(nbr, "cur", "left")
        restart = (
            F.pmod(F.abs(F.xxhash64(F.lit(seed + 1), F.col("walk_id"), F.lit(step))),
                   F.lit(1 << 30))
            < p_scaled
        )
        idx = F.pmod(
            F.abs(F.xxhash64(F.lit(seed), F.col("walk_id"), F.lit(step))), F.col("deg")
        )
        nxt = F.when(restart, F.col("start")).otherwise(
            F.when(
                F.col("deg").isNotNull() & (F.col("deg") > 0),
                F.element_at(F.col("nbrs"), (idx + 1).cast("int")),
            ).otherwise(F.col("start"))  # sink -> restart
        )
        new_state = joined.select("walk_id", "start", nxt.alias("cur")).persist()
        new_state.count()
        state.unpersist()
        state = new_state
        visited = visited.unionByName(state.select(F.col("cur").alias("vid")))
    keep = visited.distinct().persist()
    kept_nodes = graph.nodes.join(keep, "vid", "left_semi")
    kept_edges = (
        graph.edges.join(keep.withColumnRenamed("vid", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        .select("src", "dst", "weight")
    )
    adj.unpersist()
    from dataclasses import replace

    return replace(graph, nodes=kept_nodes, edges=kept_edges, name=f"{graph.name or 'g'}_rwr")
