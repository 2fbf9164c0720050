"""DFS + collapsePath — the remaining traversal surface.

Reference:
  - gds.dfs: algo/src/main/java/org/neo4j/gds/traversal (DFS.java) —
    depth-first visit order from a source, neighbors in adjacency
    (sorted-id) order. DFS order is inherently SEQUENTIAL (a stack);
    there is no shuffle formulation that preserves it, so this runs on
    the driver over a collected adjacency view and refuses graphs above
    validation scale — mirroring the async_serial LPA parity mode. (BFS,
    the parallelizable traversal, rides the PregelEngine in
    operators/paths.py.)
  - gds.collapsePath: algo/.../walking/CollapsePath.java — compose a
    chain of relationship DataFrames into direct edges from path start
    to path end. That is literally a chain of joins: Catalyst's bread
    and butter; fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph


def dfs(
    graph: Graph,
    source: int,
    max_depth: int | None = None,
    target_nodes: list[int] | None = None,
) -> DataFrame:
    """(vid, visit_order) in depth-first order from source; neighbors
    visited in ascending target id (the reference's sorted-adjacency
    order). Stops at max_depth / when all target_nodes are reached."""
    n_edges = graph.edges.count()
    if n_edges > 1_000_000:
        raise ValueError(
            f"dfs preserves sequential visit order and runs on the driver; "
            f"got {n_edges} edges > 1e6 — use bfs() for distributed traversal"
        )
    adj: dict[int, list[int]] = {}
    for r in (
        graph.edges.select("src", "dst")
        .distinct()
        .groupBy("src")
        .agg(F.array_sort(F.collect_list("dst")).alias("nbrs"))
        .collect()
    ):
        adj[r["src"]] = list(r["nbrs"])
    targets = set(target_nodes or [])
    visited: dict[int, int] = {}
    order = 0
    # stack of (node, depth); push neighbors reversed so the smallest id
    # pops first
    stack: list[tuple[int, int]] = [(source, 0)]
    while stack:
        node, depth = stack.pop()
        if node in visited:
            continue
        visited[node] = order
        order += 1
        if targets and targets <= set(visited):
            break
        if max_depth is not None and depth >= max_depth:
            continue
        for nbr in reversed(adj.get(node, [])):
            if nbr not in visited:
                stack.append((nbr, depth + 1))
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(v, o) for v, o in visited.items()], "vid long, visit_order long"
    )


def collapse_path(
    edge_chain: list[DataFrame],
    allow_self_loops: bool = False,
) -> DataFrame:
    """Compose a chain of edge DataFrames (src, dst) into direct
    (src, dst) edges from each path's start to its end
    (gds.collapsePath; the reference mutates a new relationship type —
    here the result IS the new edge DataFrame, weight = 1.0).
    """
    if not edge_chain:
        raise ValueError("edge_chain must contain at least one DataFrame")
    acc = edge_chain[0].select(F.col("src").alias("path_src"), F.col("dst").alias("cur"))
    for nxt in edge_chain[1:]:
        acc = acc.join(
            nxt.select(F.col("src").alias("cur"), F.col("dst").alias("nxt")), "cur"
        ).select("path_src", F.col("nxt").alias("cur"))
    out = acc.select(
        F.col("path_src").alias("src"), F.col("cur").alias("dst")
    ).distinct()
    if not allow_self_loops:
        out = out.filter(F.col("src") != F.col("dst"))
    return out.withColumn("weight", F.lit(1.0))
