"""Modularity and conductance metrics — gds.modularity / gds.conductance.

Reference: algo/src/main/java/org/neo4j/gds/modularity/ (per-community
modularity given an assignment) and algo/.../conductance/ (per-community
conductance). Both are METRICS over an existing community assignment —
single-pass aggregations, no iteration.

Definitions (undirected, weighted):
  modularity(C) = e_C / m  -  (d_C / 2m)^2
    where m = total edge weight (each undirected edge counted once),
    e_C = weight of intra-community edges, d_C = sum of degrees in C.
  total modularity Q = Σ_C modularity(C).
  conductance(C) = cut(C) / min(vol(C), vol(V \\ C)) — reference reports
    cut(C) / (cut(C) + internal volume); we follow the reference's
    formulation: external / (external + internal) edge weight per
    community.

Spark: two joins edge→community + groupBy — Catalyst handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph, Orientation


def _undirected_canonical(graph: Graph) -> DataFrame:
    e = graph.edges
    if graph.orientation == Orientation.UNDIRECTED:
        # stored both ways; canonicalize to one row per undirected edge
        e = e.filter(F.col("src") <= F.col("dst"))
    return e.select("src", "dst", "weight")


def modularity(graph: Graph, communities: DataFrame) -> DataFrame:
    """Per-community modularity. communities: (vid, community).
    Returns (community, modularity)."""
    e = _undirected_canonical(graph)
    ca = communities.select(F.col("vid").alias("src"), F.col("community").alias("c_src"))
    cb = communities.select(F.col("vid").alias("dst"), F.col("community").alias("c_dst"))
    tagged = e.join(ca, "src").join(cb, "dst").persist()

    m = tagged.agg(F.sum("weight")).collect()[0][0] or 1.0
    intra = (
        tagged.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("community"))
        .agg(F.sum("weight").alias("e_c"))
    )
    # degree mass per community: every edge endpoint contributes its weight
    ends = tagged.select(F.col("c_src").alias("community"), "weight").unionByName(
        tagged.select(F.col("c_dst").alias("community"), "weight")
    )
    deg_mass = ends.groupBy("community").agg(F.sum("weight").alias("d_c"))
    out = (
        deg_mass.join(intra, "community", "left")
        .select(
            "community",
            (
                F.coalesce(F.col("e_c"), F.lit(0.0)) / F.lit(m)
                - F.pow(F.col("d_c") / F.lit(2.0 * m), 2)
            ).alias("modularity"),
        )
    )
    tagged.unpersist()
    return out


def total_modularity(graph: Graph, communities: DataFrame) -> float:
    return (
        modularity(graph, communities).agg(F.sum("modularity")).collect()[0][0] or 0.0
    )


def conductance(graph: Graph, communities: DataFrame) -> DataFrame:
    """Per-community conductance: external / (external + internal) edge
    weight, over the undirected view (ConductanceProc semantics).
    Returns (community, conductance); communities with no edges get NULL.
    """
    e = _undirected_canonical(graph)
    # count each undirected edge from both endpoints' perspective
    both = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    ca = communities.select(F.col("vid").alias("src"), F.col("community").alias("c_src"))
    cb = communities.select(F.col("vid").alias("dst"), F.col("community").alias("c_dst"))
    tagged = both.join(ca, "src").join(cb, "dst")
    per = (
        tagged.groupBy(F.col("c_src").alias("community"))
        .agg(
            F.sum(F.when(F.col("c_src") == F.col("c_dst"), F.col("weight")).otherwise(0.0)).alias("internal"),
            F.sum(F.when(F.col("c_src") != F.col("c_dst"), F.col("weight")).otherwise(0.0)).alias("external"),
        )
    )
    return per.select(
        "community",
        F.when(
            (F.col("internal") + F.col("external")) > 0,
            F.col("external") / (F.col("internal") + F.col("external")),
        ).alias("conductance"),
    )
