"""Link-prediction topology functions — gds.alpha.linkprediction.* parity.

Reference: `alpha` procedures listed in OpenGdsProcedureSmokeTest.java:
adamicAdar, resourceAllocation, commonNeighbors, preferentialAttachment,
totalNeighbors, sameCommunity.

Spark formulation: the pairwise functions operate on a DataFrame of
candidate pairs (a, b) joined against a precomputed neighbor-set table
nbrs(vid, neighbors: array<long> SORTED). Set math is array_intersect /
array_union (JVM-side); the per-common-neighbor weights (1/log(deg),
1/deg) come from one extra join against the degree table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph, Orientation


def neighbor_sets(graph: Graph) -> DataFrame:
    """nbrs(vid, neighbors sorted asc, degree) over the undirected view —
    sortedness mirrors the reference's sorted adjacency contract
    (AdjacencyCursor.java)."""
    e = graph.edges
    if graph.orientation != Orientation.UNDIRECTED:
        e = e.select("src", "dst").unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:
        e = e.select("src", "dst")
    e = e.filter(F.col("src") != F.col("dst")).distinct()
    return e.groupBy(F.col("src").alias("vid")).agg(
        F.array_sort(F.collect_set("dst")).alias("neighbors"),
        F.count(F.lit(1)).alias("degree"),
    )


def _with_sets(pairs: DataFrame, nbrs: DataFrame) -> DataFrame:
    na = nbrs.select(F.col("vid").alias("a"), F.col("neighbors").alias("nbrs_a"),
                     F.col("degree").alias("deg_a"))
    nb = nbrs.select(F.col("vid").alias("b"), F.col("neighbors").alias("nbrs_b"),
                     F.col("degree").alias("deg_b"))
    return (
        pairs.join(na, "a", "left")
        .join(nb, "b", "left")
        .withColumn("nbrs_a", F.coalesce("nbrs_a", F.array().cast("array<long>")))
        .withColumn("nbrs_b", F.coalesce("nbrs_b", F.array().cast("array<long>")))
        .withColumn("deg_a", F.coalesce("deg_a", F.lit(0)))
        .withColumn("deg_b", F.coalesce("deg_b", F.lit(0)))
    )


def common_neighbors(pairs: DataFrame, nbrs: DataFrame) -> DataFrame:
    """score = |N(a) ∩ N(b)|."""
    return _with_sets(pairs, nbrs).select(
        "a", "b",
        F.size(F.array_intersect("nbrs_a", "nbrs_b")).cast("double").alias("score"),
    )


def total_neighbors(pairs: DataFrame, nbrs: DataFrame) -> DataFrame:
    """score = |N(a) ∪ N(b)|."""
    return _with_sets(pairs, nbrs).select(
        "a", "b",
        F.size(F.array_union("nbrs_a", "nbrs_b")).cast("double").alias("score"),
    )


def preferential_attachment(pairs: DataFrame, nbrs: DataFrame) -> DataFrame:
    """score = deg(a) · deg(b)."""
    return _with_sets(pairs, nbrs).select(
        "a", "b", (F.col("deg_a") * F.col("deg_b")).cast("double").alias("score")
    )


def _common_weighted(pairs: DataFrame, nbrs: DataFrame, weight_expr) -> DataFrame:
    """Σ over common neighbors c of weight(deg(c)) — explode the
    intersection, join degrees, aggregate. One shuffle on the (small)
    exploded pair-commons table."""
    degs = nbrs.select(F.col("vid").alias("c"), F.col("degree").alias("deg_c"))
    commons = (
        _with_sets(pairs, nbrs)
        .select("a", "b", F.explode_outer(F.array_intersect("nbrs_a", "nbrs_b")).alias("c"))
    )
    scored = (
        commons.join(degs, "c", "left")
        .groupBy("a", "b")
        .agg(F.sum(F.when(F.col("c").isNotNull(), weight_expr)).alias("score"))
    )
    return scored.select("a", "b", F.coalesce("score", F.lit(0.0)).alias("score"))


def adamic_adar(pairs: DataFrame, nbrs: DataFrame) -> DataFrame:
    """score = Σ_{c ∈ N(a)∩N(b)} 1 / ln(deg(c))."""
    return _common_weighted(pairs, nbrs, F.lit(1.0) / F.log(F.col("deg_c").cast("double")))


def resource_allocation(pairs: DataFrame, nbrs: DataFrame) -> DataFrame:
    """score = Σ_{c ∈ N(a)∩N(b)} 1 / deg(c)."""
    return _common_weighted(pairs, nbrs, F.lit(1.0) / F.col("deg_c").cast("double"))


def same_community(pairs: DataFrame, communities: DataFrame) -> DataFrame:
    """score = 1.0 if community(a) == community(b) else 0.0;
    communities(vid, community)."""
    ca = communities.select(F.col("vid").alias("a"), F.col("community").alias("com_a"))
    cb = communities.select(F.col("vid").alias("b"), F.col("community").alias("com_b"))
    return (
        pairs.join(ca, "a", "left")
        .join(cb, "b", "left")
        .select(
            "a", "b",
            F.when(
                F.col("com_a").isNotNull() & (F.col("com_a") == F.col("com_b")), 1.0
            ).otherwise(0.0).alias("score"),
        )
    )
