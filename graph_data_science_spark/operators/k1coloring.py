"""K-1 coloring — gds.k1coloring (greedy parallel graph coloring).

Reference: algo/src/main/java/org/neo4j/gds/k1coloring/K1Coloring.java
(loop :121-136: color step then validation step until no conflicts or
maxIterations), ColoringStep.java:54-75 (each node takes the SMALLEST
color not used by any neighbor, reading the current colors array),
ValidationStep.java:54-73 (a node re-colors next round iff it conflicts
with a neighbor that is not itself already marked for re-coloring — i.e.
only one side of each conflicting pair re-colors).

Spark mapping: colors are a (vid, color) DataFrame; the "smallest free
color" is a pure Column expression over the sorted set of neighbor
colors (first value of 0..n not contained in it — no Python UDF); the
validation rule's race is made deterministic: in a conflicting pair the
LARGER vid re-colors. Used by Louvain's local-move phase exactly as the
reference uses it (ModularityOptimization.java:64
K1COLORING_MAX_ITERATIONS = 5).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.plans.lineage import cut_lineage


@dataclass
class K1ColoringResult:
    colors: DataFrame  # (vid, color)
    ran_iterations: int
    did_converge: bool


def _smallest_free(colors_arr):
    """Smallest non-negative int not in the (distinct) array — pure SQL:
    the first element of [0..size] not contained in the array."""
    return F.filter(
        F.sequence(F.lit(0), F.size(colors_arr)),
        lambda x: ~F.array_contains(colors_arr, x),
    )[0]


def k1_coloring(graph: Graph, max_iterations: int = 10,
                init_coin: str = "xxhash64") -> K1ColoringResult:
    edges = graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return color_edges(both, graph.nodes.select("vid"), max_iterations, init_coin)


def color_edges(both: DataFrame, nodes: DataFrame, max_iterations: int = 10,
                init_coin: str = "xxhash64") -> K1ColoringResult:
    """Coloring over a pre-built both-directions edge DataFrame (src, dst)
    — the entry Louvain's local-move phase uses on each level graph.
    init_coin="md5" makes the symmetry-breaking init engine-portable
    (the DuckDB oracle replays identical colors round by round)."""
    both = both.select("src", "dst").persist()
    # Symmetry-breaking init: a deterministic hash spread over a few colors
    # (the reference starts all-zero and relies on thread races to break
    # symmetry, ColoringStep reading the concurrently-updated array; a BSP
    # engine has no races, so an all-zero start wastes rounds re-coloring
    # everyone in lockstep). Conflict-resolution rounds then fix the rest.
    # NB: every per-round DataFrame must be cut to a LogicalRDD
    # (localCheckpoint), NOT merely persisted — persist() leaves the logical
    # plan intact and chained rounds make analysis/stats-estimation cost
    # exponential (measured: Catalyst BigInt size estimates with millions of
    # bits on the uncut tree).
    if init_coin == "md5":
        from graph_data_science_spark.operators.influence import _md5_u32

        init_color = F.pmod(_md5_u32(F.lit("k1c"), F.col("vid")), F.lit(8))
    else:
        init_color = F.pmod(F.xxhash64(F.col("vid")), F.lit(8))
    colors = nodes.select(
        "vid", init_color.cast("long").alias("color")
    ).transform(cut_lineage)
    # first round validates everyone: re-color one side of each conflict
    c_src0 = colors.select(F.col("vid").alias("src"), F.col("color").alias("c_src"))
    c_dst0 = colors.select(F.col("vid").alias("dst"), F.col("color").alias("c_dst"))
    to_color = (
        both.filter(F.col("src") > F.col("dst"))
        .join(c_src0, "src")
        .join(c_dst0, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .select(F.col("src").alias("vid"))
        .distinct()
        .transform(cut_lineage)
    )
    ran = 0
    did_converge = to_color.count() == 0
    for it in range(max_iterations):
        if did_converge:
            break
        ran = it + 1
        # coloring step: smallest color not used by ANY neighbor
        nbr = (
            both.join(to_color.select(F.col("vid").alias("src")), "src", "left_semi")
            .join(colors.select(F.col("vid").alias("dst"), "color"), "dst")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.array_sort(F.collect_set("color")).alias("nbr_colors"))
            .select("vid", _smallest_free(F.col("nbr_colors")).alias("new_color"))
        )
        colors = (
            colors.join(nbr, "vid", "left")
            .select("vid", F.coalesce("new_color", "color").alias("color"))
            .transform(cut_lineage)
        )
        # validation step: in each same-color adjacent pair the larger vid
        # re-colors (deterministic stand-in for ValidationStep's race)
        c_src = colors.select(F.col("vid").alias("src"), F.col("color").alias("c_src"))
        c_dst = colors.select(F.col("vid").alias("dst"), F.col("color").alias("c_dst"))
        conflicts = (
            both.filter(F.col("src") > F.col("dst"))
            .join(c_src, "src")
            .join(c_dst, "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .select(F.col("src").alias("vid"))
            .distinct()
        )
        to_color = conflicts.transform(cut_lineage)
        if to_color.count() == 0:
            did_converge = True
            break
    both.unpersist()
    return K1ColoringResult(colors=colors, ran_iterations=ran, did_converge=did_converge)
