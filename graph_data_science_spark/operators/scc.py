"""Strongly connected components — gds.scc analogue.

Reference: algo/src/main/java/org/neo4j/gds/scc/ (Tarjan-based,
inherently sequential). The distributed formulation here is the
COLORING algorithm (Orzan 2004 / Slota et al. — public literature),
BSP-friendly:

  repeat until all nodes assigned:
    1. color fixpoint: color(v) = max(color(u)) over in-edges u→v,
       initialized to own vid (forward max-propagation);
    2. for each color root r (node with color(r) == vid == r), the SCC
       of r = nodes with color r that can reach r BACKWARD within the
       color class (backward reachability fixpoint restricted to
       same-color edges);
    3. assign those nodes component id r (matches "max vid in SCC" —
       deterministic), remove them, repeat on the remainder.

Each outer round peels at least every current color-root's SCC; rounds
needed ≈ length of the longest chain of SCCs (the condensation depth).
Fine for graphs whose condensation is shallow; document as the scale
caveat (a chain of n trivial SCCs degrades to O(n) rounds — trivial
SCCs are peeled in bulk here because every node that IS its own color
root and unreachable-backward forms a singleton in the same round).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.pregel import PregelEngine
from graph_data_science_spark.plans.graph import Graph


@dataclass
class SccResult:
    components: DataFrame  # (vid, component) — component = max vid in SCC
    rounds: int
    did_converge: bool = True  # False => round/iteration budget exhausted;
    # leftover nodes were assigned singleton components (component = vid)
    # and one SCC may be split across ids — treat results as approximate
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _max_color_fixpoint(nodes: DataFrame, edges: DataFrame, eng: PregelEngine,
                        max_iterations: int) -> tuple[DataFrame, bool]:
    """color(v) := max(own vid, colors of forward predecessors)."""
    state0 = nodes.select("vid", F.col("vid").alias("color"), F.lit(True).alias("changed"))

    def step(state, s):
        senders = state.filter(F.col("changed")).select(
            F.col("vid").alias("e_src"), "color"
        )
        msgs = (
            senders.join(edges, "e_src")
            .groupBy(F.col("e_dst").alias("vid"))
            .agg(F.max("color").alias("cand"))
        )
        joined = state.join(msgs, "vid", "left")
        new_color = F.greatest(F.col("color"), F.coalesce(F.col("cand"), F.col("color")))
        return joined.select(
            "vid", new_color.alias("color"), (new_color > F.col("color")).alias("changed")
        )

    res = eng.run(
        initial_state=state0, step=step,
        stats_exprs=[F.sum(F.col("changed").cast("long")).alias("changed_count")],
        converged=lambda st: (st["changed_count"] or 0) == 0,
        max_iterations=max_iterations,
    )
    return res.state.select("vid", "color"), res.did_converge


def _backward_reach_within_color(colors: DataFrame, edges: DataFrame,
                                 eng: PregelEngine, max_iterations: int) -> tuple[DataFrame, bool]:
    """Nodes that reach their color root going backward, staying inside
    their color class. Returns (vid, color) of matched nodes."""
    # reversed edges restricted to same-color endpoints
    ce = (
        edges.join(colors.select(F.col("vid").alias("e_src"), F.col("color").alias("c1")), "e_src")
        .join(colors.select(F.col("vid").alias("e_dst"), F.col("color").alias("c2")), "e_dst")
        .filter(F.col("c1") == F.col("c2"))
        # reverse: propagate 'reached' from root against edge direction
        .select(F.col("e_dst").alias("e_src2"), F.col("e_src").alias("e_dst2"))
        .withColumnRenamed("e_src2", "e_src")
        .withColumnRenamed("e_dst2", "e_dst")
    )
    state0 = colors.select(
        "vid", "color", (F.col("vid") == F.col("color")).alias("reached"),
        (F.col("vid") == F.col("color")).alias("changed"),
    )

    def step(state, s):
        senders = state.filter(F.col("changed")).select(F.col("vid").alias("e_src"))
        msgs = senders.join(ce, "e_src").select(F.col("e_dst").alias("vid")).distinct() \
            .withColumn("msg", F.lit(True))
        joined = state.join(msgs, "vid", "left")
        new_reached = F.col("reached") | F.coalesce(F.col("msg"), F.lit(False))
        return joined.select(
            "vid", "color", new_reached.alias("reached"),
            (new_reached & ~F.col("reached")).alias("changed"),
        )

    res = eng.run(
        initial_state=state0, step=step,
        stats_exprs=[F.sum(F.col("changed").cast("long")).alias("changed_count")],
        converged=lambda st: (st["changed_count"] or 0) == 0,
        max_iterations=max_iterations,
    )
    return res.state.filter(F.col("reached")).select("vid", "color"), res.did_converge


def scc(graph: Graph, max_rounds: int = 50, max_iterations: int = 100,
        engine: PregelEngine | None = None) -> SccResult:
    spark = graph.edges.sparkSession
    eng = engine or PregelEngine(spark)
    edges_all = graph.edges.select(
        F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
    ).distinct().persist()

    remaining_nodes = graph.nodes.select("vid").persist()
    remaining_edges = edges_all
    assigned = None
    rounds = 0
    did_converge = True
    n_left = 0
    while rounds < max_rounds:
        rounds += 1
        n_left = remaining_nodes.count()
        if n_left == 0:
            break
        colors, conv_c = _max_color_fixpoint(remaining_nodes, remaining_edges, eng, max_iterations)
        colors = colors.persist()
        matched, conv_b = _backward_reach_within_color(colors, remaining_edges, eng, max_iterations)
        did_converge = did_converge and conv_c and conv_b
        matched = matched.select("vid", F.col("color").alias("component")).persist()
        matched.count()
        assigned = matched if assigned is None else assigned.unionByName(matched).persist()
        new_nodes = remaining_nodes.join(matched.select("vid"), "vid", "left_anti").persist()
        new_edges = (
            remaining_edges
            .join(new_nodes.withColumnRenamed("vid", "e_src"), "e_src", "left_semi")
            .join(new_nodes.withColumnRenamed("vid", "e_dst"), "e_dst", "left_semi")
            .select("e_src", "e_dst")
            .persist()
        )
        new_nodes.count()
        remaining_nodes.unpersist()
        if remaining_edges is not edges_all:
            remaining_edges.unpersist()
        colors.unpersist()
        remaining_nodes, remaining_edges = new_nodes, new_edges

    edges_all.unpersist()
    # round budget exhausted with nodes left: assign them singleton
    # components (component = own vid) rather than silently dropping them,
    # and surface the truncation via did_converge=False
    if rounds >= max_rounds and remaining_nodes.count() > 0:
        leftover = remaining_nodes.select("vid", F.col("vid").alias("component"))
        assigned = leftover if assigned is None else assigned.unionByName(leftover)
        did_converge = False
    out = assigned if assigned is not None else graph.nodes.select(
        "vid", F.col("vid").alias("component")
    )
    return SccResult(components=out.select("vid", "component"), rounds=rounds,
                     did_converge=did_converge)
