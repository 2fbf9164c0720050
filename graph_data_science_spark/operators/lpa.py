"""Label Propagation (LPA) — synchronous weighted-majority vote.

Reference: algo/src/main/java/org/neo4j/gds/labelpropagation/:
  - Init (InitStep.java:57-78): label = seed if present else
    maxSeedId + originalNodeId + 1 (with no seed property maxSeed = -1,
    so label = vid).
  - Iterate (ComputeStep.java:80-90, ComputeStepConsumer.java:49-77):
    for each node, tally votes over OUT-neighbors under NATURAL
    orientation: votes[label(nbr)] += relWeight × nodeWeight(nbr);
    adopt argmax; tie -> smaller label id. Node weights from
    nodeWeightProperty, default 1.0 (LabelPropagation.java:82-89).
  - Converged when no node changed in a full pass
    (LabelPropagation.java:112-127).

The reference runs ASYNCHRONOUSLY within an iteration (labels updated in
place, nondeterministic on unstable graphs). Spark is BSP, so we
implement the SYNCHRONOUS variant — the same formulation as the
reference's own Pregel LPA example
(examples/pregel-example/.../lp/LabelPropagationPregel.java:69-118) —
which is deterministic; parity is asserted on fixtures where both agree
(LabelPropagationTest.java:94-135).

Spark plan per superstep: edges ⋈ labels ON edges.dst = labels.vid
(gather neighbor labels) → groupBy(src, label).sum(w) → window
row_number() over (partition by src order by weight desc, label asc) = 1
(argmax with min-label tie-break) → compare/update.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.operators.pregel import PregelEngine
from graph_data_science_spark.plans.graph import Graph


@dataclass
class LpaResult:
    labels: DataFrame  # (vid, label)
    ran_iterations: int
    did_converge: bool
    metrics: list[dict[str, Any]] = field(default_factory=list)


def label_propagation(
    graph: Graph,
    max_iterations: int = 10,
    seed_col: str | None = None,
    node_weight_col: str | None = None,
    engine: PregelEngine | None = None,
    resume: bool = False,
    stats_interval: int = 1,
    mode: str = "sync",  # sync (BSP, scalable) | async_serial (reference parity)
) -> LpaResult:
    """mode="sync" is the scalable BSP formulation (deterministic, may
    oscillate on unstable graphs where the reference's async impl
    converges). mode="async_serial" executes the native algorithm
    EXACTLY (sequential by mapped id, labels updated in place,
    ComputeStep.java:80-90) — the parity/debug path that reproduces the
    reference fixtures bit-for-bit; it materializes the graph on the
    driver, so use it only at validation scale. The scalable middle
    ground (async within partition, sync across — "block-async") is the
    natural extension if sync oscillation bites in production."""
    if mode == "async_serial":
        return _label_propagation_async_serial(
            graph, max_iterations, seed_col, node_weight_col
        )
    spark = graph.edges.sparkSession
    # co-partition + sort once on the gather key (dst), reuse per superstep
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        graph.edges.repartition(n_part, "dst").sortWithinPartitions("dst").persist()
    )

    nodes = graph.nodes
    if seed_col is not None:
        max_seed = nodes.agg(F.max(F.col(seed_col))).collect()[0][0]
        max_seed = -1 if max_seed is None else max_seed
        init_label = F.coalesce(
            F.col(seed_col).cast("long"), F.col("vid") + F.lit(max_seed + 1)
        )
    else:
        # InitStep.java:72-74 with maxSeedId = -1 -> label = vid
        init_label = F.col("vid")
    node_weight = (
        F.coalesce(F.col(node_weight_col).cast("double"), F.lit(1.0))
        if node_weight_col
        else F.lit(1.0)
    )
    state0 = nodes.select(
        "vid", init_label.alias("label"), node_weight.alias("nw"), F.lit(True).alias("changed")
    )

    win = Window.partitionBy("voter").orderBy(F.desc("votes"), F.asc("vote_label"))
    edges_renamed = edges.select(
        F.col("src").alias("voter"), F.col("dst").alias("nbr_vid"), "weight"
    )

    def step(state: DataFrame, s: int) -> DataFrame:
        nbr = state.select(F.col("vid").alias("nbr_vid"), F.col("label").alias("nbr_label"),
                           F.col("nw").alias("nbr_nw"))
        votes = (
            edges_renamed.join(nbr, "nbr_vid")
            .select("voter", F.col("nbr_label").alias("vote_label"),
                    (F.col("weight") * F.col("nbr_nw")).alias("w"))
            .groupBy("voter", "vote_label")
            .agg(F.sum("w").alias("votes"))
        )
        winner = (
            votes.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select(F.col("voter").alias("vid"), F.col("vote_label").alias("new_label"))
        )
        joined = state.drop("changed").join(winner, "vid", "left")
        new_label = F.coalesce(F.col("new_label"), F.col("label"))
        return joined.select(
            "vid",
            new_label.alias("label"),
            "nw",
            (new_label != F.col("label")).alias("changed"),
        )

    eng = engine or PregelEngine(spark)
    result = eng.run(
        initial_state=state0,
        step=step,
        stats_exprs=[F.sum(F.col("changed").cast("long")).alias("changed_count")],
        converged=lambda st: (st["changed_count"] or 0) == 0,
        max_iterations=max_iterations,
        resume=resume,
        stats_interval=stats_interval,
    )
    edges.unpersist()
    return LpaResult(
        labels=result.state.select("vid", "label"),
        ran_iterations=result.ran_iterations,
        did_converge=result.did_converge,
        metrics=result.metrics,
    )


def _label_propagation_async_serial(
    graph: Graph,
    max_iterations: int,
    seed_col: str | None,
    node_weight_col: str | None,
) -> LpaResult:
    """Exact replica of the reference's asynchronous compute step
    (ComputeStep.java:80-90, ComputeStepConsumer.tallyVotes:64-77):
    nodes processed in ascending id order, labels updated IN PLACE so
    later nodes in the same pass observe earlier updates; vote tally is
    max weight, ties to the smaller label; converged when a full pass
    changes nothing."""
    import numpy as np

    spark = graph.edges.sparkSession
    nodes = graph.nodes
    node_rows = nodes.orderBy("vid").collect()
    vids = [r["vid"] for r in node_rows]
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)

    if seed_col is not None:
        seeds = [r[seed_col] for r in node_rows]
        max_seed = max((s for s in seeds if s is not None), default=-1)
        labels = [
            s if s is not None else max_seed + v + 1 for s, v in zip(seeds, vids)
        ]
    else:
        labels = list(vids)
    if node_weight_col is not None:
        nw = [r[node_weight_col] if r[node_weight_col] is not None else 1.0 for r in node_rows]
    else:
        nw = [1.0] * n

    adj: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    for r in graph.edges.collect():
        adj[idx[r["src"]]].append((idx[r["dst"]], r["weight"]))

    ran = 0
    did_converge = False
    for it in range(max_iterations):
        changed = False
        for i in range(n):
            if not adj[i]:
                continue
            votes: dict[int, float] = {}
            for j, w in adj[i]:
                lbl = labels[j]
                votes[lbl] = votes.get(lbl, 0.0) + w * nw[j]
            best_label, best_w = labels[i], float("-inf")
            for lbl, w in votes.items():
                if w > best_w or (w == best_w and lbl < best_label):
                    best_w, best_label = w, lbl
            if best_label != labels[i]:
                labels[i] = best_label
                changed = True
        ran = it + 1
        if not changed:
            did_converge = True
            break

    out = spark.createDataFrame(
        [(v, int(l)) for v, l in zip(vids, labels)], "vid long, label long"
    )
    return LpaResult(labels=out, ran_iterations=ran, did_converge=did_converge, metrics=[])
