"""HITS (hubs & authorities) — gds.hits parity.

Reference: the reference ships HITS as a Pregel computation
(alpha/.../HitsComputation via `gds.alpha.hits.*`, listed in
OpenGdsProcedureSmokeTest.java). Semantics: iterate
    auth(v) = Σ_{u→v} hub(u);   hub(u) = Σ_{u→v} auth(v)
with global L2 normalization of each vector per iteration
(masterCompute), until max change <= tolerance or hitsIterations.

Spark plan per iteration: two gather joins (one per direction) against
the pre-partitioned cached edge table + two global L2 aggregates
(driver-side masterCompute, like the reference).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.pregel import PregelEngine
from graph_data_science_spark.plans.graph import Graph


@dataclass
class HitsResult:
    scores: DataFrame  # (vid, hub, authority)
    ran_iterations: int
    did_converge: bool
    metrics: list[dict[str, Any]] = field(default_factory=list)


def hits(
    graph: Graph,
    hits_iterations: int = 20,
    tolerance: float = 1e-7,
    engine: PregelEngine | None = None,
) -> HitsResult:
    spark = graph.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        graph.edges.select("src", "dst")
        .repartition(n_part, "src")
        .sortWithinPartitions("src")
        .persist()
    )

    state0 = graph.nodes.select(
        "vid", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"),
        F.lit(float("inf")).alias("delta"),
    )

    # The two in-step norm aggregates force a materialization each; cut
    # the logical plan there too (cut_lineage) — the step references
    # `state` three times through joins, so without an in-step cut the
    # plan grows 3^k between the engine's checkpoint_interval
    # truncations (measured ~6 s/superstep of driver analysis on a
    # 1600-node graph; bounded plans run the same superstep in ~1 s).
    from graph_data_science_spark.plans.lineage import cut_lineage

    def step(state: DataFrame, s: int) -> DataFrame:
        hubs = state.select(F.col("vid").alias("src"), F.col("hub").alias("h"))
        auth_raw = (
            edges.join(hubs, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("h").alias("auth_raw"))
        )
        with_auth = cut_lineage(
            state.join(auth_raw, "vid", "left").withColumn(
                "auth_raw", F.coalesce("auth_raw", F.lit(0.0))
            )
        )
        # masterCompute: L2 normalize authorities
        a_norm = with_auth.agg(
            F.sqrt(F.sum(F.col("auth_raw") * F.col("auth_raw")))
        ).collect()[0][0] or 1.0
        with_auth = with_auth.withColumn("auth_new", F.col("auth_raw") / F.lit(a_norm))

        auths = with_auth.select(F.col("vid").alias("dst"), F.col("auth_new").alias("a"))
        hub_raw = (
            edges.join(auths, "dst")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.sum("a").alias("hub_raw"))
        )
        combined = cut_lineage(
            with_auth.join(hub_raw, "vid", "left").withColumn(
                "hub_raw", F.coalesce("hub_raw", F.lit(0.0))
            )
        )
        h_norm = combined.agg(
            F.sqrt(F.sum(F.col("hub_raw") * F.col("hub_raw")))
        ).collect()[0][0] or 1.0
        return combined.select(
            "vid",
            (F.col("hub_raw") / F.lit(h_norm)).alias("hub"),
            F.col("auth_new").alias("auth"),
            F.greatest(
                F.abs(F.col("hub_raw") / F.lit(h_norm) - F.col("hub")),
                F.abs(F.col("auth_new") - F.col("auth")),
            ).alias("delta"),
        )

    eng = engine or PregelEngine(spark)
    result = eng.run(
        initial_state=state0,
        step=step,
        stats_exprs=[F.max("delta").alias("max_delta")],
        converged=lambda st: (st["max_delta"] or 0.0) <= tolerance,
        max_iterations=hits_iterations,
    )
    edges.unpersist()
    return HitsResult(
        scores=result.state.select("vid", "hub", F.col("auth").alias("authority")),
        ran_iterations=result.ran_iterations,
        did_converge=result.did_converge,
        metrics=result.metrics,
    )
