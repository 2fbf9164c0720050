"""Structured Streaming edge ingest + incremental graph maintenance.

The reference is batch-only (gds.*.stream = a result cursor, not a
stream — PageRankStreamProc.java:42-49), so this module is OUR
extension for the 100 TB deployment story: edges land continuously
(new commits to the code corpus), and the graph's derived state is
maintained incrementally instead of recomputed.

  - edge_stream / start_edge_ingest: readStream over an arriving-files
    directory → dedup within watermark → append to the edges table.
    File-source streaming scales to object stores; the same code runs
    against Kafka by swapping the reader.
  - streaming_degrees: continuously-updated degree aggregate
    (update output mode; partial aggregation handles the fan-in).
  - incremental_wcc: warm-started min-label propagation — previous
    component assignments seed the state, only newly-affected regions
    iterate (components only ever MERGE when edges are added, so the
    old assignment is a valid upper bound and convergence is fast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.operators.pregel import PregelEngine
from graph_data_science_spark.operators.wcc import WccResult, wcc
from graph_data_science_spark.plans.graph import Graph

EDGE_SCHEMA = "src long, dst long, weight double, event_time timestamp"


def edge_stream(spark: SparkSession, incoming_dir: str, watermark: str = "10 minutes") -> DataFrame:
    """Streaming DataFrame of arriving edges, deduped within the
    watermark (exactly-once-ish append against replayed files)."""
    return (
        spark.readStream.schema(EDGE_SCHEMA)
        .parquet(incoming_dir)
        .withWatermark("event_time", watermark)
        .dropDuplicates(["src", "dst", "event_time"])
    )


def start_edge_ingest(
    spark: SparkSession,
    incoming_dir: str,
    edges_table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Append arriving edges to the durable edge table. Returns the
    StreamingQuery (caller awaits/stops)."""
    stream = edge_stream(spark, incoming_dir)
    writer = (
        stream.select("src", "dst", "weight")
        .writeStream.format("parquet")
        .option("path", edges_table_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_degrees(
    spark: SparkSession,
    incoming_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuously-maintained out-degree table (in-memory sink, update
    mode) — the streaming analogue of degree centrality."""
    stream = edge_stream(spark, incoming_dir)
    agg = stream.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    writer = (
        agg.writeStream.format("memory")
        .queryName("streaming_degrees")
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("complete")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_wcc(
    graph: Graph,
    previous: DataFrame | None,
    engine: PregelEngine | None = None,
    max_iterations: int = 100,
) -> WccResult:
    """WCC warm-started from a previous assignment (vid, component).

    Edge additions only merge components, so the previous component id
    is a valid initial upper bound: comp0 = min(previous comp, vid).
    Unseen nodes start at their own vid. Typically converges in a few
    supersteps on incremental batches vs O(diameter) from scratch.
    """
    if previous is None:
        return wcc(graph, engine=engine, max_iterations=max_iterations)

    spark = graph.edges.sparkSession
    from graph_data_science_spark.plans.graph import Orientation

    edges = graph.edges
    if graph.orientation != Orientation.UNDIRECTED:
        edges = edges.select("src", "dst").unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:
        edges = edges.select("src", "dst")
    edges = edges.persist()
    edges_renamed = edges.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))

    prev = previous.select("vid", F.col("component").alias("prev_comp"))
    state0 = (
        graph.nodes.select("vid")
        .join(prev, "vid", "left")
        .select(
            "vid",
            F.least(F.coalesce("prev_comp", F.col("vid")), F.col("vid")).alias("comp"),
            F.lit(True).alias("changed"),
        )
    )

    def step(state, s):
        senders = state.filter(F.col("changed")).select(F.col("vid").alias("e_src"), "comp")
        msgs = (
            senders.join(edges_renamed, "e_src")
            .groupBy(F.col("e_dst").alias("vid"))
            .agg(F.min("comp").alias("min_nbr"))
        )
        joined = state.join(msgs, "vid", "left")
        new_comp = F.least(F.col("comp"), F.coalesce(F.col("min_nbr"), F.col("comp")))
        return joined.select(
            "vid", new_comp.alias("comp"), (new_comp < F.col("comp")).alias("changed")
        )

    eng = engine or PregelEngine(graph.edges.sparkSession)
    result = eng.run(
        initial_state=state0,
        step=step,
        stats_exprs=[F.sum(F.col("changed").cast("long")).alias("changed_count")],
        converged=lambda st: (st["changed_count"] or 0) == 0,
        max_iterations=max_iterations,
    )
    edges.unpersist()
    return WccResult(
        components=result.state.select("vid", F.col("comp").alias("component")),
        ran_iterations=result.ran_iterations,
        did_converge=result.did_converge,
        metrics=result.metrics,
    )
