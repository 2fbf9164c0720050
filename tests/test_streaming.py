"""Structured Streaming ingest + incremental WCC."""

import os
import time

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.streaming.ingest import (
    incremental_wcc,
    start_edge_ingest,
    streaming_degrees,
)


def _write_edge_batch(spark, path, rows):
    df = spark.createDataFrame(
        [(s, d, 1.0) for s, d in rows], "src long, dst long, weight double"
    ).withColumn("event_time", F.current_timestamp())
    df.coalesce(1).write.mode("append").parquet(path)


def test_file_stream_ingest(spark, tmp_path):
    incoming = str(tmp_path / "incoming")
    table = str(tmp_path / "edges_table")
    ckpt = str(tmp_path / "ckpt")
    _write_edge_batch(spark, incoming, [(0, 1), (1, 2)])
    q = start_edge_ingest(spark, incoming, table, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(table)
    assert got.count() == 2
    assert set(got.columns) == {"src", "dst", "weight"}

    # second batch lands, restarted availableNow query picks up only new files
    _write_edge_batch(spark, incoming, [(2, 3)])
    q2 = start_edge_ingest(spark, incoming, table, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(table).count() == 3


def test_streaming_degrees(spark, tmp_path):
    incoming = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    _write_edge_batch(spark, incoming, [(0, 1), (0, 2), (5, 1)])
    q = streaming_degrees(spark, incoming, ckpt)
    q.awaitTermination(120)
    got = {r["src"]: r["degree"] for r in spark.sql("SELECT * FROM streaming_degrees").collect()}
    assert got == {0: 2, 5: 1}


def test_incremental_wcc_merges_components(spark):
    e1 = spark.createDataFrame([(0, 1, 1.0), (2, 3, 1.0)], "src long, dst long, weight double")
    g1 = Graph.from_edges(e1)
    first = incremental_wcc(g1, previous=None)
    comps1 = {r["vid"]: r["component"] for r in first.components.collect()}
    assert comps1 == {0: 0, 1: 0, 2: 2, 3: 2}

    # new edge 1-2 merges the components; warm start from previous state
    e2 = e1.unionByName(
        spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double")
    )
    g2 = Graph.from_edges(e2)
    second = incremental_wcc(g2, previous=first.components)
    comps2 = {r["vid"]: r["component"] for r in second.components.collect()}
    assert comps2 == {0: 0, 1: 0, 2: 0, 3: 0}
    # warm start converges at least as fast as cold
    cold = incremental_wcc(g2, previous=None)
    assert second.ran_iterations <= cold.ran_iterations


def test_incremental_wcc_new_nodes(spark):
    e1 = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    first = incremental_wcc(Graph.from_edges(e1), previous=None)
    e2 = e1.unionByName(
        spark.createDataFrame([(7, 8, 1.0)], "src long, dst long, weight double")
    )
    second = incremental_wcc(Graph.from_edges(e2), previous=first.components)
    comps = {r["vid"]: r["component"] for r in second.components.collect()}
    assert comps == {0: 0, 1: 0, 7: 7, 8: 7}
