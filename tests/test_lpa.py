"""LPA parity vs algo/src/test/java/org/neo4j/gds/labelpropagation/LabelPropagationTest.java."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.lpa import label_propagation
from graph_data_science_spark.plans.graph import Graph
from tests.fixtures import LPA_EXPECTED_SEEDED, LPA_EXPECTED_UNSEEDED, lpa_graph


def labels_dict(result):
    return {r["vid"]: r["label"] for r in result.labels.collect()}


def test_unseeded(spark):
    # LabelPropagationTest.java:101-112 — [1, 1, 3, 4, 4, 1].
    # The reference result is ONE asynchronous in-place pass
    # (maxIterations=1 in the test); async_serial replicates it exactly.
    g = lpa_graph(spark)
    res = label_propagation(g, max_iterations=1, mode="async_serial")
    assert labels_dict(res) == LPA_EXPECTED_UNSEEDED


def test_sync_mode_is_deterministic(spark):
    g = lpa_graph(spark)
    a = labels_dict(label_propagation(g, max_iterations=10))
    b = labels_dict(label_propagation(g, max_iterations=10))
    assert a == b


def test_seeded(spark):
    # LabelPropagationTest.java:124-134 — [2, 2, 3, 4, 4, 2]
    g = lpa_graph(spark, with_seeds=True)
    res = label_propagation(g, max_iterations=1, seed_col="seed", mode="async_serial")
    assert labels_dict(res) == LPA_EXPECTED_SEEDED


def test_tie_breaks_to_smaller_label(spark):
    # ComputeStepConsumer.java:64-77: equal vote mass -> smaller label wins.
    # node 0 has out-edges to 1 and 2 with equal weight
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "vid long")
    g = Graph.from_edges(edges, nodes=nodes)
    res = label_propagation(g, max_iterations=5)
    assert labels_dict(res)[0] == 1


def test_weighted_votes(spark):
    # heavier edge dominates the vote
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 5.0)], "src long, dst long, weight double"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "vid long")
    g = Graph.from_edges(edges, nodes=nodes)
    res = label_propagation(g, max_iterations=5)
    assert labels_dict(res)[0] == 2


def test_node_weight_property(spark):
    # votes[label(nbr)] += relWeight × nodeWeight(nbr)
    # (LabelPropagation.java:82-89)
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    nodes = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 10.0)], "vid long, w double"
    )
    g = Graph.from_edges(edges, nodes=nodes)
    res = label_propagation(g, max_iterations=5, node_weight_col="w")
    assert labels_dict(res)[0] == 2


def test_no_out_neighbors_keeps_label(spark):
    edges = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    nodes = spark.createDataFrame([(0,), (1,), (7,)], "vid long")
    g = Graph.from_edges(edges, nodes=nodes)
    res = label_propagation(g, max_iterations=3)
    got = labels_dict(res)
    assert got[7] == 7  # isolated keeps own label
    assert got[1] == 1  # sink keeps own label
    assert got[0] == 1  # adopts its only out-neighbor's label
