"""Graph data model: orientations, aggregation, filtering, degrees
(SURVEY.md §1; Aggregation.java:30-100, Orientation.java:27-46)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Aggregation, Graph, Orientation


@pytest.fixture()
def multi_edges(spark):
    # parallel edges 0->1 (x3 with weights 1,2,3), 1->2 (x1 weight 5)
    return spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 2.0), (0, 1, 3.0), (1, 2, 5.0)],
        "src long, dst long, weight double",
    )


@pytest.mark.parametrize(
    "agg,expected",
    [
        (Aggregation.SUM, 6.0),
        (Aggregation.MIN, 1.0),
        (Aggregation.MAX, 3.0),
        (Aggregation.COUNT, 3.0),
    ],
)
def test_parallel_edge_aggregation(spark, multi_edges, agg, expected):
    g = Graph.from_edges(multi_edges, aggregation=agg)
    w = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert w[(0, 1)] == expected
    assert g.edges.count() == 2


def test_aggregation_none_keeps_parallel_edges(spark, multi_edges):
    g = Graph.from_edges(multi_edges, aggregation=Aggregation.NONE)
    assert g.edges.count() == 4


def test_undirected_stores_both_directions(spark, multi_edges):
    g = Graph.from_edges(multi_edges, aggregation=Aggregation.SUM,
                         orientation=Orientation.UNDIRECTED)
    pairs = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert (0, 1) in pairs and (1, 0) in pairs


def test_reverse_view(spark, multi_edges):
    g = Graph.from_edges(multi_edges, aggregation=Aggregation.SUM)
    rev = g.reverse()
    pairs = {(r["src"], r["dst"]) for r in rev.edges.collect()}
    assert pairs == {(1, 0), (2, 1)}


def test_to_undirected(spark, multi_edges):
    g = Graph.from_edges(multi_edges, aggregation=Aggregation.SUM)
    und = g.to_undirected(Aggregation.SUM)
    assert und.orientation == Orientation.UNDIRECTED
    pairs = {(r["src"], r["dst"]) for r in und.edges.collect()}
    assert pairs == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_filter_nodes_semijoins_edges(spark):
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    nodes = spark.createDataFrame([(i, i % 2) for i in range(4)], "vid long, flag long")
    g = Graph.from_edges(edges, nodes=nodes)
    sub = g.filter_nodes(F.col("vid") <= 2)
    assert sub.node_count() == 3
    pairs = {(r["src"], r["dst"]) for r in sub.edges.collect()}
    assert pairs == {(0, 1), (1, 2)}


def test_filter_edges_expression(spark, multi_edges):
    g = Graph.from_edges(multi_edges)
    sub = g.filter_edges("weight > 2.0")
    assert sub.edges.count() == 2  # weights 3.0 and 5.0


def test_degrees(spark, multi_edges):
    g = Graph.from_edges(multi_edges, aggregation=Aggregation.SUM)
    out_deg = {r["vid"]: r["degree"] for r in g.degrees().collect()}
    assert out_deg == {0: 1.0, 1: 1.0, 2: 0.0}
    in_deg = {r["vid"]: r["degree"] for r in g.degrees(direction="in").collect()}
    assert in_deg == {0: 0.0, 1: 1.0, 2: 1.0}
    w_deg = {r["vid"]: r["degree"] for r in g.degrees(weighted=True).collect()}
    assert w_deg == {0: 6.0, 1: 5.0, 2: 0.0}


def test_weighted_degree_positive_only(spark):
    # DegreeCentrality.java:132-133 — negative weights excluded
    edges = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, -5.0)], "src long, dst long, weight double"
    )
    g = Graph.from_edges(edges)
    w_deg = {r["vid"]: r["degree"] for r in g.degrees(weighted=True).collect()}
    assert w_deg[0] == 2.0
