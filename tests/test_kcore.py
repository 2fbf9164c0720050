import pytest

from graph_data_science_spark.operators.kcore import k_core_decomposition, k_core_subgraph
from graph_data_science_spark.plans.graph import Graph
from tests.fixtures import clique5_graph, line_graph


def cores_dict(res):
    return {r["vid"]: r["core"] for r in res.cores.collect()}


def test_clique5_coreness(spark):
    res = k_core_decomposition(clique5_graph(spark))
    assert cores_dict(res) == {v: 4 for v in range(5)}
    assert res.did_converge


def test_line_coreness(spark):
    res = k_core_decomposition(line_graph(spark))
    assert cores_dict(res) == {0: 1, 1: 1, 2: 1}


def test_triangle_with_tail(spark):
    # triangle 0-1-2 plus tail 2-3: triangle nodes core 2, tail core 1
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges)
    res = k_core_decomposition(g)
    assert cores_dict(res) == {0: 2, 1: 2, 2: 2, 3: 1}


def test_k_core_subgraph(spark):
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges)
    sub = k_core_subgraph(g, 2)
    assert {r["vid"] for r in sub.nodes.collect()} == {0, 1, 2}
    assert sub.edges.count() == 3
