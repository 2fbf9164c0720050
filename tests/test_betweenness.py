"""Betweenness fixtures transcribed from the reference
algo/src/test/java/org/neo4j/gds/betweenness/BetweennessCentralityTest.java
:50-133 (LINE / CYCLE / DIAMOND / CLIQUE_5 / CONNECTED_CYCLES with exact
expected maps; undirected diamond checks the divide-by-2)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.betweenness import betweenness
from graph_data_science_spark.plans.graph import Graph, Orientation


def _graph(spark, edges, n, orientation=Orientation.NATURAL):
    e = spark.createDataFrame([(a, b, 1.0) for a, b in edges],
                              "src long, dst long, weight double")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    return Graph.from_edges(e, nodes=nodes, orientation=orientation)


def _scores(res):
    return {r["vid"]: r["score"] for r in res.scores.collect()}


def test_betweenness_line(spark):
    # a-b-c-d-e directed line: expected a0 b3 c4 d3 e0
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)], 5)
    assert _scores(betweenness(g)) == {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}


def test_betweenness_cycle(spark):
    g = _graph(spark, [(0, 1), (1, 2), (2, 0)], 3)
    assert _scores(betweenness(g)) == {0: 1.0, 1: 1.0, 2: 1.0}


def test_betweenness_diamond_directed(spark):
    # a1=0 a2=1 b=2 c=3 d=4 e=5 f=6
    edges = [(0, 2), (1, 2), (2, 3), (2, 4), (3, 5), (4, 5), (5, 6)]
    g = _graph(spark, edges, 7)
    assert _scores(betweenness(g)) == {
        0: 0.0, 1: 0.0, 2: 8.0, 3: 3.0, 4: 3.0, 5: 5.0, 6: 0.0
    }


def test_betweenness_diamond_undirected(spark):
    edges = [(0, 2), (1, 2), (2, 3), (2, 4), (3, 5), (4, 5), (5, 6)]
    g = _graph(spark, edges, 7, orientation=Orientation.UNDIRECTED)
    got = _scores(betweenness(g))
    exp = {0: 0.0, 1: 0.0, 2: 9.5, 3: 3.0, 4: 3.0, 5: 5.5, 6: 0.0}
    for k in exp:
        assert got[k] == pytest.approx(exp[k])


def test_betweenness_clique5_zero(spark):
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    g = _graph(spark, edges, 5)
    assert all(v == 0.0 for v in _scores(betweenness(g)).values())


def test_betweenness_connected_cycles(spark):
    # a=0 b=1 c=2 / d=3 e=4 f=5, a<->d
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3), (3, 0)]
    g = _graph(spark, edges, 6)
    assert _scores(betweenness(g)) == {
        0: 13.0, 1: 4.0, 2: 4.0, 3: 13.0, 4: 4.0, 5: 4.0
    }


def test_betweenness_sampling_subset(spark):
    # sampled contributions are a partial, unrescaled sum -> bounded above
    # by the exact score
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)], 5)
    exact = _scores(betweenness(g))
    sampled = _scores(betweenness(g, sampling_size=2, seed=1))
    for vid in exact:
        assert sampled[vid] <= exact[vid] + 1e-9


def test_betweenness_batching_invariant(spark):
    # batch_size smaller than the source count must not change results
    edges = [(0, 2), (1, 2), (2, 3), (2, 4), (3, 5), (4, 5), (5, 6)]
    g = _graph(spark, edges, 7)
    full = _scores(betweenness(g))
    batched = _scores(betweenness(g, batch_size=3))
    for vid in full:
        assert batched[vid] == pytest.approx(full[vid])
