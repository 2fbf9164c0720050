import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.closeness import (
    closeness_centrality,
    harmonic_centrality,
    multi_source_hop_distances,
)
from graph_data_science_spark.plans.graph import Graph

INF = float("inf")


@pytest.fixture(scope="module")
def path4(spark):
    # path 0->1->2->3 (directed)
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    nodes = spark.createDataFrame([(i,) for i in range(4)], "vid long")
    return Graph.from_edges(edges, nodes=nodes)


def test_multi_source_distances_forward(spark, path4):
    d = {r["vid"]: list(r["dists"]) for r in
         multi_source_hop_distances(path4, [0, 2], reverse=False).collect()}
    assert d[0] == [0.0, INF]
    assert d[1] == [1.0, INF]
    assert d[2] == [2.0, 0.0]
    assert d[3] == [3.0, 1.0]


def test_multi_source_distances_reverse(spark, path4):
    # distance FROM v TO pivot (reverse=True)
    d = {r["vid"]: list(r["dists"]) for r in
         multi_source_hop_distances(path4, [3]).collect()}
    assert d[0] == [3.0]
    assert d[3] == [0.0]


def test_harmonic_full_sample_exact(spark, path4):
    # sample_size >= n -> exact harmonic (normalized by k = n)
    res = harmonic_centrality(path4, sample_size=4, seed=1)
    got = {r["vid"]: r["score"] for r in res.scores.collect()}
    # node 0 reaches pivots 1,2,3 at distances 1,2,3 -> (1+1/2+1/3)/4
    assert got[0] == pytest.approx((1 + 1 / 2 + 1 / 3) / 4, abs=1e-12)
    assert got[3] == pytest.approx(0.0)  # sink of the chain reaches nobody


def test_closeness_full_sample(spark, path4):
    res = closeness_centrality(path4, sample_size=4, seed=1)
    got = {r["vid"]: r["score"] for r in res.scores.collect()}
    # node 0: distances to others = 1,2,3 -> 3 / 6
    assert got[0] == pytest.approx(0.5, abs=1e-12)
    assert got[3] == pytest.approx(0.0)


def test_sampling_deterministic(spark, path4):
    a = harmonic_centrality(path4, sample_size=2, seed=42).pivots
    b = harmonic_centrality(path4, sample_size=2, seed=42).pivots
    assert a == b
