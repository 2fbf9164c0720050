import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.modularity import (
    conductance,
    modularity,
    total_modularity,
)
from graph_data_science_spark.plans.graph import Graph


@pytest.fixture(scope="module")
def two_cliques(spark):
    # two triangles {0,1,2} and {3,4,5} joined by one bridge 2-3
    rows = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    edges = spark.createDataFrame([(a, b, 1.0) for a, b in rows],
                                  "src long, dst long, weight double")
    return Graph.from_edges(edges)


@pytest.fixture(scope="module")
def good_communities(spark):
    return spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "vid long, community long"
    )


def test_modularity_matches_hand_computation(spark, two_cliques, good_communities):
    # m=7; per community: e_C=3, d_C = 3*2+1 = 7 -> 3/7 - (7/14)^2 = 3/7 - 0.25
    got = {r["community"]: r["modularity"] for r in
           modularity(two_cliques, good_communities).collect()}
    expected = 3 / 7 - 0.25
    assert got[0] == pytest.approx(expected, abs=1e-12)
    assert got[1] == pytest.approx(expected, abs=1e-12)
    assert total_modularity(two_cliques, good_communities) == pytest.approx(2 * expected)


def test_good_partition_beats_bad(spark, two_cliques, good_communities):
    bad = spark.createDataFrame(
        [(i, i % 2) for i in range(6)], "vid long, community long"
    )
    assert total_modularity(two_cliques, good_communities) > total_modularity(two_cliques, bad)


def test_single_community_modularity_zero(spark, two_cliques):
    one = spark.createDataFrame([(i, 7) for i in range(6)], "vid long, community long")
    assert total_modularity(two_cliques, one) == pytest.approx(0.0, abs=1e-12)


def test_conductance(spark, two_cliques, good_communities):
    got = {r["community"]: r["conductance"] for r in
           conductance(two_cliques, good_communities).collect()}
    # per community: internal edges 3 (counted once per endpoint view -> 6
    # halves), external 1 bridge -> conductance = 1 / (6 + 1)
    assert got[0] == pytest.approx(1 / 7, abs=1e-12)
    assert got[1] == pytest.approx(1 / 7, abs=1e-12)
