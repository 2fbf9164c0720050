"""Leiden fixtures transcribed from the reference
algo/src/test/java/org/neo4j/gds/leiden/LeidenTest.java:58-210
(8-node two-cluster UNDIRECTED graph; plain / seeded / partially-seeded /
negative-seed runs).

The reference asserts the exact two-community split {a0,a2,a3,a4} /
{a1,a5,a6,a7}; that partition is the unique modularity optimum here, so
membership is asserted exactly. Seeded runs must surface the ORIGINAL
seed labels as community ids (SeedCommunityManager round-trip,
LeidenTest.shouldWorkWithBestSeed:156 asserts keys {4000, 5000}).
"""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.leiden import leiden
from graph_data_science_spark.plans.graph import Graph, Orientation

# LeidenTest DB_CYPHER:58-83 — a0..a7
EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (2, 3), (2, 4), (3, 4),
    (1, 5), (1, 6), (1, 7), (5, 6), (5, 7), (6, 7),
]
OPTIMAL = {0: 5000, 1: 4000, 2: 5000, 3: 5000, 4: 5000,
           5: 4000, 6: 4000, 7: 4000}
PARTIAL = {0: 1, 1: 2, 2: 2, 4: 5, 5: 6, 6: 7, 7: 8}  # a3 unseeded


def _graph(spark) -> Graph:
    edges = spark.createDataFrame(
        [(u, v, 1.0) for u, v in EDGES], "src long, dst long, weight double"
    )
    nodes = spark.createDataFrame([(i,) for i in range(8)], "vid long")
    return Graph.from_edges(edges, nodes=nodes, orientation=Orientation.UNDIRECTED)


def _partition(df) -> set[frozenset]:
    comms: dict = {}
    for r in df.collect():
        comms.setdefault(r["community"], set()).add(r["vid"])
    return {frozenset(v) for v in comms.values()}


EXPECTED = {frozenset({0, 2, 3, 4}), frozenset({1, 5, 6, 7})}


def test_leiden_two_clusters(spark):
    """LeidenTest.leiden:86-118 — converges within 3 levels to the
    two-cluster partition."""
    res = leiden(_graph(spark), max_levels=3, random_seed=19)
    assert res.ran_levels <= 3
    assert res.did_converge
    assert _partition(res.communities) == EXPECTED
    assert res.modularity > 0


def test_leiden_seeded_optimal(spark):
    """LeidenTest.shouldWorkWithBestSeed:121-157 — optimal seeding
    converges in 1 level and the output ids ARE the seed labels."""
    g = _graph(spark)
    seed = g.edges.sparkSession.createDataFrame(
        list(OPTIMAL.items()), "vid long, seed long"
    )
    res = leiden(g, max_levels=3, random_seed=19, seed=seed)
    assert res.ran_levels == 1
    assert res.did_converge
    rows = {r["vid"]: r["community"] for r in res.communities.collect()}
    assert rows == OPTIMAL
    assert res.modularity > 0


def test_leiden_partial_seed(spark):
    """LeidenTest.shouldWorkWithMissingSeed:160-190 — missing seeds get
    fresh labels; the structural partition still lands on the optimum."""
    g = _graph(spark)
    seed = g.edges.sparkSession.createDataFrame(
        list(PARTIAL.items()), "vid long, seed long"
    )
    res = leiden(g, max_levels=3, random_seed=19, seed=seed)
    assert res.did_converge
    assert _partition(res.communities) == EXPECTED


def test_leiden_negative_seed_raises(spark):
    """LeidenTest.shouldThrowForNegativeSeed:193-211."""
    g = _graph(spark)
    seed = g.edges.sparkSession.createDataFrame(
        [(0, 1), (1, -1)], "vid long, seed long"
    )
    with pytest.raises(ValueError, match="non-negative"):
        leiden(g, max_levels=3, seed=seed)


def test_leiden_tolerance_stops_early(spark):
    """LeidenTest.shouldComplyWithTolerance:260-293 analogue: a huge
    tolerance stops after the modularity gain falls below it, and the
    reported modularity matches the kept level."""
    res = leiden(_graph(spark), max_levels=5, tolerance=10.0, random_seed=19)
    assert res.ran_levels <= 2
    assert res.modularities, "at least one level's modularity recorded"
    assert res.modularity == res.modularities[res.ran_levels - 1]


def test_leiden_clique_ring(spark):
    """5 cliques of 6 joined in a ring by single bridges — Leiden must
    recover the cliques (gamma=1 modularity optimum); deterministic
    across runs."""
    edges = []
    for c in range(5):
        ids = [c * 6 + i for i in range(6)]
        edges += [(u, v) for u in ids for v in ids if u < v]
        edges.append((c * 6, ((c + 1) % 5) * 6))
    g = Graph.from_edges(
        spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
        ),
        orientation=Orientation.UNDIRECTED,
    )
    res = leiden(g, random_seed=19)
    expected = {frozenset(range(c * 6, c * 6 + 6)) for c in range(5)}
    assert _partition(res.communities) == expected
    res2 = leiden(g, random_seed=19)
    assert _partition(res2.communities) == expected
