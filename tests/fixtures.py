"""Graph fixtures transcribed 1:1 from the reference's unit tests.

See FIXTURES.md. Expected values are quoted from the reference test
sources (cited per fixture)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from graph_data_science_spark.plans.graph import Graph, Orientation

# ---------------------------------------------------------------------------
# B1. PageRank Wikipedia example graph
# algo/src/test/java/org/neo4j/gds/pagerank/PageRankTest.java:68-99
# nodes a..k -> vids 0..10
# ---------------------------------------------------------------------------
_PR_NAMES = "abcdefghijk"
PR_EDGES = [
    ("b", "c"), ("c", "b"), ("d", "a"), ("d", "b"), ("e", "b"), ("e", "d"),
    ("e", "f"), ("f", "b"), ("f", "e"), ("g", "b"), ("g", "e"), ("h", "b"),
    ("h", "e"), ("i", "b"), ("i", "e"), ("j", "e"), ("k", "e"),
]
PR_EXPECTED = {
    "a": 0.3040965, "b": 3.5604297, "c": 3.1757906, "d": 0.3625935,
    "e": 0.7503465, "f": 0.3625935, "g": 0.15, "h": 0.15, "i": 0.15,
    "j": 0.15, "k": 0.15,
}
PR_EXPECTED_PERSONALIZED_AE = {
    "a": 0.17053529152163158, "b": 0.3216114449911402, "c": 0.27329311398643763,
    "d": 0.048318333106500536, "e": 0.17053529152163158, "f": 0.048318333106500536,
    "g": 0.0, "h": 0.0, "i": 0.0, "j": 0.0, "k": 0.0,
}
PR_EXPECTED_PERSONALIZED_KB = {
    "a": 0.017454997930076894, "b": 0.813246950528992, "c": 0.690991752640184,
    "d": 0.041070583050331164, "e": 0.1449550029964717, "f": 0.041070583050331164,
    "g": 0.0, "h": 0.0, "i": 0.0, "j": 0.0, "k": 0.15000000000000002,
}


def vid(name: str) -> int:
    return _PR_NAMES.index(name)


def pagerank_graph(spark: SparkSession) -> Graph:
    rows = [(vid(s), vid(d), 1.0) for s, d in PR_EDGES]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    nodes = spark.createDataFrame([(i,) for i in range(11)], "vid long")
    return Graph.from_edges(edges, nodes=nodes)


# ---------------------------------------------------------------------------
# B2. WCC — 16 disjoint chains of 10 nodes
# algo/src/test/java/org/neo4j/gds/wcc/WccTest.java:63-91
# ---------------------------------------------------------------------------
WCC_SETS_COUNT = 16
WCC_SET_SIZE = 10


def wcc_chain_graph(spark: SparkSession) -> Graph:
    rows = []
    for c in range(WCC_SETS_COUNT):
        base = c * WCC_SET_SIZE
        for i in range(WCC_SET_SIZE - 1):
            rows.append((base + i, base + i + 1, 1.0))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    nodes = spark.createDataFrame(
        [(i,) for i in range(WCC_SETS_COUNT * WCC_SET_SIZE)], "vid long"
    )
    return Graph.from_edges(edges, nodes=nodes)


# ---------------------------------------------------------------------------
# B3. LPA — 6-node FOLLOW graph
# algo/src/test/java/org/neo4j/gds/labelpropagation/LabelPropagationTest.java:66-135
# vids: 0 Alice(seed 2), 1 Bridget(3), 2 Charles(4), 3 Doug(3), 4 Mark(4),
#       5 Michael(2)
# ---------------------------------------------------------------------------
LPA_EDGES = [(0, 1), (0, 2), (4, 3), (1, 5), (3, 4), (5, 0), (0, 5), (1, 0), (5, 1), (2, 3)]
LPA_SEEDS = {0: 2, 1: 3, 2: 4, 3: 3, 4: 4, 5: 2}
LPA_EXPECTED_UNSEEDED = {0: 1, 1: 1, 2: 3, 3: 4, 4: 4, 5: 1}
LPA_EXPECTED_SEEDED = {0: 2, 1: 2, 2: 3, 3: 4, 4: 4, 5: 2}


def lpa_graph(spark: SparkSession, with_seeds: bool = False) -> Graph:
    edges = spark.createDataFrame(
        [(s, d, 1.0) for s, d in LPA_EDGES], "src long, dst long, weight double"
    )
    if with_seeds:
        nodes = spark.createDataFrame(
            [(v, s) for v, s in LPA_SEEDS.items()], "vid long, seed long"
        )
    else:
        nodes = spark.createDataFrame([(i,) for i in range(6)], "vid long")
    return Graph.from_edges(edges, nodes=nodes)


# ---------------------------------------------------------------------------
# B4. Triangles
# algo/src/test/java/org/neo4j/gds/triangle/IntersectingTriangleCountTest.java:44-143
# ---------------------------------------------------------------------------
def line_graph(spark: SparkSession) -> Graph:
    edges = spark.createDataFrame([(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double")
    return Graph.from_edges(edges, orientation=Orientation.UNDIRECTED)


def clique5_graph(spark: SparkSession) -> Graph:
    rows = [(a, b, 1.0) for a in range(5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph.from_edges(edges, orientation=Orientation.UNDIRECTED)


def adjacent_triangles_graph(spark: SparkSession) -> Graph:
    # a=0,b=1,c=2,d=3,e=4 : triangles a-b-c and a-d-e
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 3, 1.0), (3, 4, 1.0), (4, 0, 1.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph.from_edges(edges, orientation=Orientation.UNDIRECTED)
