import math

import pytest

from graph_data_science_spark.operators.paths import bfs, sssp, topological_sort
from graph_data_science_spark.plans.graph import Graph

INF = float("inf")


@pytest.fixture(scope="module")
def path_graph(spark):
    # 0 ->1(w1) ->2(w2); 0->2 (w10); 3 isolated; 2->4(w1)
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 10.0), (2, 4, 1.0)],
        "src long, dst long, weight double",
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], "vid long")
    return Graph.from_edges(edges, nodes=nodes)


def test_bfs_levels(spark, path_graph):
    got = {r["vid"]: r["distance"] for r in bfs(path_graph, [0]).distances.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 1.0, 3: INF, 4: 2.0}


def test_sssp_weighted(spark, path_graph):
    got = {r["vid"]: r["distance"] for r in sssp(path_graph, [0]).distances.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 3.0, 3: INF, 4: 4.0}  # 0->1->2 beats 0->2


def test_sssp_multi_source(spark, path_graph):
    got = {r["vid"]: r["distance"] for r in sssp(path_graph, [0, 3]).distances.collect()}
    assert got[3] == 0.0


def test_topological_sort(spark):
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges)
    got = {r["vid"]: r["layer"] for r in topological_sort(g).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_topological_sort_cycle_nulls(spark):
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 1, 1.0)], "src long, dst long, weight double"
    )
    g = Graph.from_edges(edges)
    got = {r["vid"]: r["layer"] for r in topological_sort(g).collect()}
    assert got[0] == 0
    assert got[1] is None and got[2] is None


def test_topological_sort_deep_chain(spark):
    # 400-layer chain: the engine-backed peeling must complete with
    # bounded lineage (the old driver loop leaked one cache per layer)
    from graph_data_science_spark.operators.paths import topological_sort
    from graph_data_science_spark.plans.graph import Graph

    n = 400
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], "src long, dst long, weight double"
    )
    g = Graph.from_edges(edges)
    out = {r["vid"]: r["layer"] for r in topological_sort(g, max_iterations=n + 5).collect()}
    assert out == {i: i for i in range(n)}


def test_longest_path_weighted_fixture(spark):
    """WeightedDagLongestPathTest.basicWeightedLongestPath: n3-8->n0,
    n0-8->n1, n0-5->n2, n2-2->n1 => n1's longest is 16 via [3,0,1]."""
    from graph_data_science_spark.operators.paths import longest_path

    edges = spark.createDataFrame(
        [(0, 1, 8.0), (0, 2, 5.0), (2, 1, 2.0), (3, 0, 8.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges)
    rows = {r["target_node"]: r for r in longest_path(g).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[3]["total_cost"] == 0.0 and rows[3]["node_ids"] == [3]
    assert rows[0]["total_cost"] == 8.0 and rows[0]["node_ids"] == [3, 0]
    assert rows[1]["total_cost"] == 16.0 and rows[1]["node_ids"] == [3, 0, 1]
    assert rows[2]["total_cost"] == 13.0 and rows[2]["node_ids"] == [3, 0, 2]
    assert all(r["source_node"] == 3 for r in rows.values())
    assert rows[1]["costs"] == [0.0, 8.0, 16.0]


def test_longest_path_skips_cycles_and_breaks_ties_to_min_parent(spark):
    from graph_data_science_spark.operators.paths import longest_path

    edges = spark.createDataFrame(
        # two sources 0 and 1 both reach 2 at equal cost -> parent tie -> 0
        # 3<->4 is a cycle: no path rows for 3, 4
        [(0, 2, 1.0), (1, 2, 1.0), (3, 4, 1.0), (4, 3, 1.0), (2, 5, 2.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges)
    rows = {r["target_node"]: r for r in longest_path(g).collect()}
    assert set(rows) == {0, 1, 2, 5}
    assert rows[2]["node_ids"] == [0, 2] and rows[2]["total_cost"] == 1.0
    assert rows[5]["node_ids"] == [0, 2, 5] and rows[5]["total_cost"] == 3.0


def test_all_shortest_paths_stream(spark):
    """MSBFSAllShortestPathsTest intent: every reachable pair with hop
    distance; batching must not change the result."""
    from graph_data_science_spark.operators.paths import all_shortest_paths_stream

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (4, 4, 1.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges)
    rows = {(r["source_node"], r["target_node"]): r["distance"]
            for r in all_shortest_paths_stream(g, batch_size=2).collect()}
    assert rows[(0, 3)] == 3.0 and rows[(0, 0)] == 0.0 and rows[(1, 2)] == 1.0
    assert (3, 0) not in rows  # directed
    one_batch = {(r["source_node"], r["target_node"]): r["distance"]
                 for r in all_shortest_paths_stream(g, batch_size=64).collect()}
    assert rows == one_batch
