import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.sources.sampling import random_walks, sample_rwr
from tests.fixtures import pagerank_graph


def test_random_walks_follow_edges(spark):
    g = pagerank_graph(spark)
    edge_set = {(r["src"], r["dst"]) for r in g.edges.collect()}
    walks = random_walks(g, walks_per_node=2, walk_length=4, seed=42).collect()
    assert len(walks) == 11 * 2
    for r in walks:
        path = r["path"]
        assert path[0] == r["start"]
        for a, b in zip(path, path[1:]):
            assert (a, b) in edge_set


def test_random_walks_deterministic(spark):
    g = pagerank_graph(spark)
    a = sorted((r["walk_id"], tuple(r["path"])) for r in
               random_walks(g, 1, 5, seed=42).collect())
    b = sorted((r["walk_id"], tuple(r["path"])) for r in
               random_walks(g, 1, 5, seed=42).collect())
    assert a == b
    c = sorted((r["walk_id"], tuple(r["path"])) for r in
               random_walks(g, 1, 5, seed=43).collect())
    assert a != c


def test_walks_stop_at_sinks(spark):
    edges = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    g = Graph.from_edges(edges)
    walks = {r["start"]: r["path"] for r in random_walks(g, 1, 3).collect()}
    assert walks[0] == [0, 1]  # stops at sink 1
    assert walks[1] == [1]


def test_sample_rwr_induced_subgraph(spark):
    g = pagerank_graph(spark)
    starts = spark.createDataFrame([(4,)], "vid long")  # node e
    sub = sample_rwr(g, starts, restart_probability=0.2, walk_length=8, walks_per_node=4)
    sub_nodes = {r["vid"] for r in sub.nodes.collect()}
    assert 4 in sub_nodes
    assert 0 < len(sub_nodes) <= 11
    # induced edges only among sampled nodes
    for r in sub.edges.collect():
        assert r["src"] in sub_nodes and r["dst"] in sub_nodes
