"""K1Coloring tests — reference semantics: a valid (or near-valid after
maxIterations) coloring where no two adjacent nodes share a color
(algo/src/test/java/org/neo4j/gds/k1coloring/K1ColoringTest.java)."""

from pyspark.sql import functions as F

from graph_data_science_spark.operators.k1coloring import k1_coloring
from graph_data_science_spark.plans.graph import Graph, Orientation


def _conflicts(g: Graph, colors) -> int:
    c_src = colors.select(F.col("vid").alias("src"), F.col("color").alias("c_src"))
    c_dst = colors.select(F.col("vid").alias("dst"), F.col("color").alias("c_dst"))
    return (
        g.edges.filter(F.col("src") != F.col("dst"))
        .join(c_src, "src")
        .join(c_dst, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .count()
    )


def test_k1_coloring_path_graph(spark):
    # 0-1-2-3-4 path: 2 colors suffice, coloring must be conflict-free
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(4)], "src long, dst long, weight double"
    )
    g = Graph.from_edges(edges, orientation=Orientation.UNDIRECTED)
    res = k1_coloring(g)
    assert res.did_converge
    assert _conflicts(g, res.colors) == 0


def test_k1_coloring_clique(spark):
    # K5: needs 5 distinct colors
    edges = spark.createDataFrame(
        [(i, j, 1.0) for i in range(5) for j in range(i + 1, 5)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges, orientation=Orientation.UNDIRECTED)
    res = k1_coloring(g)
    assert res.did_converge
    assert _conflicts(g, res.colors) == 0
    assert res.colors.select("color").distinct().count() == 5


def test_k1_coloring_random(spark):
    from graph_data_science_spark.sources.generator import random_graph

    g = random_graph(spark, 500, 6, seed=11).to_undirected()
    res = k1_coloring(g, max_iterations=10)
    assert res.did_converge
    assert _conflicts(g, res.colors) == 0
    # every node colored exactly once
    assert res.colors.count() == 500
