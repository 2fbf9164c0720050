"""GraphCatalog + gds-style facade (project/list/exists/drop/filter,
stream/stats/mutate modes)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.api import Algo
from graph_data_science_spark.plans.catalog import GraphCatalog
from graph_data_science_spark.plans.graph import Graph
from tests.fixtures import clique5_graph, pagerank_graph


@pytest.fixture()
def catalog(spark, tmp_path):
    return GraphCatalog(spark, str(tmp_path / "catalog"))


def test_project_get_list_drop(spark, catalog):
    g = pagerank_graph(spark)
    catalog.project("wiki", g.edges, nodes=g.nodes)
    assert catalog.exists("wiki")
    assert [m["name"] for m in catalog.list()] == ["wiki"]
    loaded = catalog.get("wiki")
    assert loaded.node_count() == 11
    assert loaded.edge_count() == 17
    assert catalog.drop("wiki")
    assert not catalog.exists("wiki")


def test_project_duplicate_raises(spark, catalog):
    g = pagerank_graph(spark)
    catalog.project("g1", g.edges)
    with pytest.raises(ValueError):
        catalog.project("g1", g.edges)
    catalog.project("g1", g.edges, overwrite=True)


def test_catalog_filter(spark, catalog):
    g = pagerank_graph(spark)
    catalog.project("g2", g.edges, nodes=g.nodes)
    sub = catalog.filter("g2_small", "g2", node_filter="vid <= 5")
    assert sub.node_count() == 6
    assert catalog.exists("g2_small")


def test_mutate_and_stream_property(spark, catalog):
    g = pagerank_graph(spark)
    catalog.project("g3", g.edges, nodes=g.nodes)
    algo = Algo(catalog.get("g3"), catalog=catalog)
    algo.degree().mutate("deg")
    streamed = catalog.stream_node_properties("g3", ["deg"]).collect()
    got = {r["vid"]: r["deg"] for r in streamed}
    assert got[4] == 3.0  # e has out-degree 3


def test_stats_mode(spark):
    algo = Algo(clique5_graph(spark))
    stats = algo.triangle_count().stats()
    assert stats["globalTriangleCount"] == 10
    assert stats["count"] == 5
    assert stats["mean"] == pytest.approx(6.0)


def test_wcc_stats_fields(spark):
    algo = Algo(clique5_graph(spark))
    st = algo.wcc().stats()
    assert st["componentCount"] == 1
    assert st["didConverge"]


def test_write_mode(spark, tmp_path):
    algo = Algo(clique5_graph(spark))
    out = str(tmp_path / "scores")
    algo.degree().write(out)
    assert spark.read.parquet(out).count() == 5


def test_facade_round4_methods(spark):
    """knn / conductance / sample_rwr / sample_cnarw / collapse_path are
    reachable through the gds.* facade with sane shapes."""
    from graph_data_science_spark.api import Algo
    from graph_data_science_spark.plans.graph import Graph
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(a, b, 1.0) for a in range(6) for b in range(6) if a != b],
        "src long, dst long, weight double",
    )
    nodes = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(6)],
        "vid long, vec array<double>",
    )
    g = Graph(nodes=nodes, edges=edges)
    algo = Algo(g)

    knn = algo.knn("vec", k=2, max_iterations=2).stream()
    assert {"query_id", "neighbor_id", "cosine_sim", "rnk"} <= set(knn.columns)
    assert knn.groupBy("query_id").count().agg(F.max("count")).collect()[0][0] <= 2

    comm = nodes.select("vid", (F.col("vid") % 2).alias("community"))
    cond = algo.conductance(comm).stream().collect()
    assert len(cond) == 2

    sub = algo.sample_rwr(nodes.filter(F.col("vid") == 0).select("vid"),
                          walk_length=4, walks_per_node=2)
    assert 0 < sub.nodes.count() <= 6

    sub2 = algo.sample_cnarw(nodes.filter(F.col("vid") == 0).select("vid"),
                             walk_length=4, walks_per_node=2)
    assert 0 < sub2.nodes.count() <= 6

    chain = [edges.select("src", "dst"), edges.select("src", "dst")]
    two_hop = algo.collapse_path(chain).stream()
    assert set(two_hop.columns) == {"src", "dst", "weight"}
    assert two_hop.count() > 0
