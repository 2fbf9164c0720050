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
