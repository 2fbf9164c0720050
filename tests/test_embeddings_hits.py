import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.fastrp import fast_rp
from graph_data_science_spark.operators.hits import hits
from graph_data_science_spark.plans.graph import Graph
from tests.fixtures import pagerank_graph


def test_hits_hub_authority(spark):
    # bipartite: 0,1 -> 2,3 ; pure hubs {0,1}, pure authorities {2,3}
    edges = spark.createDataFrame(
        [(0, 2, 1.0), (0, 3, 1.0), (1, 2, 1.0), (1, 3, 1.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges)
    res = hits(g, hits_iterations=15, tolerance=1e-9)
    got = {r["vid"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
    assert got[0][0] == pytest.approx(1 / math.sqrt(2), abs=1e-6)  # hubs L2-normalized
    assert got[0][1] == pytest.approx(0.0)
    assert got[2][1] == pytest.approx(1 / math.sqrt(2), abs=1e-6)
    assert got[2][0] == pytest.approx(0.0)
    assert res.did_converge


def test_hits_l2_norms(spark):
    g = pagerank_graph(spark)
    res = hits(g, hits_iterations=10)
    agg = res.scores.agg(
        F.sum(F.col("hub") * F.col("hub")).alias("h2"),
        F.sum(F.col("authority") * F.col("authority")).alias("a2"),
    ).collect()[0]
    assert agg["h2"] == pytest.approx(1.0, abs=1e-9)
    assert agg["a2"] == pytest.approx(1.0, abs=1e-9)


def test_fastrp_shape_and_determinism(spark):
    g = pagerank_graph(spark)
    a = {r["vid"]: tuple(r["embedding"]) for r in fast_rp(g, embedding_dimension=16).collect()}
    b = {r["vid"]: tuple(r["embedding"]) for r in fast_rp(g, embedding_dimension=16).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())
    c = {r["vid"]: tuple(r["embedding"]) for r in
         fast_rp(g, embedding_dimension=16, seed=7).collect()}
    assert a != c


def test_fastrp_similar_neighborhoods_embed_close(spark):
    # g, h, i all point at {b, e}: identical neighborhoods -> identical
    # propagated embeddings (weights [0,1,1] ignore the base vectors)
    from tests.fixtures import vid

    g = pagerank_graph(spark)
    emb = {r["vid"]: r["embedding"] for r in
           fast_rp(g, embedding_dimension=32, iteration_weights=[0.0, 1.0, 1.0]).collect()}

    def cos(u, v):
        dot = sum(x * y for x, y in zip(u, v))
        nu = math.sqrt(sum(x * x for x in u))
        nv = math.sqrt(sum(x * x for x in v))
        return dot / (nu * nv) if nu and nv else 0.0

    assert cos(emb[vid("g")], emb[vid("h")]) == pytest.approx(1.0, abs=1e-9)
    # a node with a different neighborhood is farther
    assert cos(emb[vid("g")], emb[vid("c")]) < 0.99
