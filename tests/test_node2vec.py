"""node2vec + biased walks.

Reference behavior (algo/.../embeddings/node2vec/Node2VecTest.java):
embeddings are random-seeded floats, so the reference's own tests assert
STRUCTURE (cosine similarity within a cluster beats across clusters) and
shape — same contract here. Embeddings are not oracle-portable;
documented in operators/node2vec.py.
"""

import numpy as np
from pyspark.sql import functions as F

from graph_data_science_spark.operators.node2vec import node2vec
from graph_data_science_spark.plans.graph import Graph, Orientation
from graph_data_science_spark.sources.sampling import biased_random_walks


def _two_cliques(spark, k=6):
    """Two k-cliques bridged by one edge (0 -- k)."""
    edges = []
    for base in (0, k):
        ids = list(range(base, base + k))
        edges += [(u, v) for u in ids for v in ids if u != v]
    edges += [(0, k), (k, 0)]
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    return Graph.from_edges(df)


def test_biased_walk_shape_and_determinism(spark):
    g = _two_cliques(spark)
    w1 = biased_random_walks(g, walks_per_node=2, walk_length=5, seed=7)
    rows = {r["walk_id"]: r["path"] for r in w1.collect()}
    assert len(rows) == 12 * 2
    assert all(len(p) == 6 for p in rows.values())  # no sinks here
    w2 = biased_random_walks(g, walks_per_node=2, walk_length=5, seed=7)
    assert rows == {r["walk_id"]: r["path"] for r in w2.collect()}


def test_biased_walk_in_out_factor_keeps_walks_local(spark):
    """Large inOutFactor (q) -> BFS-like walks that stay in the start
    clique; crossing the single bridge from a 6-clique requires an
    'outward' step whose weight is ~1/q."""
    g = _two_cliques(spark)
    starts = spark.createDataFrame([(1,), (2,), (3,)], "vid long")
    w = biased_random_walks(
        g, walks_per_node=4, walk_length=12, in_out_factor=1e6, seed=11,
        start_nodes=starts,
    )
    crossed = (
        w.select(F.explode("path").alias("v")).filter(F.col("v") >= 6).count()
    )
    total = w.select(F.explode("path")).count()
    assert crossed / total < 0.05, f"{crossed}/{total} steps left the clique"


def test_biased_walk_return_factor(spark):
    """Tiny returnFactor (p) -> immediate backtracking dominates: on a
    star graph every second step must be the hub, and with p<<1 walks
    from the hub bounce hub->leaf->hub->... deterministically-ish."""
    edges = [(0, i, 1.0) for i in range(1, 9)] + [(i, 0, 1.0) for i in range(1, 9)]
    g = Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long, weight double")
    )
    starts = spark.createDataFrame([(i,) for i in range(1, 9)], "vid long")
    w = biased_random_walks(
        g, walks_per_node=2, walk_length=8, return_factor=1e-6, seed=3,
        start_nodes=starts,
    )
    for r in w.collect():
        path = r["path"]
        # leaf start: odd positions are the hub; with p tiny, even
        # positions (from the hub) overwhelmingly return to the same leaf
        assert all(v == 0 for v in path[1::2])
        returns = sum(1 for i in range(2, len(path), 2) if path[i] == path[0])
        assert returns >= (len(path) - 1) // 2 - 1


def test_node2vec_cluster_structure(spark):
    g = _two_cliques(spark)
    res = node2vec(
        g,
        embedding_dimension=16,
        walks_per_node=8,
        walk_length=12,
        window_size=4,
        iterations=12,
        negative_sampling_rate=3,
        initial_learning_rate=0.15,
        chunk_size=32,
        positive_sampling_factor=1.0,  # tiny graph: keep every occurrence
        random_seed=19,
        batch_partitions=4,
    )
    emb = {r["vid"]: np.array(r["embedding"]) for r in res.embeddings.collect()}
    assert len(emb) == 12 and all(v.shape == (16,) for v in emb.values())
    assert len(res.loss_per_iteration) == 12
    assert res.loss_per_iteration[-1] < res.loss_per_iteration[0]

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    intra, inter = [], []
    for u in emb:
        for v in emb:
            if u < v:
                same = (u < 6) == (v < 6)
                (intra if same else inter).append(cos(emb[u], emb[v]))
    assert np.mean(intra) > np.mean(inter) + 0.2, (
        f"intra {np.mean(intra):.3f} vs inter {np.mean(inter):.3f}"
    )


def test_node2vec_model_size_guard(spark):
    """The DRIVER backend's SGNS model is driver-resident; an explicit
    driver request past max_model_nodes must refuse loudly (not OOM a
    big job mid-flight). 'auto' switches to sharded instead."""
    import pytest

    g = _two_cliques(spark)
    with pytest.raises(ValueError, match="max_model_nodes"):
        node2vec(g, embedding_dimension=8, walks_per_node=1, walk_length=3,
                 max_model_nodes=4, model_backend="driver")


def test_node2vec_sharded_cluster_structure(spark):
    """The sharded backend (model as row-partitioned DataFrames, no
    driver-resident matrices — operators/node2vec_sharded.py) learns the
    same two-clique structure as the driver backend: loss decreases and
    intra-clique cosine beats inter-clique by a wide margin."""
    g = _two_cliques(spark)
    res = node2vec(
        g,
        embedding_dimension=16,
        walks_per_node=8,
        walk_length=12,
        window_size=4,
        iterations=8,
        negative_sampling_rate=6,
        initial_learning_rate=0.25,
        min_learning_rate=0.02,
        positive_sampling_factor=1.0,
        random_seed=19,
        batch_partitions=4,
        model_backend="sharded",
        minibatch_rounds=2,
        chunk_size=32,
    )
    emb = {r["vid"]: np.array(r["embedding"]) for r in res.embeddings.collect()}
    assert len(emb) == 12 and all(v.shape == (16,) for v in emb.values())
    assert len(res.loss_per_iteration) == 8
    assert res.loss_per_iteration[-1] < res.loss_per_iteration[0]

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    intra, inter = [], []
    for u in emb:
        for v in emb:
            if u < v:
                same = (u < 6) == (v < 6)
                (intra if same else inter).append(cos(emb[u], emb[v]))
    assert np.mean(intra) > np.mean(inter) + 0.2, (
        f"intra {np.mean(intra):.3f} vs inter {np.mean(inter):.3f}"
    )


def test_node2vec_auto_backend_switches_past_cap(spark):
    """model_backend='auto' must fall over to the sharded trainer past
    max_model_nodes instead of raising (the guard now only protects an
    EXPLICIT driver-backend request)."""
    g = _two_cliques(spark)
    res = node2vec(
        g, embedding_dimension=8, walks_per_node=2, walk_length=4,
        window_size=2, iterations=1, negative_sampling_rate=2,
        positive_sampling_factor=1.0, random_seed=5, batch_partitions=2,
        max_model_nodes=4, minibatch_rounds=1, chunk_size=32,
    )
    assert res.embeddings.count() == 12
