import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.community_utils import (
    community_size_stats,
    consecutive_ids,
    filter_min_community_size,
)
from graph_data_science_spark.operators.similarity import (
    filtered_node_similarity,
    knn_node_properties,
    node_similarity,
)
from graph_data_science_spark.plans.graph import Graph


@pytest.fixture(scope="module")
def sim_graph(spark):
    # 0 and 1 both point at {10, 11}; 2 points at {10}; 3 points at {12}
    edges = spark.createDataFrame(
        [(0, 10, 1.0), (0, 11, 1.0), (1, 10, 1.0), (1, 11, 1.0),
         (2, 10, 1.0), (3, 12, 1.0)],
        "src long, dst long, weight double",
    )
    return Graph.from_edges(edges)


def test_node_similarity_jaccard(spark, sim_graph):
    got = {(r["node1"], r["node2"]): r["similarity"]
           for r in node_similarity(sim_graph).collect()}
    assert got[(0, 1)] == pytest.approx(1.0)
    assert got[(1, 0)] == pytest.approx(1.0)
    assert got[(0, 2)] == pytest.approx(0.5)  # |{10}| / |{10,11}|
    assert (0, 3) not in got  # no shared neighbor
    assert (10, 11) not in got  # sinks have no out-neighbors


def test_node_similarity_overlap_and_topk(spark, sim_graph):
    got = node_similarity(sim_graph, metric="overlap", top_k=1).collect()
    per_node1 = {}
    for r in got:
        per_node1.setdefault(r["node1"], []).append(r)
    assert all(len(v) == 1 for v in per_node1.values())
    best0 = per_node1[0][0]
    assert best0["node2"] == 1 and best0["similarity"] == pytest.approx(1.0)


def test_node_similarity_degree_cutoff(spark, sim_graph):
    got = {(r["node1"], r["node2"]) for r in
           node_similarity(sim_graph, degree_cutoff=2).collect()}
    assert got == {(0, 1), (1, 0)}  # node 2 (deg 1) excluded


def test_filtered_node_similarity(spark, sim_graph):
    flt = spark.createDataFrame([(0,)], "vid long")
    got = {r["node1"] for r in
           filtered_node_similarity(sim_graph, source_filter=flt).collect()}
    assert got == {0}


def test_knn_exact(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])]
    nodes = spark.createDataFrame(rows, "vid long, emb array<double>")
    got = knn_node_properties(nodes, "emb", k=1).collect()
    best = {r["query_id"]: r["neighbor_id"] for r in got}
    assert best[0] == 1 and best[1] == 0


def test_consecutive_ids(spark):
    df = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 507), (3, 4)], "vid long, component long"
    )
    out = {r["vid"]: r["component"] for r in consecutive_ids(df).collect()}
    assert out == {3: 0, 0: 1, 1: 1, 2: 2}


def test_min_community_size(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 2)], "vid long, component long"
    )
    out = {r["vid"] for r in filter_min_community_size(df, 2).collect()}
    assert out == {0, 1}


def test_community_stats(spark):
    df = spark.createDataFrame(
        [(i, i // 3) for i in range(9)], "vid long, component long"
    )
    st = community_size_stats(df)
    assert st["communityCount"] == 3
    assert st["min"] == 3 and st["max"] == 3


def test_node_similarity_hub_cap_exact_for_nonhub_pairs(spark):
    # hub node 999 shared by everyone; pairs also share non-hub neighbors.
    # With the cap, similarities must be IDENTICAL to the exact run for
    # every pair that shares at least one non-hub neighbor (hub counts are
    # corrected back per pair).
    from graph_data_science_spark.operators.similarity import node_similarity
    from graph_data_science_spark.plans.graph import Graph
    from pyspark.sql import functions as F

    rows = []
    for i in range(200):
        rows.append((i, 999, 1.0))          # everyone -> hub
        rows.append((i, 1000 + i % 20, 1.0))  # 20 non-hub clusters
    g = Graph.from_edges(spark.createDataFrame(rows, "src long, dst long, weight double"))
    exact = node_similarity(g, top_k=50)
    capped = node_similarity(g, top_k=50, max_shared_degree=50)
    ex = {(r["node1"], r["node2"]): r["similarity"] for r in exact.collect()}
    cp = {(r["node1"], r["node2"]): r["similarity"] for r in capped.collect()}
    # every capped pair matches the exact similarity
    for k, v in cp.items():
        assert abs(ex[k] - v) < 1e-12
    # pairs sharing a non-hub neighbor are all present
    shared_nonhub = {
        (a, b) for a in range(200) for b in range(200)
        if a != b and a % 20 == b % 20
    }
    assert shared_nonhub <= set(cp)


def test_filtered_node_similarity_topk_among_allowed(spark):
    # node 0's similarity: sim(0,1)=1.0 (same nbrs), sim(0,2)=1/3.
    # With top_k=1 and target filter {2}, the reference keeps (0,2) —
    # its best ALLOWED target — not an empty set.
    from graph_data_science_spark.operators.similarity import filtered_node_similarity
    from graph_data_science_spark.plans.graph import Graph

    rows = [(0, 10, 1.0), (0, 11, 1.0), (1, 10, 1.0), (1, 11, 1.0),
            (2, 10, 1.0), (2, 12, 1.0)]
    g = Graph.from_edges(spark.createDataFrame(rows, "src long, dst long, weight double"))
    tgt = spark.createDataFrame([(2,)], "vid long")
    out = filtered_node_similarity(g, target_filter=tgt, top_k=1).collect()
    got = {(r["node1"], r["node2"]) for r in out}
    assert (0, 2) in got


def test_knn_nn_descent_recall(spark):
    # clustered vectors: NN-Descent must converge to near-exact top-k
    from graph_data_science_spark.operators.similarity import knn_nn_descent
    from graph_data_science_spark.operators import ann
    from pyspark.sql import functions as F
    import math, hashlib

    def vec(i):
        # 3 clusters on a circle + small deterministic jitter
        c = i % 3
        jit = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) / 65535.0 * 0.2
        a = 2 * math.pi * c / 3 + jit
        return [math.cos(a), math.sin(a)]

    rows = [(i, vec(i)) for i in range(120)]
    nodes = spark.createDataFrame(rows, "vid long, emb array<double>")
    got = knn_nn_descent(nodes, "emb", k=5, max_iterations=8)
    vecs = nodes.select(F.col("vid").alias("vec_id"), F.col("emb").alias("embedding"))
    exact = ann.brute_force_topk(vecs, vecs, k=5)
    g = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(g & e) / len(e)
    assert recall >= 0.9
    # every node has exactly k neighbors, ranked
    cnt = got.groupBy("query_id").count().agg(F.min("count"), F.max("count")).collect()[0]
    assert cnt[0] == cnt[1] == 5
