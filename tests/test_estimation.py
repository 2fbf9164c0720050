"""Memory estimation — gds.<algo>.estimate (plans/estimation.py).

Reference semantics mirrored: composition-tree ranges
(MemoryEstimations.java), result columns
(MemoryEstimateResult.java:31-46), per-algorithm formulas (WCC = one
per-node array + one more when seeded, HugeAtomicDisjointSetStruct
.java:70-78; PageRank = Pregel vote bits + node value + send/receive
message arrays, Pregel.java:93-114, ReducingMessenger.java:56-61).
Estimates are pure functions of dimensions — no Spark job runs — so
these tests are instant.
"""

import math

import pytest

from graph_data_science_spark.plans import estimation as est
from graph_data_science_spark.plans.estimation import (
    ALGORITHMS,
    Dimensions,
    MemoryRange,
    estimate,
)


def test_range_arithmetic_and_render():
    r = MemoryRange(100, 200) + MemoryRange.of(50)
    assert (r.min, r.max) == (150, 250)
    assert MemoryRange.of(512).render() == "512 Bytes"
    assert MemoryRange.of(2 * 1024**2).render() == "2.0 MiB"
    assert "..." in MemoryRange(1024, 4096).render()
    with pytest.raises(ValueError):
        MemoryRange(10, 5)


def test_tree_children_sum_to_root_for_every_algorithm():
    dims = Dimensions(node_count=10_000, relationship_count=80_000, concurrency=8)
    for name, builder in ALGORITHMS.items():
        tree = builder(dims)
        assert tree.range.min > 0, name
        assert tree.range.min <= tree.range.max, name
        if tree.children:
            total_min = sum(c.range.min for c in tree.children)
            total_max = sum(c.range.max for c in tree.children)
            assert tree.range.min == total_min, name
            assert tree.range.max == total_max, name


def test_tree_view_renders_nested_components():
    r = estimate("page_rank", node_count=1000, relationship_count=5000)
    assert "PageRank" in r.tree_view
    assert "vote bits" in r.tree_view
    assert "message arrays" in r.tree_view
    # nested indentation: send/receive arrays one level deeper
    assert "    |--" in r.tree_view
    assert r.map_view["name"] == "PageRank"
    assert any(c["name"] == "node value" for c in r.map_view["components"])


def test_wcc_formula_matches_reference_shape():
    # HugeAtomicDisjointSetStruct.java:70-78 — perNode data, + perNode
    # seeding info when incremental: seeded doubles the per-node charge.
    plain = estimate("wcc", node_count=50_000, relationship_count=10)
    seeded = estimate("wcc", node_count=50_000, relationship_count=10, seeded=True)
    assert seeded.bytes_min == 2 * plain.bytes_min
    # per-node linear scaling
    double_n = estimate("wcc", node_count=100_000, relationship_count=10)
    assert double_n.bytes_min == 2 * plain.bytes_min


def test_pagerank_charges_more_state_than_wcc():
    # Pregel carries vote bits + property + 2 message arrays vs WCC's
    # single per-node array.
    kw = dict(node_count=10_000, relationship_count=80_000)
    assert estimate("page_rank", **kw).bytes_min > estimate("wcc", **kw).bytes_min


def test_result_columns_match_reference_surface():
    r = estimate(
        "label_propagation",
        node_count=1_000,
        relationship_count=4_000,
        heap_bytes=1024**3,
    )
    d = r.as_dict()
    for col in (
        "requiredMemory", "treeView", "mapView", "bytesMin", "bytesMax",
        "nodeCount", "relationshipCount", "heapPercentageMin",
        "heapPercentageMax", "spark",
    ):
        assert col in d, col
    assert d["nodeCount"] == 1_000 and d["relationshipCount"] == 4_000
    assert 0 < d["heapPercentageMin"] <= d["heapPercentageMax"]


def test_heap_percentage_nan_without_heap():
    # MemoryEstimateResult.java:68-71: zero heap -> NaN, not a crash.
    r = estimate("degree", node_count=10, relationship_count=10)
    assert math.isnan(r.heap_percentage_min)


def test_unknown_algorithm_raises_with_known_list():
    with pytest.raises(ValueError, match="no memory estimation"):
        estimate("frobnicate", node_count=1, relationship_count=1)


def test_spark_advisory_shuffle_sizing():
    small = estimate("page_rank", node_count=1_000, relationship_count=10_000)
    assert small.spark["stateBroadcastable"] is True
    # shuffle volume scales with relationships; partitions floor at
    # concurrency, grow once volume exceeds the target partition size
    big_rels = 10_000_000_000
    big = estimate(
        "page_rank", node_count=1_000_000, relationship_count=big_rels, concurrency=32
    )
    assert big.spark["shuffleBytesPerSuperstep"] == big_rels * 24
    assert big.spark["suggestedShufflePartitions"] > 32
    assert small.spark["suggestedShufflePartitions"] == 32
    assert big.spark["stateBroadcastable"] is False


def test_spark_advisory_executor_fit():
    r = estimate(
        "page_rank",
        node_count=1_000_000,
        relationship_count=100_000_000,
        executor_memory_bytes=64 * 1024**2,
    )
    assert "executorFitFraction" in r.spark
    assert r.spark["executorFitFraction"] > 0
    tiny = estimate(
        "degree",
        node_count=100,
        relationship_count=100,
        executor_memory_bytes=8 * 1024**3,
    )
    assert tiny.spark["predictedSpill"] is False


def test_fastrp_scales_with_embedding_dimension():
    lo = estimate("fastrp", node_count=1000, relationship_count=5000,
                  embedding_dimension=64)
    hi = estimate("fastrp", node_count=1000, relationship_count=5000,
                  embedding_dimension=256)
    assert hi.bytes_min > lo.bytes_min


def test_facade_estimate_integration(spark):
    from graph_data_science_spark.api import Algo
    from graph_data_science_spark.plans.graph import Graph

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)], "src long, dst long, weight double"
    )
    algo = Algo(Graph.from_edges(edges))
    out = algo.estimate("page_rank")
    assert out["nodeCount"] == 3 and out["relationshipCount"] == 3
    assert out["bytesMin"] > 0
    assert "treeView" in out and "spark" in out
    assert out["spark"]["stateBroadcastable"] is True
