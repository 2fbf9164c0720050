import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.ann import (
    auto_planes,
    brute_force_topk,
    centroid_components,
    embedding_near_duplicates,
    ivf_topk,
    lsh_topk,
)

DIM = 8


@pytest.fixture(scope="module")
def vecs(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    rows = []
    for i in range(40):
        v = rng.normal(size=DIM)
        rows.append((i, [float(x) for x in v]))
    # 40,41: near-duplicates of vector 0
    base = rows[0][1]
    rows.append((40, [x + 0.001 for x in base]))
    rows.append((41, [x * 1.0001 for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").persist()


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_brute_force_topk_exact(spark, vecs):
    queries = vecs.filter(F.col("vec_id") == 0)
    got = brute_force_topk(vecs, queries, k=3).collect()
    rows = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    expected = sorted(
        ((i, _cos(rows[0], v)) for i, v in rows.items() if i != 0),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    got_sorted = sorted(got, key=lambda r: r["rnk"])
    assert [r["neighbor_id"] for r in got_sorted] == [i for i, _ in expected]
    for r, (_, sim) in zip(got_sorted, expected):
        assert r["cosine_sim"] == pytest.approx(round(sim, 4), abs=1e-4)


def test_lsh_topk_finds_near_duplicates(spark, vecs):
    # near-identical vectors always share every sign bucket -> recall 1
    queries = vecs.filter(F.col("vec_id") == 0)
    got = lsh_topk(vecs, queries, dim=DIM, k=3, planes=6, tables=2).collect()
    ids = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rnk"])]
    assert ids[:2] == [40, 41] or ids[:2] == [41, 40]


def test_ivf_centroids_unit_norm_and_deterministic():
    c0 = centroid_components(0, DIM)
    assert math.sqrt(sum(x * x for x in c0)) == pytest.approx(1.0, abs=1e-12)
    assert c0 == centroid_components(0, DIM)  # plan-build determinism
    assert c0 != centroid_components(1, DIM)
    assert centroid_components(0, DIM, seed=7) != c0


def test_ivf_topk_near_duplicates_and_probe_widening(spark, vecs):
    # near-identical vectors land in the same cosine-nearest cell, so
    # they are always within the n_probe=1 candidate set -> recall 1
    queries = vecs.filter(F.col("vec_id") == 0)
    got = ivf_topk(vecs, queries, dim=DIM, k=3, n_centroids=4, n_probe=1).collect()
    ids = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rnk"])]
    assert set(ids[:2]) == {40, 41}
    # full probe == brute force (every cell searched)
    full = ivf_topk(vecs, queries, dim=DIM, k=3, n_centroids=4, n_probe=4).collect()
    brute = brute_force_topk(vecs, queries, k=3).collect()
    assert sorted((r["neighbor_id"], r["rnk"]) for r in full) == sorted(
        (r["neighbor_id"], r["rnk"]) for r in brute
    )
    # widening the probe can only grow (or keep) the candidate set, so
    # top-1 similarity is monotone non-decreasing in n_probe
    one = {r["rnk"]: r["cosine_sim"] for r in got}
    all_ = {r["rnk"]: r["cosine_sim"] for r in full}
    assert all_[1] >= one[1]


def test_ivf_topk_trained_codebook(spark, vecs):
    # a kmeans-trained coarse quantizer drops into ivf_topk: the near
    # dups of vector 0 share its (cosine-nearest) trained cell, and a
    # full probe over the trained cells equals brute force
    from graph_data_science_spark.operators.kmeans import kmeans

    trained = kmeans(vecs, "embedding", k=4, max_iterations=5,
                     id_col="vec_id").centroids
    queries = vecs.filter(F.col("vec_id") == 0)
    got = ivf_topk(vecs, queries, dim=DIM, k=3, n_probe=1,
                   centroids=trained).collect()
    ids = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rnk"])]
    assert set(ids[:2]) == {40, 41}
    full = ivf_topk(vecs, queries, dim=DIM, k=3, n_probe=len(trained),
                    centroids=trained).collect()
    brute = brute_force_topk(vecs, queries, k=3).collect()
    assert sorted((r["neighbor_id"], r["rnk"]) for r in full) == sorted(
        (r["neighbor_id"], r["rnk"]) for r in brute
    )


def test_embedding_near_duplicates(spark, vecs):
    pairs = {(r["a"], r["b"]) for r in
             embedding_near_duplicates(vecs, dim=DIM, threshold=0.999).collect()}
    assert (0, 40) in pairs and (0, 41) in pairs and (40, 41) in pairs
    assert all(a in (0, 40, 41) and b in (0, 40, 41) for a, b in pairs)


def test_auto_planes_scales_with_log_n():
    # occupancy target 64 rows/bucket: n/2^planes ~= 64
    assert auto_planes(2_000) == 5
    assert auto_planes(200_000) == 12
    assert auto_planes(200_000_000) == 22
    assert auto_planes(1) == 4        # floor
    # planes=None picks auto_planes(count) and must agree with the same
    # planes passed explicitly (pure config resolution, same plan)


def test_near_duplicates_auto_planes_matches_explicit(spark, vecs):
    auto = sorted(tuple(r) for r in embedding_near_duplicates(
        vecs, dim=DIM, threshold=0.999, planes=None).collect())
    explicit = sorted(tuple(r) for r in embedding_near_duplicates(
        vecs, dim=DIM, threshold=0.999, planes=auto_planes(42)).collect())
    assert auto == explicit
