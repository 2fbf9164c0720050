"""K-means over node property vectors — gds.kmeans.

Reference: algo/src/main/java/org/neo4j/gds/kmeans/Kmeans.java (Lloyd
iterations over an array node property; optional K-means++ sampling,
seeded centroids; defaults KmeansBaseConfig: k=10, maxIterations=10,
deltaThreshold=0.05, numberOfRestarts=1).

Spark-first: centroids are a LIST OF LITERAL ARRAYS folded into the
assignment expression — the per-node argmin over k centroids is one pure
Column expression (no join, no UDF, whole-stage codegen); the centroid
update is one groupBy over the assignments. Per iteration: one job.
Deterministic init: the k nodes with the smallest xxhash64(seed, vid)
(a seeded uniform sample, stable across partitionings).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class KmeansResult:
    assignments: DataFrame  # (vid, community, distance_from_centroid)
    centroids: list[list[float]]
    ran_iterations: int
    did_converge: bool
    metrics: list[dict] = field(default_factory=list)


def _dist_sq(vec_col, centroid: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans(
    nodes: DataFrame,
    property_col: str,
    k: int = 10,
    max_iterations: int = 10,
    delta_threshold: float = 0.05,
    seed: int = 42,
    id_col: str = "vid",
    initial_centroids: list[list[float]] | None = None,
) -> KmeansResult:
    """Lloyd k-means on nodes[property_col] (array<numeric>).

    Converges when the fraction of nodes that switched cluster is
    <= delta_threshold (reference deltaThreshold semantics).
    initial_centroids: explicit seed centroids (the reference's
    seedCentroids option, KmeansBaseConfig) — overrides the hash-sampled
    init; cluster i keeps the list index i, so results are deterministic
    across engines (the oracle-gated configuration)."""
    if max_iterations < 1:
        raise ValueError("kmeans requires max_iterations >= 1")
    vecs = nodes.select(
        F.col(id_col).alias("vid"),
        F.col(property_col).cast("array<double>").alias("v"),
    ).persist()
    n = vecs.count()
    if initial_centroids is not None:
        centroids = [list(map(float, c)) for c in initial_centroids]
        k = len(centroids)
    else:
        k = min(k, n)
        init_rows = (
            vecs.orderBy(F.xxhash64(F.lit(seed), F.col("vid"))).limit(k).collect()
        )
        centroids = [list(r["v"]) for r in init_rows]

    prev_assign = None
    ran = 0
    did_converge = False
    for it in range(max_iterations):
        dists = [_dist_sq(F.col("v"), c) for c in centroids]
        best = F.lit(0)
        best_d = dists[0]
        for ci in range(1, k):
            cond = dists[ci] < best_d
            best = F.when(cond, F.lit(ci)).otherwise(best)
            best_d = F.when(cond, dists[ci]).otherwise(best_d)
        assign = vecs.select(
            "vid", "v", best.alias("community"), F.sqrt(best_d).alias("distance_from_centroid")
        ).localCheckpoint(eager=True)
        ran = it + 1
        # centroid update: mean per cluster (elementwise via posexplode)
        agg = (
            assign.select("community", F.posexplode("v").alias("pos", "x"))
            .groupBy("community", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("community")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("community", F.col("pm.m").alias("centroid"))
            .collect()
        )
        new_centroids = list(centroids)
        for r in agg:
            new_centroids[r["community"]] = list(r["centroid"])
        if prev_assign is not None:
            switched = (
                assign.select("vid", "community")
                .join(
                    prev_assign.select("vid", F.col("community").alias("prev_c")), "vid"
                )
                .filter(F.col("community") != F.col("prev_c"))
                .count()
            )
            if switched / max(n, 1) <= delta_threshold:
                did_converge = True
                centroids = new_centroids
                prev_assign = assign
                break
        prev_assign = assign
        centroids = new_centroids
    vecs.unpersist()
    # recompute distance_from_centroid against the RETURNED (post-update)
    # centroids so assignments and centroids are consistent — the loop
    # measured distance against the pre-update centroids (half an
    # iteration stale)
    final_d = F.sqrt(_dist_sq(F.col("v"), centroids[0]))
    for ci in range(1, k):
        final_d = F.when(
            F.col("community") == ci, F.sqrt(_dist_sq(F.col("v"), centroids[ci]))
        ).otherwise(final_d)
    return KmeansResult(
        assignments=prev_assign.select(
            "vid", "community", final_d.alias("distance_from_centroid")
        ),
        centroids=centroids,
        ran_iterations=ran,
        did_converge=did_converge,
    )
