"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute_force_topk: exact cosine top-k. One broadcast of the query set
    against a full scan — linear, embarrassingly parallel, the baseline
    and the verifier. All math in Column expressions (zip_with +
    aggregate → JVM codegen).
  - lsh_topk: random-hyperplane LSH — embeddings are bucketed by the
    sign-pattern of projections onto D deterministic pseudo-random
    hyperplanes (hash-derived ±1 components, no RNG state); top-k is
    searched only within matching buckets (multi-probe over B tables).
    This is the 100 TB path: the bucket join replaces the full cross
    product; recall < 1 by construction, tunable via (planes, tables).

Also: embedding_near_duplicates — cosine >= threshold pairs via the
same LSH bucketing (the embedding leg of the dedup suite).

The reference's analogues are gds.similarity.knn / nodeSimilarity
(algo/.../similarity); those operate on graph-derived vectors, these on
an arbitrary embedding column — same contract (top-k per query by a
similarity measure).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.functions.similarity import cosine


def _norm_sq(c: Column) -> Column:
    return F.aggregate(c, F.lit(0.0), lambda a, v: a + v * v)


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (id_col, vec_col) — typically a small set; it is broadcast
    so the big side streams without a shuffle. Self-matches excluded.
    Returns (query_id, neighbor_id, cosine_sim) with rank <= k,
    deterministic tie-break on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    base = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        base.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rnk")
    )


def plane_signs(plane: int, dim: int, table: int = 0) -> list[float]:
    """Deterministic ±1 hyperplane components: sign of the md5 of
    "table#plane#j" (hashlib, computed at plan-build time — engine-
    portable, so DuckDB oracles can inline the identical constants)."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{table}#{plane}#{j}".encode()).hexdigest()[:8], 16) % 2 == 0
        else -1.0
        for j in range(dim)
    ]


def _hyperplane(plane: int, dim: int, table: int = 0) -> Column:
    return F.array(*[F.lit(s) for s in plane_signs(plane, dim, table)])


def lsh_bucket(vec: Column, dim: int, planes: int = 8, table: int = 0) -> Column:
    """Sign-pattern bucket id in [0, 2^planes) for one hash table."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        h = _hyperplane(p, dim, table)
        proj = F.aggregate(F.zip_with(vec, h, lambda a, b: a * b), F.lit(0.0), lambda a, v: a + v)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any of the
    hash tables; exact cosine re-rank within candidates."""
    base = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cands = None
    for t in range(tables):
        b_base = base.withColumn("bucket", lsh_bucket(F.col("nv"), dim, planes, t)).withColumn(
            "tbl", F.lit(t)
        )
        b_q = q.withColumn("bucket", lsh_bucket(F.col("qv"), dim, planes, t)).withColumn(
            "tbl", F.lit(t)
        )
        joined = b_base.join(F.broadcast(b_q), ["tbl", "bucket"]).select(
            "query_id", "neighbor_id", "qv", "nv"
        )
        cands = joined if cands is None else cands.unionByName(joined)
    cands = cands.dropDuplicates(["query_id", "neighbor_id"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cands.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rnk")
    )


def centroid_components(c: int, dim: int, seed: int = 42) -> list[float]:
    """Deterministic IVF coarse-quantizer centroid, L2-normalized:
    raw component j = ((md5("ivf#seed#c#j") % 2001) - 1000) / 1000 in
    [-1, 1], then divided by the vector norm. hashlib at plan-build
    time — engine-portable, DuckDB oracles inline the identical
    constants (Python repr doubles roundtrip exactly through DuckDB's
    literal parser, same contract as plane_signs)."""
    import hashlib
    import math

    raw = [
        (int(hashlib.md5(f"ivf#{seed}#{c}#{j}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
        / 1000.0
        for j in range(dim)
    ]
    nrm = math.sqrt(sum(x * x for x in raw)) or 1.0
    return [x / nrm for x in raw]


def _unit(c: list[float]) -> list[float]:
    import math

    nrm = math.sqrt(sum(x * x for x in c)) or 1.0
    return [float(x) / nrm for x in c]


def _cell_dots(vec: Column, codebook: list[list[float]]) -> Column:
    """array of dot(vec, unit_centroid_c) per codebook entry — argmax
    over it is the cosine-nearest cell (||vec|| is constant across
    cells). Left-to-right fold order matches DuckDB's
    list_dot_product, so the argmax is engine-portable."""
    dots = []
    for cen_vals in codebook:
        cen = F.array(*[F.lit(x) for x in cen_vals])
        dots.append(
            F.aggregate(F.zip_with(vec, cen, lambda a, b: a * b), F.lit(0.0), lambda a, v: a + v)
        )
    return F.array(*dots)


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the second scale path next
    to lsh_topk. Every vector is assigned to its cosine-nearest coarse
    centroid (the "cell"); a query probes its n_probe nearest cells and
    re-ranks exactly (cosine) within them.

    100 TB shape: the cell assignment is one narrow column over the
    base table (computable incrementally as data lands); the search
    join hits n_probe/n_centroids of the corpus instead of all of it,
    and the cell column is a natural partition key for the stored
    index. Recall < 1 by construction, tunable via (n_centroids,
    n_probe).

    centroids: a trained coarse-quantizer codebook — pass
    kmeans(...).centroids to search data-adapted cells (unit-normalized
    here; cell = cosine-nearest). Default None uses seeded hash-derived
    centroids, which keep the whole path deterministic +
    oracle-replayable (the gate's ann_ivf_topk inlines them in SQL).
    """
    if centroids is not None:
        codebook = [_unit(c) for c in centroids]
    else:
        codebook = [centroid_components(c, dim, seed) for c in range(n_centroids)]
    base = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))

    # cell = argmax dot; array_position takes the FIRST max -> ties to
    # the smallest cell id (oracle: ORDER BY dot DESC, cell ASC LIMIT 1)
    b_dots = _cell_dots(F.col("nv"), codebook)
    assigned = base.withColumn(
        "cell", (F.array_position(b_dots, F.array_max(b_dots)) - 1).cast("long")
    )

    q_dots = q.select(
        "query_id", "qv", F.posexplode(_cell_dots(F.col("qv"), codebook))
        .alias("cell", "dot")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("cell"))
    probed = (
        q_dots.withColumn("prb", F.row_number().over(wq))
        .filter(F.col("prb") <= n_probe)
        .select("query_id", "qv", F.col("cell").cast("long").alias("cell"))
    )

    cands = assigned.join(F.broadcast(probed), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cands.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rnk")
    )


def auto_planes(n: int, target_bucket_rows: int = 64) -> int:
    """planes such that n / 2^planes ~= target_bucket_rows. Within-bucket
    pair volume is quadratic in bucket occupancy, so planes MUST grow
    with log2(n) — a fixed plane count that is fine at 2k vectors
    (64 buckets, ~30 rows each) produces ~3k-row buckets at 200k vectors
    and ~625M candidate pairs (measured: >200 GB of sort spill). Callers
    at unknown scale should pass planes=None and let this pick."""
    import math

    return max(4, math.ceil(math.log2(max(n, 1) / max(target_bucket_rows, 1))))


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    planes: int | None = 8,
    tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, via LSH bucketing
    (pairs must collide in some table). Returns (a, b, cosine_sim).

    planes=None auto-scales the bucket count to the input size
    (auto_planes — one extra count() of the id column).

    Scale shape: cosine is computed and the threshold applied INSIDE
    each table's bucket join, so the only shuffled pair rows are the
    narrow (a, b, cosine_sim) survivors; the cross-table dedup never
    sees embedding arrays. (The first version deduped wide rows with
    both vectors attached — at 200k vectors / 64 buckets that sorted
    ~625M ~1 KB rows and died spilling; same results, ~1000x the IO.)"""
    if planes is None:
        planes = auto_planes(df.count())
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    pairs = None
    for t in range(tables):
        b = base.withColumn("bucket", lsh_bucket(F.col("v"), dim, planes, t))
        left = b.select(F.col("bucket"), F.col("id").alias("a"), F.col("v").alias("va"))
        right = b.select(F.col("bucket"), F.col("id").alias("b"), F.col("v").alias("vb"))
        j = (
            left.join(right, "bucket")
            .filter(F.col("a") < F.col("b"))
            .select(
                "a", "b",
                F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cosine_sim"),
            )
            .filter(F.col("cosine_sim") >= threshold)
        )
        pairs = j if pairs is None else pairs.unionByName(j)
    return pairs.dropDuplicates(["a", "b"])
