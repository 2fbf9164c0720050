"""FastRP node embeddings — gds.fastRP parity.

Reference: ml/.../embeddings/fastrp (FastRP.java), implementing
"Fast and Accurate Network Embeddings via Very Sparse Random Projection"
(Chen et al., 2019 — public paper): nodes get very-sparse random base
vectors (entries ±sqrt(s)/sqrt(d) with prob 1/2s each, else 0), then the
embedding is a weighted sum of successive neighbor-averaging iterations:
    e = Σ_k w_k · normalize(A_norm^k · R)
with optional degree-based normalization of the propagation.

Spark-first formulation:
  - base vectors are a pure hash function of (seed, vid, dim-index) —
    no RNG state, deterministic at any parallelism (same property the
    reference gets from its seeded SparseVector generator);
  - each iteration is ONE gather join + segmented mean over the cached
    pre-partitioned edge table, with the vector column as array<float>
    combined via zip_with (JVM-side, no UDFs);
  - per-iteration L2 normalization mirrors FastRP.java.

Embedding dim d is bounded by what array columns handle comfortably
(hundreds) — the reference defaults to 256.

Scale note: the neighbor-mean is posexplode + per-(node, position) SUM —
map-side combinable, so a degree-D hub reduces D candidates per shuffle
partition instead of buffering a D-element vector list in one
aggregation group; array reassembly is a bounded d-entry sort per node.
Hub skew is therefore handled by Catalyst's partial aggregation, the
same property the PageRank message combine relies on.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph

SPARSITY = 3  # s in the paper: P(±) = 1/(2s) each


def _base_vector(dim: int, seed: int, coin: str = "xxhash64") -> Column:
    """Very-sparse random projection base vector for F.col('vid').
    coin="xxhash64" (pure-JVM fast path) or "md5" (engine-portable —
    the DuckDB oracle replays identical coins)."""
    import math

    val = math.sqrt(SPARSITY) / math.sqrt(dim)
    from graph_data_science_spark.operators.influence import _md5_u32

    comps = []
    for j in range(dim):
        if coin == "md5":
            h = F.pmod(
                _md5_u32(F.lit(str(seed)), F.col("vid"), F.lit(str(j))),
                F.lit(2 * SPARSITY),
            )
        else:
            h = F.pmod(F.xxhash64(F.lit(seed), F.col("vid"), F.lit(j)), F.lit(2 * SPARSITY))
        comps.append(
            F.when(h == 0, F.lit(val)).when(h == 1, F.lit(-val)).otherwise(F.lit(0.0))
        )
    return F.array(*comps)


def _l2_normalize(vec: Column) -> Column:
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, v: a + v * v))
    return F.when(
        norm > 0, F.transform(vec, lambda v: v / norm)
    ).otherwise(vec)


def _vec_sum(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x + y)


def fast_rp(
    graph: Graph,
    embedding_dimension: int = 64,
    iteration_weights: list[float] | None = None,
    normalization_strength: float = 0.0,
    seed: int = 42,
    coin: str = "xxhash64",
) -> DataFrame:
    """Returns (vid, embedding array<double>).

    iteration_weights defaults to [0.0, 1.0, 1.0] like the reference
    (first weight applies to the base vectors themselves).
    coin: hash family for the sparse base vectors — "xxhash64" (default)
    or "md5" (engine-portable, used by the DuckDB oracle).
    """
    if iteration_weights is None:
        iteration_weights = [0.0, 1.0, 1.0]
    spark = graph.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        graph.edges.select("src", "dst", "weight")
        .repartition(n_part, "dst")
        .sortWithinPartitions("dst")
        .persist()
    )
    # degree^normalization_strength scaling of the propagation
    deg = graph.degrees(direction="out")

    cur = graph.nodes.select(
        "vid", _l2_normalize(_base_vector(embedding_dimension, seed, coin)).alias("vec")
    )
    if normalization_strength != 0.0:
        scale = deg.select(
            "vid",
            F.pow(F.greatest(F.col("degree"), F.lit(1.0)), F.lit(normalization_strength)).alias("_s"),
        )
        cur = cur.join(scale, "vid").select(
            "vid", F.transform("vec", lambda v: v * F.col("_s")).alias("vec")
        )

    zero = F.array_repeat(F.lit(0.0), embedding_dimension)
    acc = None
    w0 = iteration_weights[0]
    if w0 != 0.0:
        acc = cur.select("vid", F.transform("vec", lambda v: v * F.lit(w0)).alias("emb"))

    state = cur.persist()
    for w in iteration_weights[1:]:
        # neighbor mean per (node, position) — posexplode + sum is
        # map-side combinable, so a degree-D hub reduces D candidates
        # per partition instead of buffering a D-element vector list in
        # one aggregation group (the hub-skew ceiling of the previous
        # collect_list fold); the d-entry array reassembles per node via
        # a bounded sort+slice
        nbr = state.select(F.col("vid").alias("dst"), F.col("vec").alias("nvec"))
        per_pos = (
            edges.join(nbr, "dst")
            .select(F.col("src").alias("vid"), F.posexplode("nvec").alias("pos", "x"))
            .groupBy("vid", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        gathered = (
            per_pos.groupBy("vid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", (F.col("s") / F.col("n")).alias("m")))
                ).alias("pm")
            )
            .select("vid", _l2_normalize(F.col("pm.m")).alias("vec"))
        )
        new_state = (
            graph.nodes.select("vid")
            .join(gathered, "vid", "left")
            .select("vid", F.coalesce("vec", zero).alias("vec"))
            .persist()
        )
        new_state.count()
        state.unpersist()
        state = new_state
        term = state.select("vid", F.transform("vec", lambda v: v * F.lit(w)).alias("term"))
        if acc is None:
            acc = term.withColumnRenamed("term", "emb")
        else:
            acc = (
                acc.join(term, "vid")
                .select("vid", _vec_sum(F.col("emb"), F.col("term")).alias("emb"))
            )

    out = acc.select("vid", F.col("emb").alias("embedding"))
    edges.unpersist()
    return out
