"""HashGNN node embeddings — hashing-accelerated GNN (binary min-hash
message passing), after "Hashing-Accelerated Graph Neural Networks for
Link Prediction" (WWW '21).

Reference (specification, not implementation):
  algo/src/main/java/org/neo4j/gds/embeddings/hashgnn/HashGNN.java
  (iteration loop + self/neighbor argmin combination, HashGNN.java:113-158),
  MinHashTask.java:125-164 (per-node k-round min-hash),
  HashGNNCompanion.java (hashArgMin + h(x) = (a*x + b) mod c triples),
  BinarizeTask.java (gaussian hyperplane rounding of dense properties),
  DensifyTask.java (sparse ±sqrt(3)/sqrt(d) output projection),
  GenerateFeaturesTask.java (random sparse binary input features),
  tests: HashGNNTest.java (determinism, neighbor-influence behavior).

Semantics per iteration t, per hash round k (embedding_density rounds):
  self_k(v)  = argmin_{bit in E_{t-1}(v)}      h_self_k(bit)
  pre_k(u)   = argmin_{bit in E_{t-1}(u)}      h_pre_k(bit)     (per nbr u)
  nbr_k(v)   = argmin_{b in {pre_k(u): u in N(v)}} h_nbr_k(b)
  winner bit = nbr_k(v) if min h_nbr_k < min h_self_k else self_k(v)
  E_t(v)     = union of winner bits over k.
The neighborInfluence parameter scales the self-hash prime upward so
self argmins win less often (reference HashTask.java:96-110); we fold it
in the same way (selfPrime ~ neighborPrime * influence-derived factor).

Spark-first execution (no per-row Python):
  - embeddings are sorted ``array<int>`` columns of set bit positions;
  - all k argmins per node are ONE ``transform(TRIPLES, t ->
    array_min(transform(emb, x -> struct((x*t.a + t.b) % t.c, x))))``
    over a k-element literal triple array — O(1) expression-tree size in
    both k and dimension (the Catalyst lesson from betweenness: k-wide
    literal expression arrays cost seconds of codegen per superstep);
  - the neighbor aggregation exploits min-of-union = min-over-neighbors:
    messages are exploded to (vid, k, struct(h, bit)) rows and reduced
    with a plain ``min`` — map-side combinable, no unbounded
    collect_list, hub-skew bounded by partial aggregation;
  - hash triples / hyperplanes / projection matrices are derived on the
    driver from a seeded ``numpy.random.Generator`` (deterministic in
    (seed, iteration, k); tiny, shipped as literals/broadcast).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.plans.lineage import cut_lineage

_INT_MAX = 2**31 - 1


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    if n % 2 == 0:
        return n == 2
    i = 3
    while i * i <= n:
        if n % i == 0:
            return False
        i += 2
    return True


def _next_prime(n: int) -> int:
    while not _is_prime(n):
        n += 1
    return n


def _triples(rng: np.random.Generator, count: int, influence: float) -> list[tuple]:
    """(a, b, c, a_self, b_self, c_self, a_pre, b_pre, c_pre) per round.
    The self prime is the neighbor prime scaled by the influence factor
    (clamped like the reference's MAX_FINAL_INFLUENCE) so that a larger
    neighborInfluence makes neighbor hash values win the min more often."""
    infl = max(1e-4, min(1e4, influence))
    out = []
    for _ in range(count):
        c_nbr = _next_prime(int(rng.integers(50_000, int(_INT_MAX / max(1.0, infl) / 1.001))))
        c_self = c_nbr if infl == 1.0 else _next_prime(int(round(c_nbr * infl)))
        c_pre = _next_prime(int(rng.integers(50_000, _INT_MAX)))
        a_n, b_n = int(rng.integers(1, c_nbr)), int(rng.integers(1, c_nbr))
        a_s, b_s = int(rng.integers(1, c_self)), int(rng.integers(1, c_self))
        a_p, b_p = int(rng.integers(1, c_pre)), int(rng.integers(1, c_pre))
        out.append((a_n, b_n, c_nbr, a_s, b_s, c_self, a_p, b_p, c_pre))
    return out


def _triple_lit(ts: Sequence[tuple], offs: int):
    """k-element literal array<struct<a,b,c>> (data, not per-row code)."""
    return F.array(*[
        F.struct(
            F.lit(t[offs]).alias("a"), F.lit(t[offs + 1]).alias("b"),
            F.lit(t[offs + 2]).alias("c"),
        )
        for t in ts
    ])


def _argmins(emb_col, triples_col):
    """array over k of struct(h: long, bit: int) — per-round hash-argmin
    over the set bits. array_min on struct orders by (h, bit), matching
    the reference's deterministic first-minimum scan."""
    return F.transform(
        triples_col,
        lambda t: F.array_min(
            F.transform(
                emb_col,
                lambda x: F.struct(
                    ((x.cast("long") * t["a"] + t["b"]) % t["c"]).alias("h"),
                    x.alias("bit"),
                ),
            )
        ),
    )


@dataclass
class HashGNNResult:
    embeddings: DataFrame  # (vid, embedding) — array<double>
    dimension: int
    metrics: list[dict[str, Any]] = field(default_factory=list)


def binarize_features(
    nodes: DataFrame,
    feature_col: str,
    dimension: int,
    threshold: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Gaussian-hyperplane rounding of a dense ``array<double>`` feature
    column to (vid, bits array<int>) — BinarizeTask.java:96-140: bit f is
    set iff <feature, hyperplane_f> > threshold. The hyperplane matrix is
    driver-generated (input_dim x dimension, seeded) and broadcast as a
    literal — input_dim x dimension doubles, small by construction."""
    row = nodes.select(F.size(F.col(feature_col)).alias("d")).first()
    in_dim = int(row["d"]) if row else 0
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((in_dim, dimension))
    planes_lit = F.array(*[
        F.array(*[F.lit(float(planes[i, f])) for i in range(in_dim)])
        for f in range(dimension)
    ])
    scores = F.transform(
        planes_lit,
        lambda plane: F.aggregate(
            F.zip_with(F.col(feature_col), plane, lambda x, p: x * p),
            F.lit(0.0), lambda acc, x: acc + x,
        ),
    )
    bits = F.filter(
        F.transform(scores, lambda s, i: F.when(s > threshold, i).otherwise(F.lit(-1))),
        lambda x: x >= 0,
    )
    return nodes.select("vid", bits.alias("bits"))


def generate_features(
    nodes: DataFrame, dimension: int, density: int, seed: int = 42
) -> DataFrame:
    """Random sparse binary input features (GenerateFeaturesTask.java):
    `density` bits per node, a pure hash of (seed, vid, slot) — identical
    at every parallelism level."""
    slots = F.sequence(F.lit(0), F.lit(density - 1))
    bits = F.array_sort(F.array_distinct(F.transform(
        slots,
        lambda s: F.pmod(F.xxhash64(F.lit(seed), F.col("vid"), s), F.lit(dimension))
        .cast("int"),
    )))
    return nodes.select("vid", bits.alias("bits"))


def hashgnn(
    graph: Graph,
    iterations: int = 2,
    embedding_density: int = 4,
    neighbor_influence: float = 1.0,
    feature_df: DataFrame | None = None,
    generate_dimension: int | None = None,
    generate_density: int = 2,
    output_dimension: int | None = None,
    input_dimension: int | None = None,
    seed: int = 42,
) -> HashGNNResult:
    """HashGNN embeddings over ``graph``.

    feature_df: (vid, bits array<int>) binary input features (from
    ``binarize_features`` or raw one-hot positions). If None,
    ``generate_dimension``/``generate_density`` synthesize them
    (GenerateFeaturesTask path). Returns binary 0/1 vectors of the input
    dimension as array<double>, or — with ``output_dimension`` — the
    sparse-projection densified vectors (DensifyTask.java:61-88).

    input_dimension: the declared feature dimension. When feature_df comes
    from ``binarize_features(dimension=d)`` with sparse activations the
    highest bit may be unset across all nodes, so deriving the width from
    max(bit)+1 would silently shrink the output; pass d explicitly (the
    generate path carries generate_dimension automatically). The
    data-derived max-bit is only the fallback when no dimension is given."""
    spark = graph.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    if feature_df is None:
        if generate_dimension is None:
            raise ValueError("need feature_df or generate_dimension")
        feature_df = generate_features(
            graph.nodes.select("vid"), generate_dimension, generate_density, seed
        )
        if input_dimension is None:
            input_dimension = generate_dimension
    if input_dimension is not None:
        dimension = int(input_dimension)
    else:
        dim_row = feature_df.select(
            F.max(F.array_max(F.col("bits"))).alias("m")
        ).first()
        dimension = int(dim_row["m"] or 0) + 1

    # undirected message flow matches the reference's projection default
    # (orientation is a Graph property here; edges are used as stored)
    edges = (
        graph.edges.select(F.col("src").alias("m_dst"), F.col("dst").alias("m_src"))
        .repartition(n_part, "m_src").persist()
    )
    edges.count()

    prev = feature_df.select("vid", F.col("bits").alias("emb"))
    prev = prev.repartition(n_part, "vid").persist()
    metrics: list[dict[str, Any]] = []

    for it in range(iterations):
        rng = np.random.default_rng((seed, it))
        ts = _triples(rng, embedding_density, neighbor_influence)

        # self argmins: (vid, array_k<struct<h,bit>>)
        selfs = prev.select(
            "vid", _argmins(F.col("emb"), _triple_lit(ts, 3)).alias("s")
        )
        # per-neighbor pre-aggregation argmin, exploded to one row per
        # (edge, k) and min-reduced per (dst, k): map-side combinable
        pre = prev.select(
            F.col("vid").alias("m_src"),
            _argmins(F.col("emb"), _triple_lit(ts, 6)).alias("p"),
        )
        nbr_hash = _triple_lit(ts, 0)
        msgs = (
            edges.join(pre, "m_src")
            .select(
                F.col("m_dst").alias("vid"),
                F.posexplode(
                    F.zip_with(
                        F.col("p"), nbr_hash,
                        lambda pm, t: F.struct(
                            ((pm["bit"].cast("long") * t["a"] + t["b"]) % t["c"]).alias("h"),
                            pm["bit"].alias("bit"),
                        ),
                    )
                ).alias("k", "m"),
            )
        )
        nbr = (
            msgs.groupBy("vid", "k").agg(F.min("m").alias("m"))
            .groupBy("vid")
            .agg(F.map_from_arrays(F.collect_list("k"), F.collect_list("m")).alias("nm"))
        )
        kseq = F.sequence(F.lit(0), F.lit(embedding_density - 1))
        joined = selfs.join(nbr, "vid", "left")
        # neighbor wins on strictly smaller hash, or when the node has no
        # self bits (reference: empty bitset scans to min = MAX_VALUE)
        winner = F.transform(
            kseq,
            lambda k: F.when(
                F.col("nm").isNotNull()
                & F.element_at(F.col("nm"), k).isNotNull()
                & (
                    F.element_at(F.col("s"), k + 1).isNull()
                    | (F.element_at(F.col("nm"), k)["h"]
                       < F.element_at(F.col("s"), k + 1)["h"])
                ),
                F.element_at(F.col("nm"), k)["bit"],
            ).otherwise(F.element_at(F.col("s"), k + 1)["bit"]),
        )
        cur = joined.select(
            "vid",
            F.array_sort(
                F.array_distinct(F.filter(winner, lambda x: x.isNotNull()))
            ).alias("emb"),
        )
        new_prev = cut_lineage(cur.repartition(n_part, "vid"))
        new_prev = new_prev.persist()
        new_prev.count()
        prev.unpersist()
        prev = new_prev
        metrics.append({"iteration": it, "rounds": embedding_density})

    if output_dimension is not None:
        rng = np.random.default_rng((seed, 0xD51F1))
        entry = float(np.sqrt(3.0) / np.sqrt(output_dimension))
        r = rng.random((dimension, output_dimension))
        proj = np.where(r < 1 / 6, entry, np.where(r < 2 / 6, -entry, 0.0))
        proj_lit = F.array(*[
            F.array(*[F.lit(float(proj[b, d])) for b in range(dimension)])
            for d in range(output_dimension)
        ])
        dense = F.transform(
            proj_lit,
            lambda col_b: F.aggregate(
                F.transform(F.col("emb"), lambda bit: F.element_at(col_b, bit + 1)),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        )
        out = prev.select("vid", dense.alias("embedding"))
        out_dim = output_dimension
    else:
        idx = F.sequence(F.lit(0), F.lit(dimension - 1))
        vec = F.transform(
            idx,
            lambda i: F.when(F.array_contains(F.col("emb"), i.cast("int")), 1.0)
            .otherwise(0.0),
        )
        out = prev.select("vid", vec.alias("embedding"))
        out_dim = dimension

    edges.unpersist()
    return HashGNNResult(embeddings=out, dimension=out_dim, metrics=metrics)
