"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — the standard corpus-dedup toolbox, built Spark-first:

  - exact: one hash-groupBy (map-side partial agg; the only shuffle key
    is the 64-hex digest — uniform, no skew).
  - minhash_lsh: shingle → H minhashes → B bands → bucket-join. The
    candidate-pair join is on band keys (uniform md5 strings); only
    candidates pay the exact-verification cost. This is the 100 TB
    path: no pairwise blow-up, every stage a bounded shuffle.
  - simhash: 64-bit signature from token hashes; near-dups = buckets on
    rotated prefixes (hamming-adjacent candidates).
  - ngram_jaccard: brute-force exact Jaccard over character n-grams —
    the verification oracle for small slices, quadratic, NOT the scale
    path (use minhash_lsh there).
  - embedding near-dup: cosine over an embedding column via LSH
    bucketing (see operators/ann.py for the shared kernels).

All hashing is md5/sha2 on strings — deterministic, engine-portable
(identical in DuckDB for oracle checks), no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.operators.text import tokens


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical content by sha256; returns
    (content_sha256, keeper_id = min id, n_copies)."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def drop_exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each identical-content group."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def _token_set(text_col: str) -> Column:
    return F.array_distinct(tokens(F.col(text_col)))


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """(id, sig: array<string>) — sig[h] = min over tokens of
    md5(h || '#' || token). String-min MinHash: portable, deterministic,
    and a valid min-wise permutation family for dedup purposes."""
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(_token_set(text_col)).alias("tok"))
    sigs = [
        F.min(F.md5(F.concat(F.lit(f"{h}#"), F.col("tok")))).alias(f"h{h}")
        for h in range(num_hashes)
    ]
    return tok.groupBy("doc_id").agg(*sigs).select(
        "doc_id", F.array(*[F.col(f"h{h}") for h in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 2, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures; docs sharing any band bucket become candidate
    pairs (a < b). The bucket join key is md5(band signature slice) —
    uniformly distributed, skew-free."""
    band_rows = []
    for b in range(bands):
        sl = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        band_rows.append(
            signatures.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", sl)).alias("bucket"),
            )
        )
    banded = band_rows[0]
    for extra in band_rows[1:]:
        banded = banded.unionByName(extra)
    left = banded.select(F.col("band"), F.col("bucket"), F.col("doc_id").alias("a"))
    right = banded.select(F.col("band"), F.col("bucket"), F.col("doc_id").alias("b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs; keeps >= threshold.
    Returns (a, b, jaccard rounded to 4dp)."""
    sets = df.select(F.col(id_col).alias("doc_id"), _token_set(text_col).alias("toks"))
    sa = sets.select(F.col("doc_id").alias("a"), F.col("toks").alias("toks_a"))
    sb = sets.select(F.col("doc_id").alias("b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("double")
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Full pipeline: shingle → minhash → band → bucket-join → verify.
    Returns (a, b, jaccard) near-duplicate pairs."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    return jaccard_verify(cands, df, text_col, id_col, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """(doc_id, simhash): per-token 32-bit hash from the md5 prefix;
    signature bit i = sign of Σ_tokens (±1). Near-dup docs differ in few
    bits (compare via hamming distance / prefix buckets)."""
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(_token_set(text_col)).alias("tok"))
    hv = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    per_bit = [
        F.sum(
            F.when(F.shiftright(hv, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*per_bit)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long")
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_candidates(sig_df: DataFrame, prefix_bits: int = 16, bits: int = 32) -> DataFrame:
    """Bucket by high/low halves of the signature (two rotations): pairs
    agreeing on either half are hamming-close candidates."""
    hi = sig_df.select("doc_id", (F.shiftright("simhash", bits - prefix_bits)).alias("bucket"),
                       F.lit(0).alias("rot"))
    lo = sig_df.select(
        "doc_id",
        F.col("simhash").bitwiseAND(F.lit((1 << prefix_bits) - 1)).alias("bucket"),
        F.lit(1).alias("rot"),
    )
    banded = hi.unionByName(lo)
    left = banded.select("rot", "bucket", F.col("doc_id").alias("a"))
    right = banded.select("rot", "bucket", F.col("doc_id").alias("b"))
    return left.join(right, ["rot", "bucket"]).filter(F.col("a") < F.col("b")).select("a", "b").distinct()


# ---------------------------------------------------------------------------
# Character n-gram Jaccard (exact; small-slice verification path)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact Jaccard over distinct character n-grams for ALL pairs —
    O(N²); use only on bounded slices (the LSH pipeline is the scale
    path). Returns (a, b, jaccard rounded 4dp)."""
    grams = F.array_distinct(
        F.expr(f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)), "
               f"i -> substring({text_col}, i, {n}))")
    )
    sets = df.select(F.col(id_col).alias("doc_id"), grams.alias("g"))
    sa = sets.select(F.col("doc_id").alias("a"), F.col("g").alias("ga"))
    sb = sets.select(F.col("doc_id").alias("b"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size(F.array_union("ga", "gb")).cast("double")
    return (
        sa.crossJoin(sb)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
