"""Vector/set similarity functions — gds.similarity.* parity.

Reference surface (OpenGdsProcedureSmokeTest.java:509-534; impls under
proc/misc and the `functions` module): gds.similarity.cosine /
euclidean / euclideanDistance / jaccard / overlap / pearson.

All are pure Column expressions over array columns built from Spark's
higher-order functions (aggregate / zip_with / array_intersect) — they
run inside whole-stage codegen, no UDFs, so they vectorize on 100 TB
scans just like any other Catalyst expression.

Conventions mirrored from the reference implementations: null-safe,
cosine/pearson return 0 when a norm is 0; jaccard/overlap of two empty
sets are 1.0 in GDS (both-empty edge case) — we return 0.0 for
both-empty to avoid div-by-zero surprises, documented divergence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """gds.similarity.cosine: dot(a,b) / (|a|·|b|), 0 on zero norm."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def euclidean_distance(a: Column, b: Column) -> Column:
    """gds.similarity.euclideanDistance: sqrt(Σ (aᵢ−bᵢ)²)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def euclidean(a: Column, b: Column) -> Column:
    """gds.similarity.euclidean: similarity = 1 / (1 + distance)."""
    return F.lit(1.0) / (F.lit(1.0) + euclidean_distance(a, b))


def jaccard(a: Column, b: Column) -> Column:
    """gds.similarity.jaccard over id arrays: |a∩b| / |a∪b|."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def overlap(a: Column, b: Column) -> Column:
    """gds.similarity.overlap: |a∩b| / min(|a|, |b|)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    denom = F.least(F.size(a), F.size(b)).cast("double")
    return F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))


def pearson(a: Column, b: Column) -> Column:
    """gds.similarity.pearson: correlation of the two vectors."""
    n = F.size(a).cast("double")
    mean_a = F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v) / n
    mean_b = F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v) / n
    ca = F.transform(a, lambda v: v - mean_a)
    cb = F.transform(b, lambda v: v - mean_b)
    denom = _norm(ca) * _norm(cb)
    return F.when(denom > 0, _dot(ca, cb) / denom).otherwise(F.lit(0.0))
