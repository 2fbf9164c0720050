"""Score scalers applied post-algorithm.

Reference: algo-common/src/main/java/org/neo4j/gds/scaling/*.java, applied
at PageRankAlgorithm.java:84-110. Each scaler is one global aggregate
(broadcast back as a literal) + a projection — Catalyst keeps the whole
thing JVM-side; the aggregate is a single cheap job.

Semantics (from the reference scaleProperty implementations):
  max:      v / max(|v|)                       (Max.java)
  mean:     (v - avg) / (max - min)            (Mean.java)
  minmax:   (v - min) / (max - min)            (MinMax.java)
  stdscore: (v - avg) / stddev_pop             (StdScore.java)
  l1norm:   v / sum(|v|)                       (L1Norm.java)
  l2norm:   v / sqrt(sum(v^2))                 (L2Norm.java)
  center:   v - avg                            (Center.java)
  log:      log(v + offset)                    (LogScaler.java)
Zero denominators degrade to identity (reference guards CLOSE_TO_ZERO).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CLOSE_TO_ZERO = 1e-15


def apply_scaler(df: DataFrame, col: str, scaler: str | None, log_offset: float = 0.0) -> DataFrame:
    if scaler is None or scaler.lower() in ("none",):
        return df
    s = scaler.lower()
    c = F.col(col)
    if s == "log":
        return df.withColumn(col, F.log(c + F.lit(log_offset)))

    if s == "max":
        agg = df.agg(F.max(F.abs(c)).alias("a")).collect()[0]
        denom = agg["a"] or 0.0
        return df.withColumn(col, c / F.lit(denom) if abs(denom) > _CLOSE_TO_ZERO else c)
    if s == "l1norm":
        agg = df.agg(F.sum(F.abs(c)).alias("a")).collect()[0]
        denom = agg["a"] or 0.0
        return df.withColumn(col, c / F.lit(denom) if abs(denom) > _CLOSE_TO_ZERO else c)
    if s == "l2norm":
        agg = df.agg(F.sqrt(F.sum(c * c)).alias("a")).collect()[0]
        denom = agg["a"] or 0.0
        return df.withColumn(col, c / F.lit(denom) if abs(denom) > _CLOSE_TO_ZERO else c)
    if s in ("mean", "minmax", "stdscore", "center"):
        agg = df.agg(
            F.avg(c).alias("avg"),
            F.min(c).alias("mn"),
            F.max(c).alias("mx"),
            F.stddev_pop(c).alias("sd"),
        ).collect()[0]
        avg, mn, mx, sd = (agg["avg"] or 0.0, agg["mn"] or 0.0, agg["mx"] or 0.0, agg["sd"] or 0.0)
        if s == "center":
            return df.withColumn(col, c - F.lit(avg))
        if s == "mean":
            diff = mx - mn
            return df.withColumn(col, (c - F.lit(avg)) / F.lit(diff) if abs(diff) > _CLOSE_TO_ZERO else c - F.lit(avg))
        if s == "minmax":
            diff = mx - mn
            return df.withColumn(col, (c - F.lit(mn)) / F.lit(diff) if abs(diff) > _CLOSE_TO_ZERO else F.lit(0.0))
        if s == "stdscore":
            return df.withColumn(col, (c - F.lit(avg)) / F.lit(sd) if abs(sd) > _CLOSE_TO_ZERO else F.lit(0.0))
    raise ValueError(f"unknown scaler: {scaler}")
