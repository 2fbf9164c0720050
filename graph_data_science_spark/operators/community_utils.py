"""Community post-processing — CommunityCompanion parity.

Reference: algo/.../algorithms/community/CommunityCompanion.java:42-103:
  - consecutiveIds: remap community ids to consecutive 0..k-1 (ordered
    by community id)
  - minCommunitySize: communities smaller than the bound are dropped
    (members get null / are filtered)
  - stats histograms: percentile distribution of community sizes

Spark: two-phase distributed rank (plans/ranking.py) for the remap;
having-count filter; one percentile_approx aggregate for the histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.ranking import distributed_row_index


def consecutive_ids(df: DataFrame, community_col: str = "component") -> DataFrame:
    """Remap ids to consecutive longs 0..k-1 ordered by original id."""
    distinct = df.select(community_col).distinct()
    mapping = distributed_row_index(distinct, [community_col], index_col="_new")
    return (
        df.join(mapping, community_col)
        .drop(community_col)
        .withColumnRenamed("_new", community_col)
    )


def filter_min_community_size(
    df: DataFrame, min_size: int, community_col: str = "component"
) -> DataFrame:
    sizes = df.groupBy(community_col).agg(F.count(F.lit(1)).alias("_sz"))
    keep = sizes.filter(F.col("_sz") >= min_size).select(community_col)
    return df.join(keep, community_col, "left_semi")


def community_size_stats(
    df: DataFrame,
    community_col: str = "component",
    percentiles=(0.5, 0.75, 0.9, 0.95, 0.99),
) -> dict:
    """componentCount + size distribution (gds.wcc.stats fields)."""
    sizes = df.groupBy(community_col).agg(F.count(F.lit(1)).alias("size"))
    row = sizes.agg(
        F.count(F.lit(1)).alias("communityCount"),
        F.min("size").alias("min"),
        F.max("size").alias("max"),
        F.avg("size").alias("mean"),
        F.percentile_approx("size", list(percentiles)).alias("ps"),
    ).collect()[0]
    return {
        "communityCount": row["communityCount"],
        "min": row["min"],
        "max": row["max"],
        "mean": row["mean"],
        **{f"p{int(p * 100)}": v for p, v in zip(percentiles, row["ps"] or [])},
    }
