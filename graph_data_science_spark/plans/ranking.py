"""Distributed global ranking — no single-partition windows.

A global orderBy window (no partitionBy) funnels every row
through ONE task; fine at validation scale, fatal at 10^9 rows. This
module is the standard two-phase replacement used everywhere the engine
needs a global row index or dense rank:

  1. range-repartition on the order key (parallel sort-shuffle);
  2. count rows per partition — P scalar rows to the driver;
  3. broadcast the prefix-sum offsets and compute
     index = offset[partition] + intra-partition row_number.

Every window partition then holds ~n/P rows and the plan scales with the
cluster. Equal-order-key rows land in the same range partition, so the
result is deterministic whenever ``order_cols`` is a total order (callers
include a unique tiebreaker column).

Reference parity note: the reference's IdMap (core/.../IdMap.java) and
streamed result indexes are driver-sequential by construction; this is
the shuffle-engine equivalent.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_row_index(
    df: DataFrame,
    order_cols: Iterable[str],
    index_col: str = "index",
    num_partitions: int | None = None,
) -> DataFrame:
    """0-based global row index ordered by ``order_cols`` (must be a total
    order — include a unique tiebreaker). Two extra small jobs (the
    repartition materialization and the P-row count); no single-partition
    stage anywhere."""
    cols = list(order_cols)
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # checkpoint the INPUT first: repartitionByRange's boundary-sampling
    # job and the post-shuffle checkpoint below are two separate actions,
    # and without this the full upstream lineage (often an iterative BSP
    # result) is recomputed for each — measured 2x on dijkstra paths
    src = df.localCheckpoint(eager=True)
    # the post-shuffle checkpoint freezes the range-partition assignment:
    # RangePartitioning re-samples per action, so __pid would otherwise
    # not be stable between the counts action and the final plan
    ranged = (
        src.repartitionByRange(p, *[F.col(c) for c in cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    offs, acc = [], 0
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offs.append((int(r["__pid"]), acc))
        acc += int(r["c"])
    off_df = spark.createDataFrame(offs or [(0, 0)], "__pid int, __off bigint")
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in cols])
    return (
        ranged.withColumn("__rn", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), "__pid")
        .withColumn(index_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__off", "__rn")
    )


def distributed_exclusive_prefix_sum(
    df: DataFrame,
    key_col: str,
    val_col: str,
    out_col: str = "prefix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive running sum of ``val_col`` ordered by ``key_col`` (must
    be unique), distributed with the same two-phase scheme as
    distributed_row_index: range-repartition on the key, P per-partition
    sums to the driver, broadcast offsets + intra-partition window.
    Returns the input columns plus ``out_col`` = sum of val over all
    strictly-smaller keys."""
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    src = df.localCheckpoint(eager=True)
    ranged = (
        src.repartitionByRange(p, F.col(key_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = ranged.groupBy("__pid").agg(F.sum(val_col).alias("s")).collect()
    offs, acc = [], 0
    for r in sorted(sums, key=lambda r: r["__pid"]):
        offs.append((int(r["__pid"]), acc))
        acc += int(r["s"] or 0)
    off_df = spark.createDataFrame(offs or [(0, 0)], "__pid int, __off bigint")
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.withColumn("__run", F.coalesce(F.sum(val_col).over(w), F.lit(0)))
        .join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__run")).cast("long"))
        .drop("__pid", "__off", "__run")
    )


def distributed_dense_rank(
    df: DataFrame,
    key_col: str,
    rank_col: str = "_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """``dense_rank() over (order by key_col)`` minus 1, distributed:
    index the distinct keys, join the 0-based rank back."""
    keys = df.select(key_col).distinct()
    idx = distributed_row_index(keys, [key_col], index_col=rank_col, num_partitions=num_partitions)
    return df.join(idx, key_col)
