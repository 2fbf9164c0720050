"""Lineage truncation for iterative DataFrame loops.

`DataFrame.localCheckpoint(eager=True)` truncates the LOGICAL plan to a
LogicalRDD — but Spark carries the checkpointed plan's STATISTICS into
that LogicalRDD (originStats). Catalyst's size-only stats estimator
multiplies child sizes through joins, so an iterative algorithm whose
step references its state k>1 times compounds sizeInBytes
double-exponentially: bits(size) ~ k^rounds. Measured here: a 3-reference
loop grows 30 -> 87 -> 259 -> 776 -> 2326 -> 6976 bits in 6 rounds, and
Louvain's color sweeps drove the driver into minutes of
BigInteger.multiplyToomCook3 inside JoinSelection/AQE stats estimation.

cut_lineage() fixes this: checkpoint, then rebuild the DataFrame from
the checkpointed RDD via SparkSession.internalCreateDataFrame (a
package-private Scala API, public at the bytecode level, the same path
data-source scans use). The rebuilt LogicalRDD has NO origin stats, so
its size falls back to spark.sql.defaultSizeInBytes — bounded per round,
no compounding. Single-reference loops (PageRank's engine) only grow
linearly (~11 bits/superstep measured) and don't need this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """Eagerly materialize df and return a stats-reset, plan-truncated
    DataFrame backed by the checkpointed RDD (no recomputation)."""
    spark = df.sparkSession
    ck = df.localCheckpoint(eager=True)
    jdf = spark._jsparkSession.internalCreateDataFrame(
        ck._jdf.queryExecution().toRdd(), df._jdf.schema(), False
    )
    return DataFrame(jdf, spark)
