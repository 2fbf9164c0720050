"""Seeded random graph generator — the Spark analogue of gds.graph.generate.

Reference: core/src/main/java/org/neo4j/gds/beta/generator/
RandomGraphGenerator.java:63,88-111 (seeded Random) with degree
distributions UNIFORM | RANDOM (gaussian) | POWER_LAW
(RelationshipDistribution.java:34-59).

Spark-first: edges are a pure function of (seed, src, k) via xxhash64 —
no RNG state, so the same graph materializes identically at any
parallelism level (local[8] vs local[32], 1 vs 1000 executors). This is
the property the scaling benchmark relies on. Generation is
embarrassingly parallel over spark.range(n) partitions and never
collects to the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph


class Distribution:
    UNIFORM = "UNIFORM"
    POWER_LAW = "POWER_LAW"


def _u01(*cols):
    """Deterministic uniform(0,1) from hashed columns (53-bit mantissa)."""
    h = F.abs(F.xxhash64(*cols))
    return (h % F.lit(1 << 53)).cast("double") / F.lit(float(1 << 53))


def random_graph(
    spark: SparkSession,
    node_count: int,
    average_degree: int,
    distribution: str = Distribution.POWER_LAW,
    seed: int = 42,
    power_law_gamma: float = 2.5,
    partitions: int | None = None,
) -> Graph:
    """Generate a directed graph with ~node_count*average_degree edges.

    POWER_LAW: out-degree via inverse-transform sampling of a Pareto tail
    (min degree 1, exponent gamma), rescaled so the mean ≈ average_degree
    — mirrors PowerLawDistribution in RelationshipDistribution.java:48-59.
    UNIFORM: degree ~ U[0, 2*average_degree] (:34-40).
    Targets are uniform over [0, n), self-loops skipped by shift.
    """
    n = node_count
    nodes = spark.range(n, numPartitions=partitions).select(F.col("id").alias("vid"))

    u = _u01(F.lit(seed), F.col("vid"))
    if distribution == Distribution.POWER_LAW:
        # Pareto with xm chosen so E[deg] = average_degree:
        # E = xm * (g-1)/(g-2) for g > 2  ->  xm = avg * (g-2)/(g-1)
        g = power_law_gamma
        xm = max(1.0, average_degree * (g - 2.0) / (g - 1.0))
        deg = F.least(
            F.lit(int(math.sqrt(n) * 10)),  # cap ultra-hubs at ~10·sqrt(n)
            F.ceil(F.lit(xm) * F.pow(F.lit(1.0) - u, F.lit(-1.0 / (g - 1.0)))).cast("long"),
        )
    elif distribution == Distribution.UNIFORM:
        deg = (u * F.lit(2 * average_degree)).cast("long")
    else:
        raise ValueError(f"unknown distribution {distribution}")

    with_deg = nodes.select("vid", deg.alias("deg")).filter(F.col("deg") > 0)
    edges = with_deg.select(
        F.col("vid").alias("src"),
        F.explode(F.sequence(F.lit(0), F.col("deg") - 1)).alias("k"),
    )
    tgt_raw = F.pmod(F.abs(F.xxhash64(F.lit(seed + 7), F.col("src"), F.col("k"))), F.lit(n - 1))
    tgt = F.when(tgt_raw >= F.col("src"), tgt_raw + 1).otherwise(tgt_raw)
    edges = edges.select("src", tgt.alias("dst"), F.lit(1.0).alias("weight"))
    return Graph(nodes=nodes, edges=edges, name=f"random_{distribution}_{n}_{seed}")
