"""Seeded random graph generator: determinism across parallelism levels
(the property the N-vs-4N scaling benchmark depends on) + distribution
shape (RandomGraphGenerator.java:88-111 analogue)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.sources.generator import Distribution, random_graph


def edge_set(g):
    return {(r["src"], r["dst"]) for r in g.edges.collect()}


def test_deterministic_across_partitioning(spark):
    a = random_graph(spark, 500, 4, seed=42, partitions=2)
    b = random_graph(spark, 500, 4, seed=42, partitions=16)
    assert edge_set(a) == edge_set(b)


def test_seed_changes_graph(spark):
    a = random_graph(spark, 500, 4, seed=42)
    b = random_graph(spark, 500, 4, seed=43)
    assert edge_set(a) != edge_set(b)


def test_average_degree_roughly_matches(spark):
    g = random_graph(spark, 2000, 6, distribution=Distribution.UNIFORM, seed=42)
    m = g.edges.count()
    assert 0.6 * 6 * 2000 <= m <= 1.4 * 6 * 2000


def test_power_law_has_heavy_tail(spark):
    g = random_graph(spark, 5000, 8, distribution=Distribution.POWER_LAW, seed=42)
    degs = [r["d"] for r in
            g.edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).collect()]
    degs.sort(reverse=True)
    # hubs far above the mean exist; median stays low
    assert degs[0] > 8 * 8
    assert degs[len(degs) // 2] <= 8


def test_no_self_loops(spark):
    g = random_graph(spark, 300, 5, seed=42)
    assert g.edges.filter(F.col("src") == F.col("dst")).count() == 0
