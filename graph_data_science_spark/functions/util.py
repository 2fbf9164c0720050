"""Utility functions — gds.util.* / gds.version parity.

Reference: OpenGdsProcedureSmokeTest.java:509-534 (gds.util.NaN,
infinity, isFinite, isInfinite, nodeProperty; gds.alpha.ml.oneHotEncoding;
gds.version). All map to built-in Spark SQL expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gds_nan() -> Column:
    return F.lit(float("nan"))


def gds_infinity() -> Column:
    return F.lit(float("inf"))


def gds_is_finite(c: Column) -> Column:
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def gds_is_infinite(c: Column) -> Column:
    return F.abs(c) == F.lit(float("inf"))


def one_hot_encoding(available: Column, selected: Column) -> Column:
    """gds.alpha.ml.oneHotEncoding(availableValues, selectedValues) ->
    array<long> of 0/1 flags per available value."""
    return F.transform(
        available, lambda v: F.when(F.array_contains(selected, v), 1).otherwise(0).cast("long")
    )


def node_property(nodes: DataFrame, vid: int, prop: str):
    """gds.util.nodeProperty equivalent: point lookup."""
    row = nodes.filter(F.col("vid") == vid).select(prop).collect()
    return row[0][0] if row else None


def version() -> str:
    from graph_data_science_spark import __version__

    return __version__
