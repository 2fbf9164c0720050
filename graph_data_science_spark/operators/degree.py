"""Degree centrality.

Reference: algo/src/main/java/org/neo4j/gds/degree/DegreeCentrality.java:85-148
— orientation-dispatched (NATURAL = out-degree, REVERSE = in-degree,
UNDIRECTED = both); weighted sums POSITIVE weights only (:132-133).

Spark: one groupBy with map-side partial aggregation; isolated nodes get
0 via a left join against the node table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graph_data_science_spark.plans.graph import Graph


def degree_centrality(
    graph: Graph, weighted: bool = False, orientation: str = "NATURAL"
) -> DataFrame:
    """Returns DataFrame(vid, score: double)."""
    direction = {"NATURAL": "out", "REVERSE": "in", "UNDIRECTED": "both"}[orientation]
    return graph.degrees(weighted=weighted, direction=direction).withColumnRenamed(
        "degree", "score"
    )
