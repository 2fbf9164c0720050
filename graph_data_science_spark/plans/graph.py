"""Graph data model: a pair of DataFrames (nodes, edges).

Reference semantics (Neo4j GDS, studied at /root/reference):
  - Graph = IdMap + properties + degrees + neighbor iteration
    (core/src/main/java/org/neo4j/gds/api/Graph.java:31).
  - Orientation fixed at projection time: NATURAL | REVERSE | UNDIRECTED
    (graph-projection-api/.../Orientation.java:27-46); UNDIRECTED stores
    both directions.
  - Parallel edges merged at load by an Aggregation: NONE | SINGLE | SUM |
    MIN | MAX | COUNT (graph-projection-api/.../Aggregation.java:30-100).
  - Relationship weight is a single optional double, default 1.0
    (algo/.../labelpropagation/ComputeStep.java:32).

Spark-first mapping: nodes(vid long, ...props) and edges(src long,
dst long, weight double) DataFrames. Orientation variants are derived
DataFrames (Catalyst prunes/pushes down through them); degrees are a
groupBy aggregate with map-side partial aggregation for free.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Orientation:
    NATURAL = "NATURAL"
    REVERSE = "REVERSE"
    UNDIRECTED = "UNDIRECTED"


class Aggregation:
    """Parallel-edge merge rules (Aggregation.java:30-100)."""

    NONE = "NONE"
    SINGLE = "SINGLE"
    SUM = "SUM"
    MIN = "MIN"
    MAX = "MAX"
    COUNT = "COUNT"


_AGG_EXPRS = {
    Aggregation.SINGLE: lambda: F.first("weight"),
    Aggregation.SUM: lambda: F.sum("weight"),
    Aggregation.MIN: lambda: F.min("weight"),
    Aggregation.MAX: lambda: F.max("weight"),
    Aggregation.COUNT: lambda: F.count(F.lit(1)).cast("double"),
}


@dataclass
class Graph:
    """An immutable projected graph.

    nodes: DataFrame(vid: long, ...optional property columns)
    edges: DataFrame(src: long, dst: long, weight: double)
    """

    nodes: DataFrame
    edges: DataFrame
    orientation: str = Orientation.NATURAL
    name: str | None = None

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @staticmethod
    def from_edges(
        edges: DataFrame,
        nodes: DataFrame | None = None,
        aggregation: str = Aggregation.NONE,
        orientation: str = Orientation.NATURAL,
        name: str | None = None,
    ) -> "Graph":
        """Project a graph from an edge DataFrame.

        edges needs columns (src, dst) and optionally weight (default 1.0).
        nodes defaults to distinct(src) ∪ distinct(dst). Parallel edges are
        merged per `aggregation`; orientation UNDIRECTED materializes both
        directions (reference stores both, Orientation.java:40-46).
        """
        e = edges
        if "weight" not in e.columns:
            e = e.withColumn("weight", F.lit(1.0))
        e = e.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("weight").cast("double"),
        )
        if orientation == Orientation.UNDIRECTED:
            e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
        elif orientation == Orientation.REVERSE:
            e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        if aggregation != Aggregation.NONE:
            agg = _AGG_EXPRS[aggregation]().alias("weight")
            e = e.groupBy("src", "dst").agg(agg)
        if nodes is None:
            nodes = (
                e.select(F.col("src").alias("vid"))
                .unionByName(e.select(F.col("dst").alias("vid")))
                .distinct()
            )
        else:
            nodes = nodes.withColumn("vid", F.col("vid").cast("long"))
        return Graph(nodes=nodes, edges=e, orientation=orientation, name=name)

    # ------------------------------------------------------------------
    # Views (cheap, lazy — Catalyst folds them into downstream plans)
    # ------------------------------------------------------------------
    def reverse(self) -> "Graph":
        """In-neighbor view: edges_in = swap(src, dst).

        Mirrors the reference's inverse index
        (core/.../GraphCharacteristics.java:62-70)."""
        rev = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return replace(self, edges=rev, orientation=Orientation.REVERSE)

    def to_undirected(self, aggregation: str = Aggregation.SINGLE) -> "Graph":
        """Both directions, parallel edges merged.

        Mirrors gds.graph.relationships.toUndirected
        (algo/.../undirected/ToUndirectedAlgorithmFactory.java)."""
        if self.orientation == Orientation.UNDIRECTED:
            return self
        both = self.edges.unionByName(
            self.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
        agg = _AGG_EXPRS[aggregation]().alias("weight")
        und = both.groupBy("src", "dst").agg(agg)
        return replace(self, edges=und, orientation=Orientation.UNDIRECTED)

    def filter_nodes(self, predicate) -> "Graph":
        """Subgraph by node predicate; edges restricted to kept endpoints.

        Mirrors gds.graph.filter (subgraph-filtering/.../GraphStoreFilter.java);
        the predicate DSL (Expression.java:62-458) maps to a Spark SQL
        expression string — Catalyst parses and optimizes it."""
        kept = self.nodes.filter(predicate)
        kept_ids = kept.select("vid")
        e = (
            self.edges.join(kept_ids.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(kept_ids.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            .select("src", "dst", "weight")
        )
        return replace(self, nodes=kept, edges=e)

    def filter_edges(self, predicate) -> "Graph":
        """Subgraph by relationship predicate (RelationshipsFilter.java)."""
        return replace(self, edges=self.edges.filter(predicate))

    # ------------------------------------------------------------------
    # Degrees (DegreeCentrality.java:85-148)
    # ------------------------------------------------------------------
    def degrees(self, weighted: bool = False, direction: str = "out") -> DataFrame:
        """Per-node degree over ALL nodes (0 for isolated nodes).

        weighted sums POSITIVE weights only (DegreeCentrality.java:132-133).
        direction: out | in | both (both = undirected accumulation).
        Returns DataFrame(vid, degree: double).
        """
        if direction == "out":
            e = self.edges.select(F.col("src").alias("vid"), "weight")
        elif direction == "in":
            e = self.edges.select(F.col("dst").alias("vid"), "weight")
        else:
            e = self.edges.select(F.col("src").alias("vid"), "weight").unionByName(
                self.edges.select(F.col("dst").alias("vid"), "weight")
            )
        if weighted:
            deg = (
                e.filter(F.col("weight") > 0)
                .groupBy("vid")
                .agg(F.sum("weight").alias("degree"))
            )
        else:
            deg = e.groupBy("vid").agg(F.count(F.lit(1)).cast("double").alias("degree"))
        return (
            self.nodes.select("vid")
            .join(deg, "vid", "left")
            .select("vid", F.coalesce("degree", F.lit(0.0)).alias("degree"))
        )

    # ------------------------------------------------------------------
    # Stats
    # ------------------------------------------------------------------
    def node_count(self) -> int:
        return self.nodes.count()

    def edge_count(self) -> int:
        return self.edges.count()

    def persist(self) -> "Graph":
        self.nodes.persist()
        self.edges.persist()
        return self

    def unpersist(self) -> "Graph":
        self.nodes.unpersist()
        self.edges.unpersist()
        return self
