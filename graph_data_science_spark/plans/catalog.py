"""GraphCatalog — named persisted graphs.

Reference: GraphStoreCatalog (core/.../core/loading/GraphStoreCatalog.java)
is an in-memory per-user registry of projected graphs; GraphStore
supports mutate-mode property addition (GraphStore.java:46,125,168,176).

Spark mapping: a catalog directory where each graph is a pair of parquet
tables (nodes/, edges/) + a metadata.json manifest. "mutate" writes a new
node-property column as a separate table version (copy-on-write — the
same model Iceberg snapshots give on a cluster; parquet-dir layout keeps
the contract sandbox-friendly). Procedures mirrored: gds.graph.project,
.list, .exists, .drop, .filter, gds.graph.nodeProperties.write/stream.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Aggregation, Graph, Orientation


class GraphCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    # -- gds.graph.project ------------------------------------------------
    def project(
        self,
        name: str,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        aggregation: str = Aggregation.NONE,
        orientation: str = Orientation.NATURAL,
        overwrite: bool = False,
    ) -> Graph:
        if self.exists(name) and not overwrite:
            raise ValueError(f"graph '{name}' already exists")
        g = Graph.from_edges(edges, nodes=nodes, aggregation=aggregation, orientation=orientation)
        d = self._dir(name)
        g.edges.write.mode("overwrite").parquet(os.path.join(d, "edges"))
        g.nodes.write.mode("overwrite").parquet(os.path.join(d, "nodes"))
        meta = {
            "name": name,
            "orientation": orientation,
            "aggregation": aggregation,
            "created_at": time.time(),
            "node_properties": [c for c in g.nodes.columns if c != "vid"],
        }
        with open(os.path.join(d, "metadata.json"), "w") as fh:
            json.dump(meta, fh)
        return self.get(name)

    # -- gds.graph.project.cypher analogue: arbitrary SQL projection ------
    def project_sql(self, name: str, edge_sql: str, node_sql: str | None = None, **kw) -> Graph:
        edges = self.spark.sql(edge_sql)
        nodes = self.spark.sql(node_sql) if node_sql else None
        return self.project(name, edges, nodes=nodes, **kw)

    def get(self, name: str) -> Graph:
        d = self._dir(name)
        with open(os.path.join(d, "metadata.json")) as fh:
            meta = json.load(fh)
        return Graph(
            nodes=self.spark.read.parquet(os.path.join(d, "nodes")),
            edges=self.spark.read.parquet(os.path.join(d, "edges")),
            orientation=meta["orientation"],
            name=name,
        )

    # -- gds.graph.list / exists / drop -----------------------------------
    def list(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.root)):
            mp = os.path.join(self.root, name, "metadata.json")
            if os.path.exists(mp):
                with open(mp) as fh:
                    out.append(json.load(fh))
        return out

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name), "metadata.json"))

    def drop(self, name: str) -> bool:
        if not self.exists(name):
            return False
        shutil.rmtree(self._dir(name))
        return True

    # -- gds.graph.filter --------------------------------------------------
    def filter(self, name: str, from_graph: str, node_filter: str | None = None,
               edge_filter: str | None = None) -> Graph:
        g = self.get(from_graph)
        if node_filter:
            g = g.filter_nodes(F.expr(node_filter))
        if edge_filter:
            g = g.filter_edges(F.expr(edge_filter))
        return self.project(name, g.edges, nodes=g.nodes, orientation=g.orientation)

    # -- mutate mode: write a computed property back -----------------------
    def mutate_node_property(self, name: str, values: DataFrame, property_name: str) -> Graph:
        """values: DataFrame(vid, <property column>). Copy-on-write of the
        nodes table (GraphStore.addNodeProperty semantics)."""
        g = self.get(name)
        val_col = [c for c in values.columns if c != "vid"][0]
        new_nodes = g.nodes.join(
            values.select("vid", F.col(val_col).alias(property_name)), "vid", "left"
        )
        d = self._dir(name)
        tmp = os.path.join(d, "nodes_new")
        new_nodes.write.mode("overwrite").parquet(tmp)
        old = os.path.join(d, "nodes")
        shutil.rmtree(old)
        os.rename(tmp, old)
        mp = os.path.join(d, "metadata.json")
        with open(mp) as fh:
            meta = json.load(fh)
        meta.setdefault("node_properties", []).append(property_name)
        with open(mp, "w") as fh:
            json.dump(meta, fh)
        return self.get(name)

    # -- gds.graph.nodeProperties.stream -----------------------------------
    def stream_node_properties(self, name: str, properties: list[str]) -> DataFrame:
        return self.get(name).nodes.select("vid", *properties)
