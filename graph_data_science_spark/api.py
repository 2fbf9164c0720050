"""Top-level facade — the Python analogue of the gds.* procedure surface.

Mirrors the four result modes of every GDS procedure family
(stream / stats / mutate / write, OpenGdsProcedureSmokeTest.java:45-536):
  .stream()  -> result DataFrame
  .stats()   -> summary dict (histogram percentiles etc.,
                CommunityCompanion.java:42+)
  .mutate()  -> write the result as a node property into the catalog graph
  .write()   -> append the result to an external table path

plus .estimate() mirroring the memory-estimation surface: the
reference's composition-tree model and result columns
(MemoryEstimations.java, MemoryEstimateResult.java:31-46) rebuilt in
plans/estimation.py, extended with a Spark plan advisory (shuffle
volume per superstep, suggested partitions, broadcastability, executor
fit) — Spark's memory manager spills instead of refusing, so the
estimate's job is plan shaping, not admission control.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.catalog import GraphCatalog
from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.operators import degree as _degree
from graph_data_science_spark.operators import lpa as _lpa
from graph_data_science_spark.operators import pagerank as _pagerank
from graph_data_science_spark.operators import triangle as _triangle
from graph_data_science_spark.operators import wcc as _wcc
from graph_data_science_spark.operators import hits as _hits
from graph_data_science_spark.operators import kcore as _kcore
from graph_data_science_spark.operators import paths as _paths
from graph_data_science_spark.operators import fastrp as _fastrp
from graph_data_science_spark.operators import similarity as _similarity


@dataclass
class ModeResult:
    """Wraps an algorithm result DataFrame with the four GDS modes."""

    df: DataFrame
    value_col: str
    extra: dict[str, Any]
    catalog: GraphCatalog | None = None
    graph_name: str | None = None

    def stream(self) -> DataFrame:
        return self.df

    def stats(self, percentiles=(0.5, 0.75, 0.9, 0.95, 0.99)) -> dict[str, Any]:
        c = F.col(self.value_col).cast("double")
        row = self.df.agg(
            F.count(F.lit(1)).alias("count"),
            F.min(c).alias("min"),
            F.max(c).alias("max"),
            F.avg(c).alias("mean"),
            F.percentile_approx(c, list(percentiles)).alias("percentiles"),
        ).collect()[0]
        out = dict(self.extra)
        out.update(
            count=row["count"], min=row["min"], max=row["max"], mean=row["mean"],
            percentiles=dict(zip([f"p{int(p*100)}" for p in percentiles], row["percentiles"] or [])),
        )
        return out

    def mutate(self, property_name: str) -> None:
        if self.catalog is None or self.graph_name is None:
            raise ValueError("mutate requires a catalog-backed graph")
        self.catalog.mutate_node_property(self.graph_name, self.df, property_name)

    def write(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).parquet(path)


def _mode(df, value_col, extra, catalog=None, graph_name=None) -> ModeResult:
    return ModeResult(df=df, value_col=value_col, extra=extra, catalog=catalog,
                      graph_name=graph_name)


class Algo:
    """gds.<algo> facade bound to a Graph (optionally catalog-backed)."""

    def __init__(self, graph: Graph, catalog: GraphCatalog | None = None):
        self.graph = graph
        self.catalog = catalog

    # -- centrality -------------------------------------------------------
    def page_rank(self, **kw) -> ModeResult:
        r = _pagerank.page_rank(self.graph, **kw)
        return _mode(r.scores, "score",
                     {"ranIterations": r.ran_iterations, "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def article_rank(self, **kw) -> ModeResult:
        r = _pagerank.article_rank(self.graph, **kw)
        return _mode(r.scores, "score",
                     {"ranIterations": r.ran_iterations, "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def eigenvector(self, **kw) -> ModeResult:
        r = _pagerank.eigenvector(self.graph, **kw)
        return _mode(r.scores, "score",
                     {"ranIterations": r.ran_iterations, "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def degree(self, **kw) -> ModeResult:
        return _mode(_degree.degree_centrality(self.graph, **kw), "score", {},
                     self.catalog, self.graph.name)

    # -- community --------------------------------------------------------
    def wcc(self, **kw) -> ModeResult:
        r = _wcc.wcc(self.graph, **kw)
        comp_count = r.components.select("component").distinct().count()
        return _mode(r.components, "component",
                     {"componentCount": comp_count, "ranIterations": r.ran_iterations,
                      "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def label_propagation(self, **kw) -> ModeResult:
        r = _lpa.label_propagation(self.graph, **kw)
        n_comm = r.labels.select("label").distinct().count()
        return _mode(r.labels, "label",
                     {"communityCount": n_comm, "ranIterations": r.ran_iterations,
                      "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def louvain(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.louvain import louvain as _louvain

        r = _louvain(self.graph, **kw)
        n_comm = r.communities.select("community").distinct().count()
        return _mode(r.communities, "community",
                     {"communityCount": n_comm, "ranLevels": r.ran_levels,
                      "modularities": r.modularities, "modularity":
                      (r.modularities[-1] if r.modularities else 0.0),
                      "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def leiden(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.leiden import leiden as _leiden

        r = _leiden(self.graph, **kw)
        n_comm = r.communities.select("community").distinct().count()
        return _mode(r.communities, "community",
                     {"communityCount": n_comm, "ranLevels": r.ran_levels,
                      "modularities": r.modularities, "modularity": r.modularity,
                      "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def k1_coloring(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.k1coloring import k1_coloring as _k1

        r = _k1(self.graph, **kw)
        return _mode(r.colors, "color",
                     {"ranIterations": r.ran_iterations, "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def modularity_optimization(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.louvain import modularity_optimization

        r = modularity_optimization(self.graph, **kw)
        return _mode(r.communities, "community",
                     {"modularity": r.modularity, "ranIterations": r.ran_iterations,
                      "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def sllpa(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.sllpa import sllpa as _sllpa

        r = _sllpa(self.graph, **kw)
        return _mode(r.communities, "community_ids",
                     {"ranIterations": r.ran_iterations}, self.catalog, self.graph.name)

    def approx_max_k_cut(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.maxkcut import approx_max_k_cut as _mkc

        r = _mkc(self.graph, **kw)
        return _mode(r.assignments, "community",
                     {"cutCost": r.cut_cost, "ranIterations": r.ran_iterations},
                     self.catalog, self.graph.name)

    def kmeans(self, property_col: str, **kw) -> ModeResult:
        from graph_data_science_spark.operators.kmeans import kmeans as _km

        r = _km(self.graph.nodes, property_col, **kw)
        return _mode(r.assignments, "community",
                     {"ranIterations": r.ran_iterations, "didConverge": r.did_converge,
                      "centroids": r.centroids},
                     self.catalog, self.graph.name)

    def spanning_tree(self, start_node: int, **kw) -> ModeResult:
        from graph_data_science_spark.operators.spanningtree import spanning_tree as _st

        r = _st(self.graph, start_node, **kw)
        return _mode(r.tree, "weight",
                     {"totalWeight": r.total_weight,
                      "effectiveNodeCount": r.effective_node_count},
                     self.catalog, self.graph.name)

    def k_spanning_tree(self, start_node: int, k: int, **kw) -> ModeResult:
        from graph_data_science_spark.operators.spanningtree import k_spanning_tree as _kst

        return _mode(_kst(self.graph, start_node, k, **kw), "component", {"k": k},
                     self.catalog, self.graph.name)

    def dfs(self, source: int, **kw) -> ModeResult:
        from graph_data_science_spark.operators.traversal import dfs as _dfs

        return _mode(_dfs(self.graph, source, **kw), "visit_order", {},
                     self.catalog, self.graph.name)

    def triangle_count(self, **kw) -> ModeResult:
        r = _triangle.triangle_count(self.graph, **kw)
        return _mode(r.per_node, "triangles", {"globalTriangleCount": r.global_count},
                     self.catalog, self.graph.name)

    def local_clustering_coefficient(self) -> ModeResult:
        df = _triangle.local_clustering_coefficient(self.graph)
        return _mode(df, "coefficient", {}, self.catalog, self.graph.name)

    def hits(self, **kw) -> ModeResult:
        r = _hits.hits(self.graph, **kw)
        return _mode(r.scores, "authority",
                     {"ranIterations": r.ran_iterations, "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def betweenness(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.betweenness import betweenness as _bc

        r = _bc(self.graph, **kw)
        return _mode(r.scores, "score", {"sources": r.source_count},
                     self.catalog, self.graph.name)

    def harmonic(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.closeness import harmonic_centrality

        r = harmonic_centrality(self.graph, **kw)
        return _mode(r.scores, "score", {"pivots": len(r.pivots)},
                     self.catalog, self.graph.name)

    def closeness(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.closeness import closeness_centrality

        r = closeness_centrality(self.graph, **kw)
        return _mode(r.scores, "score", {"pivots": len(r.pivots)},
                     self.catalog, self.graph.name)

    def scc(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.scc import scc as _scc

        r = _scc(self.graph, **kw)
        return _mode(r.components, "component", {"rounds": r.rounds},
                     self.catalog, self.graph.name)

    def k_core(self, **kw) -> ModeResult:
        r = _kcore.k_core_decomposition(self.graph, **kw)
        return _mode(r.cores, "core",
                     {"ranIterations": r.ran_iterations, "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def bfs(self, source_nodes, **kw) -> ModeResult:
        r = _paths.bfs(self.graph, source_nodes, **kw)
        return _mode(r.distances, "distance",
                     {"ranIterations": r.ran_iterations}, self.catalog, self.graph.name)

    def sssp(self, source_nodes, **kw) -> ModeResult:
        r = _paths.sssp(self.graph, source_nodes, **kw)
        return _mode(r.distances, "distance",
                     {"ranIterations": r.ran_iterations}, self.catalog, self.graph.name)

    def all_shortest_paths_stream(self, **kw) -> ModeResult:
        df = _paths.all_shortest_paths_stream(self.graph, **kw)
        return _mode(df, "distance", {}, self.catalog, self.graph.name)

    def dag_topological_sort(self, **kw) -> ModeResult:
        df = _paths.topological_sort(self.graph, **kw)
        return _mode(df, "layer", {}, self.catalog, self.graph.name)

    def dag_longest_path(self, **kw) -> ModeResult:
        df = _paths.longest_path(self.graph, **kw)
        return _mode(df, "total_cost", {}, self.catalog, self.graph.name)

    def shortest_path_dijkstra(self, source, target, **kw) -> ModeResult:
        from graph_data_science_spark.operators.dijkstra import dijkstra as _dij

        r = _dij(self.graph, source, targets=[target], **kw)
        return _mode(r.paths, "total_cost",
                     {"ranIterations": r.ran_iterations, "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def all_shortest_paths_dijkstra(self, source, **kw) -> ModeResult:
        from graph_data_science_spark.operators.dijkstra import dijkstra as _dij

        r = _dij(self.graph, source, **kw)
        return _mode(r.paths, "total_cost",
                     {"ranIterations": r.ran_iterations, "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def shortest_path_yens(self, source, target, k=3, **kw) -> ModeResult:
        from graph_data_science_spark.operators.dijkstra import yens as _yens

        df = _yens(self.graph, source, target, k=k, **kw)
        return _mode(df, "total_cost", {"k": k}, self.catalog, self.graph.name)

    def shortest_path_astar(self, source, target, **kw) -> ModeResult:
        from graph_data_science_spark.operators.astar import astar as _astar

        r = _astar(self.graph, source, target, **kw)
        return _mode(r.paths, "total_cost",
                     {"ranIterations": r.ran_iterations, "didConverge": r.did_converge},
                     self.catalog, self.graph.name)

    def bellman_ford(self, source, **kw) -> ModeResult:
        from graph_data_science_spark.operators.bellmanford import bellman_ford as _bf

        r = _bf(self.graph, source, **kw)
        return _mode(r.paths, "total_cost",
                     {"ranIterations": r.ran_iterations,
                      "didConverge": r.did_converge,
                      "containsNegativeCycle": r.contains_negative_cycle},
                     self.catalog, self.graph.name)

    def steiner_tree(self, source, terminals, **kw) -> ModeResult:
        from graph_data_science_spark.operators.steiner import steiner_tree as _st

        r = _st(self.graph, source, terminals, **kw)
        return _mode(r.parents, "parent_cost",
                     {"totalWeight": r.total_cost,
                      "effectiveNodeCount": r.effective_node_count,
                      "effectiveTargetNodesCount": r.terminals_reached},
                     self.catalog, self.graph.name)

    def influence_maximization_celf(self, seed_set_size, **kw) -> ModeResult:
        from graph_data_science_spark.operators.influence import celf as _celf

        r = _celf(self.graph, seed_set_size, **kw)
        return _mode(r.seeds, "spread", {"rrSets": r.rr_sets},
                     self.catalog, self.graph.name)

    def node2vec(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.node2vec import node2vec as _n2v

        r = _n2v(self.graph, **kw)
        return _mode(r.embeddings, "embedding",
                     {"lossPerIteration": r.loss_per_iteration},
                     self.catalog, self.graph.name)

    def node_similarity(self, **kw) -> ModeResult:
        df = _similarity.node_similarity(self.graph, **kw)
        return _mode(df, "similarity", {}, self.catalog, self.graph.name)

    def knn(self, property_col: str, **kw) -> ModeResult:
        """gds.knn over an array node property (NN-Descent)."""
        df = _similarity.knn_nn_descent(self.graph.nodes, property_col, **kw)
        return _mode(df, "cosine_sim", {}, self.catalog, self.graph.name)

    def knn_filtered(self, property_col: str, **kw) -> ModeResult:
        """gds.knn.filtered — source/target node-set restricted kNN."""
        df = _similarity.filtered_knn(self.graph.nodes, property_col, **kw)
        return _mode(df, "cosine_sim", {}, self.catalog, self.graph.name)

    def node_similarity_filtered(self, **kw) -> ModeResult:
        """gds.nodeSimilarity.filtered — filters pushed before topK."""
        df = _similarity.filtered_node_similarity(self.graph, **kw)
        return _mode(df, "similarity", {}, self.catalog, self.graph.name)

    def conductance(self, communities: DataFrame) -> ModeResult:
        """gds.conductance per community over a (vid, community) frame."""
        from graph_data_science_spark.operators.modularity import conductance as _cond

        df = _cond(self.graph, communities)
        return _mode(df, "conductance", {}, self.catalog, self.graph.name)

    def sample_rwr(self, start_nodes: DataFrame, **kw) -> Graph:
        """gds.graph.sample.rwr — random-walk-with-restart subgraph."""
        from graph_data_science_spark.sources.sampling import sample_rwr as _rwr

        return _rwr(self.graph, start_nodes, **kw)

    def sample_cnarw(self, start_nodes: DataFrame, **kw) -> Graph:
        """gds.graph.sample.cnarw — common-neighbor-aware walk sample."""
        from graph_data_science_spark.sources.sampling import sample_cnarw as _cnarw

        return _cnarw(self.graph, start_nodes, **kw)

    def collapse_path(self, edge_chain: list[DataFrame], **kw) -> ModeResult:
        """gds.collapsePath — direct edges from multi-hop path templates
        (a list of edge DataFrames composed head-to-tail)."""
        from graph_data_science_spark.operators.traversal import collapse_path as _cp

        df = _cp(edge_chain, **kw)
        return _mode(df, "src", {}, self.catalog, self.graph.name)

    def fast_rp(self, **kw) -> ModeResult:
        df = _fastrp.fast_rp(self.graph, **kw)
        return _mode(df, "embedding", {}, self.catalog, self.graph.name)

    def link_prediction_train(self, embeddings: DataFrame, **kw):
        """Trained link-prediction pipeline (feature steps -> split ->
        logistic model -> AUC); returns the model object, whose
        .predict(pairs) yields (src, dst, probability)."""
        from graph_data_science_spark.ml.pipelines import link_prediction_train as _lpt

        return _lpt(self.graph, embeddings, **kw)

    def graphsage_train(self, features: DataFrame, **kw) -> ModeResult:
        from graph_data_science_spark.operators.graphsage import graphsage_train as _gst

        r = _gst(self.graph, features, **kw)
        return _mode(r.embeddings, "embedding",
                     {"lossPerEpoch": r.model.loss_per_epoch},
                     self.catalog, self.graph.name)

    def hashgnn(self, **kw) -> ModeResult:
        from graph_data_science_spark.operators.hashgnn import hashgnn as _hgnn

        r = _hgnn(self.graph, **kw)
        return _mode(r.embeddings, "embedding",
                     {"dimension": r.dimension, "iterations": len(r.metrics)},
                     self.catalog, self.graph.name)

    # -- estimate ---------------------------------------------------------
    def estimate(self, algo: str, **config: Any) -> dict[str, Any]:
        """gds.<algo>.estimate: the reference's composition-tree
        estimation (MemoryEstimations.java builders, per-algorithm
        *MemoryEstimateDefinition formulas) rendered into the same
        result columns (requiredMemory/treeView/mapView/bytesMin/
        bytesMax/nodeCount/relationshipCount/heapPercentage*) plus a
        Spark plan advisory (per-superstep shuffle bytes, suggested
        shuffle partitions, broadcastability, executor fit) — see
        plans/estimation.py. Dimensions-only; no job runs."""
        from graph_data_science_spark.plans import estimation as est

        spark = self.graph.edges.sparkSession
        heap = None
        try:
            mem = spark.conf.get("spark.driver.memory", "0")
            units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
            mem = mem.lower()
            heap = (
                int(mem[:-1]) * units[mem[-1]] if mem[-1] in units else int(mem)
            ) or None
        except Exception:
            heap = None
        res = est.estimate(
            algo,
            node_count=self.graph.node_count(),
            relationship_count=self.graph.edge_count(),
            concurrency=spark.sparkContext.defaultParallelism,
            heap_bytes=heap,
            **config,
        )
        return res.as_dict()
