"""Import-edge extraction: source-corpus table → link graph.

The Spark analogue of the reference's native projection
(native-projection/.../ScanningRecordsImporter.java:36-118: parallel
store scan → IdMap → CSR): here the "store scan" is a parquet/Iceberg
table scan (Spark FileScan partitions = the reference's scanner threads),
import parsing is `regexp_extract_all` (JVM-side, no Python), id mapping
is a row_number over distinct (repo, path) (IdMap dense ids,
core/.../api/IdMap.java:34-44), and parallel-edge aggregation mirrors
Aggregation.java:30-100.

Per-row invariant: sha256(content) computed at scan time rides alongside
every transform so downstream equality checks can verify the extraction
path never mutates content (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Aggregation, Graph
from graph_data_science_spark.plans.ranking import distributed_row_index

# `import foo.bar` / `from foo import x` style lines; captures module token
IMPORT_RE = r"(?m)^\s*import\s+([A-Za-z_][A-Za-z0-9_\.]*)"
FROM_IMPORT_RE = r"(?m)^\s*from\s+([A-Za-z_][A-Za-z0-9_\.]*)\s+import"


def extract_import_edges(
    corpus: DataFrame,
    module_of_path=None,
) -> tuple[DataFrame, DataFrame]:
    """Parse import statements and resolve them to file-level edges.

    Returns (vertices, edges):
      vertices(vid, repo, path, module, content_sha256)
      edges(src, dst, weight) — one edge per resolved import, weight 1.0.

    module_of_path: Column fn mapping (repo, path) -> module name used in
    import statements. Default matches sources/corpus.py naming
    (repo 'org/repo_R' + path 'pkg/mod_M.py' -> 'pkg_rR_mM').
    """
    if module_of_path is None:
        def module_of_path(repo, path):
            r = F.regexp_extract(repo, r"repo_(\d+)$", 1)
            m = F.regexp_extract(path, r"mod_(\d+)\.py$", 1)
            return F.concat(F.lit("pkg_r"), r, F.lit("_m"), m)

    files = corpus.select(
        "repo",
        "path",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        module_of_path(F.col("repo"), F.col("path")).alias("module"),
        F.concat(
            F.array_compact(F.regexp_extract_all(F.col("content"), F.lit(IMPORT_RE), F.lit(1))),
            F.array_compact(F.regexp_extract_all(F.col("content"), F.lit(FROM_IMPORT_RE), F.lit(1))),
        ).alias("imports"),
    )

    # dense id space ordered by (repo, path) — stable "min id" semantics for
    # WCC union-by-min parity (IdMap.java:34-44 dense mapped ids). Two-phase
    # distributed rank (plans/ranking.py): range-repartition + per-partition
    # offsets, no single-partition sort even at 10^12 files.
    vertices = distributed_row_index(files, ["repo", "path"], index_col="vid").select(
        "vid", "repo", "path", "module", "content_sha256", "imports"
    )

    module_ids = vertices.select(F.col("module").alias("imp"), F.col("vid").alias("dst"))
    edges = (
        vertices.select("vid", F.explode("imports").alias("imp"))
        .join(module_ids, "imp")  # unresolved imports (stdlib etc.) drop out
        .select(F.col("vid").alias("src"), "dst", F.lit(1.0).alias("weight"))
        .filter(F.col("src") != F.col("dst"))
    )
    return vertices.drop("imports"), edges


def build_import_graph(
    corpus: DataFrame,
    aggregation: str = Aggregation.SINGLE,
    module_of_path=None,
) -> Graph:
    """corpus → projected Graph with vertex properties attached."""
    vertices, edges = extract_import_edges(corpus, module_of_path=module_of_path)
    return Graph.from_edges(edges, nodes=vertices, aggregation=aggregation)
