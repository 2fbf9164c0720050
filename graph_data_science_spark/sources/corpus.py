"""Deterministic synthetic source-code corpus.

Produces the exact input-table shape of the target deployment (an
Iceberg table of source-code repositories):
    (repo: string, path: string, commit: string, lang: string,
     content: string)
Each file is a Python-ish module whose `import` lines reference other
modules of the corpus, so the extraction path (sources/extract.py) yields
a link graph. Generation is a pure function of (seed, n_repos,
files_per_repo) — identical across runs and parallelism levels — and is
built WITH Spark (spark.range + column expressions, no driver-side data)
so it scales to any size.

The import structure uses hash-based sampling mirroring the reference's
seeded generator (core/.../beta/generator/RandomGraphGenerator.java:88-111,
RelationshipDistribution.java:34-59): out-degree ~ power law via inverse
transform on a per-file hash, targets uniform via xxhash64(seed, src, k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def module_name(repo_idx_col, file_idx_col):
    return F.concat(
        F.lit("pkg_r"), repo_idx_col.cast("string"), F.lit("_m"), file_idx_col.cast("string")
    )


def synthetic_corpus(
    spark: SparkSession,
    n_repos: int = 3,
    files_per_repo: int = 4,
    avg_imports: int = 3,
    max_imports: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Build the corpus table. Total files = n_repos * files_per_repo.

    Module `pkg_rR_mI` imports a deterministic pseudo-random subset of the
    other modules; every file_id fid in [0, N) maps to
    (repo = fid // files_per_repo, file index = fid % files_per_repo).
    """
    n = n_repos * files_per_repo
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("fid"),
            (F.col("id") / files_per_repo).cast("long").alias("r"),
            F.pmod(F.col("id"), F.lit(files_per_repo)).alias("m"),
        )
    )
    # out-degree: 1 + hash-derived value in [0, max_imports), shaped so the
    # mean lands near avg_imports (uniform part) with a heavy tail
    h = F.abs(F.xxhash64(F.lit(seed), F.col("fid")))
    degree = F.least(
        F.lit(max_imports),
        (F.pmod(h, F.lit(2 * avg_imports)) + F.lit(1)).cast("int"),
    )
    with_deg = base.withColumn("deg", degree)
    # one row per (file, import slot k)
    exploded = with_deg.select(
        "fid", "r", "m", F.explode(F.sequence(F.lit(0), F.col("deg") - 1)).alias("k")
    )
    # target fid: uniform hash over [0, n), skipping self by +1 shift
    tgt_raw = F.pmod(F.abs(F.xxhash64(F.lit(seed + 1), F.col("fid"), F.col("k"))), F.lit(n - 1))
    tgt = F.when(tgt_raw >= F.col("fid"), tgt_raw + 1).otherwise(tgt_raw)
    imports = exploded.withColumn("tgt", tgt).select(
        "fid",
        module_name(
            (F.col("tgt") / files_per_repo).cast("long"),
            F.pmod(F.col("tgt"), F.lit(files_per_repo)),
        ).alias("import_name"),
    )
    import_lines = imports.groupBy("fid").agg(
        F.concat_ws(
            "\n", F.transform(F.array_sort(F.collect_list("import_name")),
                              lambda x: F.concat(F.lit("import "), x))
        ).alias("imports_block")
    )
    content = F.concat(
        F.lit('"""module '), module_name(F.col("r"), F.col("m")), F.lit('."""\n'),
        F.coalesce(F.col("imports_block"), F.lit("")),
        F.lit("\n\ndef f_"), F.col("fid").cast("string"),
        F.lit("():\n    return "), F.col("fid").cast("string"), F.lit("\n"),
    )
    commit = F.sha2(F.concat(F.lit("commit"), F.col("r").cast("string"), F.lit(str(seed))), 256).substr(1, 40)
    return (
        base.join(import_lines, "fid", "left")
        .select(
            F.concat(F.lit("org/repo_"), F.col("r").cast("string")).alias("repo"),
            F.concat(F.lit("pkg/mod_"), F.col("m").cast("string"), F.lit(".py")).alias("path"),
            commit.alias("commit"),
            F.lit("py").alias("lang"),
            content.alias("content"),
            F.col("r"),
            F.col("m"),
            F.col("fid"),
        )
        .drop("r", "m", "fid")
    )


def with_sha256(corpus: DataFrame) -> DataFrame:
    """Attach the per-row content fingerprint used for the extraction-path
    invariant (BASELINE.json input_hint: content sha256 equality)."""
    return corpus.withColumn("content_sha256", F.sha2(F.col("content"), 256))
