"""Extraction path: corpus → import edges, with the sha256 invariant
(BASELINE.json input_hint: per-row content sha256 equality)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.pagerank import page_rank
from graph_data_science_spark.operators.wcc import wcc
from graph_data_science_spark.sources.corpus import synthetic_corpus, with_sha256
from graph_data_science_spark.sources.extract import build_import_graph, extract_import_edges


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_corpus(spark, n_repos=3, files_per_repo=4, seed=42).persist()


def test_corpus_shape(spark, corpus):
    rows = corpus.collect()
    assert len(rows) == 12
    assert set(corpus.columns) == {"repo", "path", "commit", "lang", "content"}
    assert all(len(r["commit"]) == 40 for r in rows)
    assert all(r["lang"] == "py" for r in rows)


def test_corpus_deterministic(spark):
    a = synthetic_corpus(spark, 3, 4, seed=42).orderBy("repo", "path").collect()
    b = synthetic_corpus(spark, 3, 4, seed=42).orderBy("repo", "path").collect()
    assert a == b
    c = synthetic_corpus(spark, 3, 4, seed=43).orderBy("repo", "path").collect()
    assert a != c


def test_sha256_invariant_through_extraction(spark, corpus):
    """sha256 computed by Spark == sha256 recomputed in Python on the
    content that flowed through the full extraction pipeline."""
    expected = {
        (r["repo"], r["path"]): hashlib.sha256(r["content"].encode()).hexdigest()
        for r in corpus.collect()
    }
    vertices, _ = extract_import_edges(with_sha256(corpus))
    got = {(r["repo"], r["path"]): r["content_sha256"] for r in vertices.collect()}
    assert got == expected


def test_edges_match_import_statements(spark, corpus):
    vertices, edges = extract_import_edges(corpus)
    vmap = {r["vid"]: r["module"] for r in vertices.collect()}
    contents = {r["module"]: r for r in
                vertices.join(corpus, ["repo", "path"]).collect()}
    for e in edges.collect():
        src_mod, dst_mod = vmap[e["src"]], vmap[e["dst"]]
        assert f"import {dst_mod}" in contents[src_mod]["content"]


def test_graph_runs_algorithms_end_to_end(spark, corpus):
    g = build_import_graph(corpus)
    pr = page_rank(g, max_iterations=5)
    assert pr.scores.count() == 12
    cc = wcc(g)
    assert cc.components.count() == 12


def test_dense_ids_are_contiguous(spark, corpus):
    vertices, _ = extract_import_edges(corpus)
    vids = sorted(r["vid"] for r in vertices.collect())
    assert vids == list(range(12))
