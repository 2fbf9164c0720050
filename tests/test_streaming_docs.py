"""Streaming document pipeline: readStream -> content dedup -> enrich
-> parquet sink, with the enrichment expressions shared verbatim with
the batch (oracle-gated) operators."""

from pyspark.sql import functions as F

from graph_data_science_spark.operators import text as tx
from graph_data_science_spark.streaming.docs import (
    enrich_documents,
    start_document_pipeline,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and it is fine"),
    (1, "der hund ist nicht ein fuchs und das ist gut"),
    (2, "the quick brown fox jumps over the lazy dog and it is fine"),  # dup of 0
    (3, "zzz 123 !!!"),
]


def _write_doc_batch(spark, path, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "event_time", F.current_timestamp()
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_document_pipeline_end_to_end(spark, tmp_path):
    incoming = str(tmp_path / "incoming")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")
    _write_doc_batch(spark, incoming, DOCS)
    q = start_document_pipeline(spark, incoming, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # doc 2 is a byte-identical duplicate of doc 0 -> content dedup keeps one
    assert got.count() == 3
    assert got.select("content_sha256").distinct().count() == 3
    kept = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert 1 in kept and 3 in kept and len(kept & {0, 2}) == 1

    # the streamed enrichment columns equal the batch operators' values
    batch = spark.createDataFrame(
        [d for d in DOCS if d[0] in kept], "doc_id long, text string"
    )
    want_q = {r["doc_id"]: r["quality"] for r in tx.quality_score(batch).collect()}
    want_l = {r["doc_id"]: r["pred_lang"] for r in tx.language_id(batch).collect()}
    for r in got.collect():
        assert r["quality"] == want_q[r["doc_id"]]
        assert r["pred_lang"] == want_l[r["doc_id"]]
    langs = {r["doc_id"]: r["pred_lang"] for r in got.collect()}
    assert langs[1] == "de" and langs[3] == "und"


def test_enrich_documents_batch_parity(spark):
    """enrich_documents on a batch frame reproduces the oracle-gated
    quality_score / language_id columns exactly."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string").withColumn(
        "event_time", F.current_timestamp()
    )
    enriched = enrich_documents(df)
    q = {r["doc_id"]: (r["quality"], r["stopword_ratio"]) for r in enriched.collect()}
    want = {
        r["doc_id"]: (r["quality"], r["stopword_ratio"])
        for r in tx.quality_score(df.select("doc_id", "text")).collect()
    }
    assert q == want
