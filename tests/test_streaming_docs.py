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


BASE_DOC = "the quick brown fox jumps over the lazy dog and it is fine today friends"
NEAR_DOC = "the quick brown fox jumps over the lazy dog and it is fine today people"
# deterministic: BASE/NEAR share LSH band 0 under the compaction defaults
# (md5 string-min minhash, num_hashes=8, bands=2) and token-Jaccard 0.867


def _write_doc_batch_at(spark, path, docs, ts):
    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "event_time", F.lit(ts).cast("timestamp")
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_compact_near_duplicates_cross_batch(spark, tmp_path):
    """Stream two batches, then run the periodic compaction: the near-dup
    pair that spans the two batches (never co-resident in stream state)
    is found by the batch LSH pair-join over the sink, and the second
    incremental run only probes with post-watermark docs."""
    from graph_data_science_spark.streaming.docs import compact_near_duplicates

    incoming = str(tmp_path / "incoming")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "compaction_state")

    _write_doc_batch_at(
        spark, incoming,
        [(0, BASE_DOC), (1, "der hund ist nicht ein fuchs und das ist gut")],
        "2026-01-01 00:00:00",
    )
    q = start_document_pipeline(spark, incoming, out, ckpt)
    q.awaitTermination(120)

    # first compaction: no near-dups within batch 1; advances watermark
    first = compact_near_duplicates(spark, out, state_dir=state)
    assert first.count() == 0

    _write_doc_batch_at(
        spark, incoming,
        [(10, NEAR_DOC), (11, "zzz 123 !!!")],
        "2026-01-01 00:05:00",
    )
    q = start_document_pipeline(spark, incoming, out, ckpt)
    q.awaitTermination(120)

    # incremental compaction probes only the new docs (10, 11) against
    # the full pool and finds the cross-batch pair (0, 10)
    pairs = compact_near_duplicates(spark, out, state_dir=state).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(0, 10)}
    assert all(r["jaccard"] >= 0.5 for r in pairs)

    # third run with no new docs: empty, cheaply
    assert compact_near_duplicates(spark, out, state_dir=state).count() == 0
