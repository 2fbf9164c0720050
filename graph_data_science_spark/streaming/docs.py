"""Structured Streaming document pipeline — the training-data operators
run continuously over arriving documents.

The reference is batch-only (its `stream` procedures are result
cursors), so like streaming/ingest.py this module is OUR extension for
the 100 TB deployment story: documents land continuously (new crawl /
commit snapshots) and the quality / language / dedup columns that gate
training-data inclusion are maintained as they arrive instead of in
nightly batch sweeps.

All the text operators (operators/text.py) are pure Column expressions
— no aggregation, no UDFs — so they apply to a streaming DataFrame
unchanged: the SAME code path is correctness-gated by the batch DuckDB
oracles (text_quality / text_langid / dedup_exact) and then reused here
verbatim. Exact dedup becomes a watermarked dropDuplicates on the
content sha256 (state-store-backed, bounded by the watermark — the
streaming analogue of the hash-groupBy keeper rule: FIRST arrival wins
instead of min doc_id, the only semantic that exists under unbounded
input). Near-dup LSH bucketing is stateless per-document and streams
too; the candidate pair-join stage is batch (stream-stream self-joins
over unbounded history are unbounded state — run it as a periodic
compaction over the sink table instead, documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, event_time timestamp"


def document_stream(
    spark: SparkSession, incoming_dir: str, watermark: str | None = "10 minutes"
) -> DataFrame:
    """Streaming DataFrame of arriving documents; with a watermark,
    replay-deduped on (doc_id, event_time). Pass watermark=None when a
    downstream stage owns the watermark (Spark disallows redefining it,
    and one stream may carry only one)."""
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(incoming_dir)
    if watermark is None:
        return stream
    return stream.withWatermark("event_time", watermark).dropDuplicates(
        ["doc_id", "event_time"]
    )


def enrich_documents(frame: DataFrame) -> DataFrame:
    """Attach the training-data gating columns — the quality features,
    language id, and content sha256 — to a document frame. Pure Column
    composition (operators/text.quality_columns / language_columns — the
    SAME expressions the batch DuckDB oracles gate), so it applies to a
    streaming frame unchanged: no join, no aggregation, no UDF."""
    from graph_data_science_spark.operators.text import (
        language_columns,
        quality_columns,
    )

    out = frame.withColumn("content_sha256", F.sha2(F.col("text"), 256))
    for name, expr in {**quality_columns(), **language_columns()}.items():
        out = out.withColumn(name, expr)
    return out


def streaming_exact_dedup(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Keep the FIRST arrival of each distinct content sha256 within the
    watermark (state-store dedup — the streaming keeper rule).

    Uses dropDuplicatesWithinWatermark (Spark >= 3.5): plain
    dropDuplicates on a non-event-time key never evicts its state-store
    entries (Spark only drops dedup state when the event-time column is
    part of the keys), so a long-running stream would grow state
    unbounded. WithinWatermark keeps first-arrival-wins semantics and
    evicts each sha entry once the watermark passes its arrival time —
    duplicates separated by more than the watermark are re-admitted,
    which the periodic batch compaction over the sink (operators/dedup)
    collapses; that trade is what "bounded state" means under
    unbounded input."""
    return (
        stream.withColumn("content_sha256", F.sha2(F.col("text"), 256))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["content_sha256"])
    )


def start_document_pipeline(
    spark: SparkSession,
    incoming_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """readStream -> dedup-by-content -> enrich -> parquet sink. Returns
    the StreamingQuery (caller awaits/stops). The sink table is the
    training-data candidate pool; periodic batch compaction runs the
    near-dup LSH pair stage over it (operators/dedup.py)."""
    # content dedup owns the single allowed watermark; byte-identical
    # replays collapse there too (same sha), so the (doc_id, event_time)
    # replay dedup is subsumed
    stream = document_stream(spark, incoming_dir, watermark=None)
    deduped = streaming_exact_dedup(stream)
    enriched = enrich_documents(deduped)
    writer = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
