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
compaction over the sink table instead: compact_near_duplicates below).
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


def compact_near_duplicates(
    spark: SparkSession,
    sink_dir: str,
    state_dir: str | None = None,
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The periodic batch near-dup compaction over the streaming sink
    table — the pair-join stage that deliberately does NOT run inside
    the stream (a stream-stream self-join over unbounded history is
    unbounded state; see module docstring).

    Reuses the batch-gated LSH machinery verbatim (operators/dedup:
    minhash_signatures -> band buckets -> jaccard_verify), so the
    compaction inherits the dedup_minhash_lsh oracle's correctness.

    Incremental: when state_dir is given, the previous compaction's
    event-time high-watermark is loaded and candidate generation is
    restricted to pairs touching at least one NEW document (arrival
    after the watermark) — new-side band rows join the full pool's band
    buckets, so per-run cost is O(new x bucket density), not O(pool^2),
    and cross-batch near-dups are still found (old<->new pairs survive;
    old<->old pairs were emitted by earlier runs). The watermark is
    advanced afterwards. Returns (a, b, jaccard) verified pairs.
    """
    import json
    import os

    from graph_data_science_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    pool = spark.read.parquet(sink_dir)
    since = None
    state_path = None
    if state_dir is not None:
        state_path = os.path.join(state_dir, "_compaction_state.json")
        if os.path.exists(state_path):
            with open(state_path) as f:
                since = json.load(f).get("max_event_time")

    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(pool, text_col, id_col, num_hashes)
    if since is None:
        cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    else:
        new_ids = (
            pool.filter(F.col("event_time") > F.lit(since).cast("timestamp"))
            .select(F.col(id_col).alias("doc_id"))
            .distinct()
        )
        banded = []
        for b in range(bands):
            sl = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
            banded.append(
                sigs.select(
                    "doc_id",
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws("|", sl)).alias("bucket"),
                )
            )
        all_banded = banded[0]
        for extra in banded[1:]:
            all_banded = all_banded.unionByName(extra)
        new_banded = all_banded.join(new_ids, "doc_id", "left_semi")
        probe = new_banded.select("band", "bucket", F.col("doc_id").alias("a"))
        base = all_banded.select("band", "bucket", F.col("doc_id").alias("b"))
        cands = (
            probe.join(base, ["band", "bucket"])
            .filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .distinct()
        )
    pairs = jaccard_verify(cands, pool, text_col, id_col, threshold)

    if state_path is not None:
        hi = pool.agg(F.max("event_time").alias("m")).collect()[0]["m"]
        os.makedirs(state_dir, exist_ok=True)
        # materialize the result BEFORE advancing the watermark: a crash
        # mid-compaction must re-run, not silently skip, this window
        pairs = pairs.localCheckpoint(eager=True)
        if hi is not None:
            with open(state_path, "w") as f:
                json.dump({"max_event_time": hi.isoformat()}, f)
    return pairs


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
