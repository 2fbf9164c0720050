"""Multimodal column plumbing: image/audio/video as opaque binary.

The container has no image/audio codecs, so DECODE IS STUBBED (a
deterministic fake derived from the bytes, or NotImplementedError for
the real-codec entry points) — but the Spark-side plumbing is real and
tested: schema (binary payload + typed metadata struct), partitioning
(payload-size-aware repartition so huge blobs don't skew tasks),
mapInPandas batch iteration (bounded memory per batch), and the UDF
signatures a real decoder would slot into.

At 100 TB the pattern matters more than the codec: binary columns must
flow through Arrow in bounded batches; feature extraction is
mapInPandas over those batches; metadata predicates (width/height/
duration) push down to parquet without touching the payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table with binary payloads (stands in for
    decoded-at-rest image/audio bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.unhex(F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 512)).alias("payload"),
        F.struct(
            ((F.col("id") % 16 + 1) * 32).cast("int").alias("width"),
            ((F.col("id") % 9 + 1) * 32).cast("int").alias("height"),
            ((F.col("id") % 60 + 1) * 1000).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
    return df


def decode_image(payload: bytes) -> "np.ndarray":
    """Real-codec entry point — unavailable in this container."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/libjpeg) not present "
        "in this environment; use fake_features for the plumbing path"
    )


def _fake_feature_vector(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoded-image feature extractor:
    bytes -> sha256 stream -> dim floats in [0, 1)."""
    out = np.empty(dim, dtype=np.float32)
    h = payload or b""
    i = 0
    while i < dim:
        h = hashlib.sha256(h).digest()
        take = min(dim - i, len(h) // 4)
        ints = np.frombuffer(h[: take * 4], dtype=">u4").astype(np.float64)
        out[i : i + take] = (ints / 2**32).astype(np.float32)
        i += take
    return out


def extract_features(
    media: DataFrame, dim: int = 16, batch_size: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Returns (media_id, kind, n_bytes, features array<float>). The
    iterator contract keeps memory bounded: one Arrow batch of payloads
    in flight per task regardless of blob sizes."""
    out_schema = "media_id long, kind string, n_bytes int, features array<float>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature_vector(p if p is not None else b"", dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    # payload-size-aware spread: large blobs hash-scatter across tasks
    spread = media.repartition(F.col("media_id"))
    return spread.mapInPandas(extract, schema=out_schema)


def frame_sample(media: DataFrame, every_ms: int = 10000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled
    timestamp (decode stubbed — returns frame offsets, not pixels).
    Metadata-only: never touches payload bytes, so the parquet scan
    prunes the binary column entirely."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames
