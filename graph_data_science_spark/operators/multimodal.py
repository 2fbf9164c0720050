"""Multimodal column plumbing: image/audio/video as opaque binary.

Image decode is REAL for uncompressed BMP (header math) and 8-bit
truecolor PNG (stdlib zlib inflate + the five row predictors) — no
codec library needed. JPEG (DCT + Huffman) and audio/video codecs are
the remaining stubs: those entry points raise a clear ValueError /
return deterministic fakes, while the Spark-side plumbing stays real
and tested: schema (binary payload + typed metadata struct),
partitioning (payload-size-aware repartition so huge blobs don't skew
tasks), mapInPandas batch iteration (bounded memory per batch), and
the UDF signatures a full codec would slot into.

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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> "np.ndarray":
    """Decode an 8-bit non-interlaced truecolor PNG (color type 2 RGB or
    6 RGBA) to an (H, W, 3|4) uint8 array — stdlib zlib inflate + the
    five per-row predictors (None/Sub/Up/Average/Paeth) from the PNG
    spec, no codec library.

    Up (2) unfilters vectorized (uint8 wraparound IS the spec's mod-256
    add); Sub/Average/Paeth are sequential in the pixel recurrence by
    definition, fine for the bounded mapInPandas batches this feeds.
    Unsupported variants (palette, 16-bit, interlaced) raise loudly."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = bytes(payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or ctype not in (2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant: depth={depth} color_type={ctype} "
            f"interlace={interlace} (8-bit RGB/RGBA non-interlaced only)"
        )
    ch = 3 if ctype == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG: inflated stream shorter than H*(W*ch+1)")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(h):
        f = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        off += 1 + stride
        if f == 0:
            cur = row
        elif f == 2:
            cur = row + prev  # uint8 wraparound = mod-256 add
        elif f == 1:
            cur = row
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif f == 3:
            cur = row
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:
            cur = row
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                cur[x] = (int(row[x]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f} on row {y}")
        img[y] = cur
        prev = cur
    return img.reshape(h, w, ch)


def encode_png(img: "np.ndarray", row_filters: list[int] | None = None) -> bytes:
    """Inverse of decode_png for tests/synthesis: (H, W, 3|4) uint8 ->
    8-bit truecolor PNG. row_filters optionally forces a specific
    predictor per row (default all-0/None) so tests can exercise every
    unfilter path against a known array."""
    import struct
    import zlib

    h, w, ch = img.shape
    ctype = 2 if ch == 3 else 6
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.uint8)
    filters = row_filters or [0] * h
    parts = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur, f = flat[y], filters[y]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(ch, np.uint8), cur[:-ch]])
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            left = np.concatenate([np.zeros(ch, np.uint8), cur[:-ch]])
            enc = cur - ((left.astype(np.uint16) + prev) >> 1).astype(np.uint8)
        elif f == 4:
            enc = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                enc[x] = (int(cur[x]) - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        parts.append(bytes([f]) + enc.tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(parts))
    return _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an uncompressed 24/32-bit BMP or an 8-bit truecolor PNG to
    an (H, W, 3|4) uint8 array — pure Python/numpy/zlib, no codec
    library. BMP needs only header math (BITMAPINFOHEADER, bottom-up
    rows, 4-byte row padding); PNG is zlib inflate + the five row
    predictors (decode_png). JPEG still needs an external codec (DCT +
    Huffman) and raises ValueError with a clear message instead of
    silently guessing."""
    if payload is None or len(payload) < 54:
        raise ValueError("not a BMP/PNG: payload shorter than the minimum header")
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] != b"BM":
        head = bytes(payload[:4])
        raise ValueError(
            f"unsupported image format (magic {head!r}): uncompressed BMP and "
            "8-bit truecolor PNG decode without a codec library; JPEG needs "
            "PIL/libjpeg"
        )
    data_offset = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    bytes_px = bpp // 8
    row_stride = (width * bytes_px + 3) & ~3  # rows pad to 4 bytes
    need = data_offset + row_stride * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(payload)}")
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_stride * height,
                        offset=data_offset)
    rows = raw.reshape(height, row_stride)[:, : width * bytes_px]
    img = rows.reshape(height, width, bytes_px)
    if bottom_up:
        img = img[::-1]
    # BMP stores BGR(A); return RGB
    return np.ascontiguousarray(img[:, :, 2::-1])


def encode_bmp(img: "np.ndarray") -> bytes:
    """Inverse of decode_image for tests/synthesis: (H, W, 3) uint8 RGB
    -> 24-bit bottom-up BMP bytes."""
    h, w, _ = img.shape
    row_stride = (w * 3 + 3) & ~3
    body = np.zeros((h, row_stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    size = 54 + len(data)
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


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

    # payload-size-aware spread (a plain hash repartition skews task
    # bytes when 1 KB and 1 GB blobs share a table): rank rows by
    # descending payload size with the distributed two-phase index, then
    # round-robin the rank across partitions — the P largest blobs land
    # in P different tasks, the next P again, so per-task byte totals are
    # near-balanced (LPT-style). The ranking runs over the 2-column
    # (media_id, size) projection ONLY — ranking the payload rows
    # themselves would localCheckpoint + range-shuffle the blob bytes
    # twice inside distributed_row_index; with the bin joined back,
    # payload bytes move in exactly one exchange (the repartitionByRange).
    from graph_data_science_spark.plans.ranking import distributed_row_index

    spark = media.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sizes = media.select(
        "media_id", (-F.coalesce(F.length("payload"), F.lit(0))).alias("_negsz")
    )
    ranked = distributed_row_index(sizes, ["_negsz", "media_id"], index_col="_szrank")
    bins = ranked.select(
        "media_id", F.pmod(F.col("_szrank"), F.lit(n_part)).alias("_bin")
    )
    # broadcast the (media_id, bin) map so the join leaves payload rows in
    # place — payload bytes then move only in the range exchange. The map
    # is 2 ints/row; past broadcast scale (~10^8 rows) drop the hint and
    # accept one extra hash exchange of the payload.
    spread = (
        media.join(F.broadcast(bins), "media_id")
        .repartitionByRange(n_part, "_bin")
        .drop("_bin")
    )
    return spread.mapInPandas(extract, schema=out_schema)


def resize_image(img: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resize, pure numpy (fancy-index row/col lookup).
    Nearest is the standard choice for thumbnail/training-shard resizes
    where a real pipeline would use area/bilinear via an image lib; the
    Spark-side contract (bounded Arrow batches in, resized payloads out)
    is identical either way."""
    h, w = img.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return np.ascontiguousarray(img[rows][:, cols])


def resize_images(
    media: DataFrame, width: int, height: int
) -> DataFrame:
    """mapInPandas decode -> resize -> re-encode over image payloads.

    FULLY REAL for uncompressed BMP and 8-bit truecolor PNG
    (decode_image/encode_bmp/encode_png are pure header math + zlib +
    numpy — no codec library); other formats raise decode_image's loud
    ValueError rather than silently passing through. Each payload is
    re-encoded in its SOURCE format (PNG in -> PNG out, alpha preserved;
    BMP in -> BMP out). Returns (media_id, payload, width, height).
    Non-image rows are filtered out Spark-side so the parquet scan can
    prune them by the `kind` metadata column before any payload bytes
    move."""
    out_schema = "media_id long, payload binary, width int, height int"

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else b""
                img = decode_image(raw)
                resized = resize_image(img, width, height)
                if raw[:8] == _PNG_MAGIC:
                    payloads.append(encode_png(resized))
                else:
                    payloads.append(encode_bmp(resized))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(do, schema=out_schema)


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
