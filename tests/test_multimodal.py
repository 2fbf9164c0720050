import pytest

from graph_data_science_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    synthesize_media,
)


def test_media_schema(spark):
    media = synthesize_media(spark, n=12)
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.count() == 12
    meta = media.select("meta.width", "meta.duration_ms").collect()
    assert all(r["width"] > 0 and r["duration_ms"] > 0 for r in meta)


def test_decode_rejects_compressed_formats():
    """decode_image is a real BMP+PNG decoder now; JPEG still raises a
    clear ValueError (DCT+Huffman needs a codec library), as do
    unsupported PNG variants and truncated PNG streams."""
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"\xff\xd8\xff\xe0" + b"0" * 60)  # JPEG magic
    with pytest.raises(ValueError, match="truncated PNG"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"0" * 60)


def test_extract_features_deterministic(spark):
    media = synthesize_media(spark, n=12)
    a = {r["media_id"]: r["features"] for r in extract_features(media, dim=8).collect()}
    b = {r["media_id"]: r["features"] for r in extract_features(media, dim=8).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    assert all(0.0 <= x < 1.0 for v in a.values() for x in v)
    # payloads are sha512 digests -> 64 bytes each
    nb = {r["media_id"]: r["n_bytes"] for r in extract_features(media, dim=4).collect()}
    assert set(nb.values()) == {64}


def test_frame_sample_counts(spark):
    media = synthesize_media(spark, n=12)
    frames = frame_sample(media, every_ms=10000)
    rows = frames.collect()
    metas = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect()
             if r["kind"] == "video"}
    counts = {}
    for r in rows:
        counts[r["media_id"]] = counts.get(r["media_id"], 0) + 1
    assert set(counts) == set(metas)
    for mid, dur in metas.items():
        assert counts[mid] == dur // 10000 + 1


def test_decode_image_bmp_in_spark(spark):
    """decode_image is a real decoder now (24-bit BMP): generate BMPs,
    decode inside mapInPandas, assert dimensions and pixel content."""
    import numpy as np
    import pandas as pd

    from graph_data_science_spark.operators.multimodal import decode_image, encode_bmp

    rng = np.random.default_rng(11)
    rows = []
    for mid in range(6):
        h, w = int(rng.integers(2, 12)), int(rng.integers(2, 12))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append((mid, h, w, int(img.sum()), bytearray(encode_bmp(img))))
    df = spark.createDataFrame(
        rows, "media_id long, h int, w int, pixel_sum long, payload binary"
    )

    def decode(batches):
        for pdf in batches:
            imgs = [decode_image(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dh": [i.shape[0] for i in imgs],
                    "dw": [i.shape[1] for i in imgs],
                    "dsum": [int(i.sum()) for i in imgs],
                }
            )

    got = {
        r["media_id"]: (r["dh"], r["dw"], r["dsum"])
        for r in df.mapInPandas(decode, "media_id long, dh int, dw int, dsum long").collect()
    }
    want = {mid: (h, w, s) for mid, h, w, s, _ in rows}
    assert got == want


def test_decode_image_rejects_non_bmp(spark):
    import pytest

    from graph_data_science_spark.operators.multimodal import decode_image

    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"\xff\xd8\xff\xe0" + b"0" * 64)  # JPEG magic
    with pytest.raises(ValueError, match="shorter than"):
        decode_image(b"BM")


def test_resize_images_end_to_end(spark):
    """resize_images is fully real for BMP: decode -> nearest-neighbor
    resize -> re-encode, all inside mapInPandas. Round-trip the output
    payloads and check dimensions + exact nearest-neighbor pixels."""
    import numpy as np

    from graph_data_science_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        resize_image,
        resize_images,
    )

    rng = np.random.default_rng(23)
    rows = []
    imgs = {}
    for mid in range(5):
        h, w = int(rng.integers(3, 17)), int(rng.integers(3, 17))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        imgs[mid] = img
        kind = "image" if mid != 4 else "video"  # non-image filtered out
        rows.append((mid, kind, bytearray(encode_bmp(img))))
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")

    out = {r["media_id"]: r for r in resize_images(df, width=8, height=6).collect()}
    assert set(out) == {0, 1, 2, 3}  # the video row never decodes
    for mid, r in out.items():
        assert (r["width"], r["height"]) == (8, 6)
        decoded = decode_image(bytes(r["payload"]))
        assert decoded.shape == (6, 8, 3)
        np.testing.assert_array_equal(decoded, resize_image(imgs[mid], 8, 6))


def test_resize_image_identity_and_downscale():
    import numpy as np

    from graph_data_science_spark.operators.multimodal import resize_image

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    np.testing.assert_array_equal(resize_image(img, 6, 4), img)  # no-op resize
    half = resize_image(img, 3, 2)
    np.testing.assert_array_equal(half, img[::2][:, ::2])  # exact 2x decimation


def test_png_roundtrip_all_filters():
    """decode_png inverts encode_png for every PNG row predictor
    (None/Sub/Up/Average/Paeth), RGB and RGBA, mixed filters per row."""
    import numpy as np

    from graph_data_science_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    for filters in ([0] * 13, [1] * 13, [2] * 13, [3] * 13, [4] * 13,
                    [0, 1, 2, 3, 4, 3, 2, 1, 0, 4, 2, 1, 3]):
        out = decode_png(encode_png(img, row_filters=list(filters)))
        assert (out == img).all(), filters
    rgba = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    out = decode_png(encode_png(rgba, row_filters=[4, 3, 2, 1, 0, 4]))
    assert out.shape == (6, 5, 4) and (out == rgba).all()


def test_png_golden_external():
    """Golden fixture produced by an external encoder (the canonical
    smallest red-dot PNG): validates chunk walking, IHDR parsing, zlib
    inflate, and pixel order against a file our own encoder never made."""
    import base64

    from graph_data_science_spark.operators.multimodal import decode_image

    golden = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
        "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    arr = decode_image(golden)
    assert arr.shape == (1, 1, 4)
    assert arr[0, 0].tolist() == [255, 0, 0, 127]


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    import pytest

    from graph_data_science_spark.operators.multimodal import decode_png

    def png_with_ihdr(w, h, depth, ctype, interlace):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        def chunk(t, d):
            return len(d).to_bytes(4, "big") + t + d + zlib.crc32(t + d).to_bytes(4, "big")
        idat = zlib.compress(b"\x00" * (1 + w * 3))
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", idat) + chunk(b"IEND", b""))

    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(png_with_ihdr(1, 1, 16, 2, 0))  # 16-bit
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(png_with_ihdr(1, 1, 8, 3, 0))  # palette
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(png_with_ihdr(1, 1, 8, 2, 1))  # interlaced


def test_resize_images_png_source_format_preserved(spark):
    """resize_images re-encodes PNG payloads as PNG (alpha preserved)
    and BMP payloads as BMP, through the same mapInPandas plumbing."""
    import numpy as np

    from graph_data_science_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_png,
        resize_images,
    )

    rng = np.random.default_rng(3)
    png_img = rng.integers(0, 256, (8, 6, 4), dtype=np.uint8)
    bmp_img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (0, "image", bytearray(encode_png(png_img))),
            (1, "image", bytearray(encode_bmp(bmp_img))),
            (2, "audio", bytearray(b"\x00" * 16)),  # pruned by kind
        ],
        "media_id long, kind string, payload binary",
    )
    got = {r["media_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert set(got) == {0, 1}
    out_png = decode_image(bytes(got[0]["payload"]))
    assert out_png.shape == (4, 4, 4)  # PNG in -> PNG out, alpha kept
    assert bytes(got[0]["payload"])[:8] == b"\x89PNG\r\n\x1a\n"
    out_bmp = decode_image(bytes(got[1]["payload"]))
    assert out_bmp.shape == (4, 4, 3)
    assert bytes(got[1]["payload"])[:2] == b"BM"
