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
    """decode_image is a real BMP decoder now; compressed formats still
    raise a clear ValueError (no codec library in this container)."""
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"\x89PNG" + b"0" * 60)


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
