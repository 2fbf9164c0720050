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


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


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
