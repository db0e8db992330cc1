from __future__ import annotations

from genome_deduplication_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    media_exact_dup_clusters,
)


def _media(spark):
    rows = [
        ("m1", "image", b"\x01\x02\x03" * 100, (10, 10, None, None, "image/png")),
        ("m2", "image", b"\x01\x02\x03" * 100, (10, 10, None, None, "image/png")),
        ("m3", "audio", b"\x09\x08" * 500, (None, None, 16000, 2000, "audio/wav")),
        ("m4", "video", None, (64, 64, None, 9000, "video/mp4")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_featurize_deterministic_and_batched(spark):
    df = _media(spark)
    out = {r["media_id"]: r for r in decode_and_featurize(df).collect()}
    assert out["m1"]["feature"] == out["m2"]["feature"]  # identical payloads
    assert out["m1"]["feature"] != out["m3"]["feature"]
    assert out["m4"]["n_bytes"] == 0
    assert len(out["m1"]["feature"]) == 32


def test_media_exact_dup(spark):
    df = _media(spark)
    out = {r["media_id"]: r["cluster_id"] for r in media_exact_dup_clusters(df).collect()}
    assert out["m1"] == out["m2"] == "m1"
    assert out["m3"] == "m3"
