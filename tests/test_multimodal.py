"""Multimodal plumbing tests: schema/batching real, decode stubbed."""

from __future__ import annotations

from pyspark.sql import functions as F


def _media(spark):
    rows = [(i, bytes([i % 251]) * (100 + i)) for i in range(20)]
    return spark.createDataFrame(rows, "media_id long, blob binary")


def test_extract_features_shape(spark):
    from arcadedb_spark.multimodal.ops import extract_features

    df = _media(spark)
    out = extract_features(df, "blob", "media_id", dim=8)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic: same content → same features
    again = extract_features(df, "blob", "media_id", dim=8).collect()
    assert {r["id"]: r["features"] for r in rows} == \
        {r["id"]: r["features"] for r in again}


def test_sample_frames_shape(spark):
    from arcadedb_spark.multimodal.ops import sample_frames

    out = sample_frames(_media(spark), "blob", "media_id", n_frames=3)
    assert out.count() == 60
    per = out.groupBy("id").agg(F.countDistinct("frame_no").alias("n")).collect()
    assert all(r["n"] == 3 for r in per)


def test_resize_images_shape(spark):
    from arcadedb_spark.multimodal.ops import resize_images

    out = resize_images(_media(spark), "blob", "media_id", width=32, height=32)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)
    # deterministic stub → exact dedup over resized blobs is stable
    assert out.select("resized").distinct().count() == 20
