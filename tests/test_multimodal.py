from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import multimodal as mm


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"image-bytes-aaaa", ("image", "jpeg", 640, 480, 3, None, None)),
        (2, b"image-bytes-bbbb", ("image", "png", 64, 64, 3, None, None)),
        (3, None, ("image", "jpeg", None, None, None, None, None)),
    ]
    return spark.createDataFrame(rows, mm.media_table_schema())


def test_image_features_deterministic(spark, media_df):
    fac = lambda: mm.fake_media_backend()  # noqa: E731
    a = mm.image_features(media_df, fac).collect()
    b = mm.image_features(media_df, fac).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    rows = {r["media_id"]: r for r in a}
    assert len(rows[1]["mean_rgb"]) == 3
    assert rows[1]["phash"] != rows[2]["phash"]  # different payloads
    assert rows[3]["mean_rgb"] is None  # NULL payload passes through


def test_audio_features(spark):
    df = spark.createDataFrame(
        [(10, b"wav-bytes", None)], mm.media_table_schema()
    )
    row = mm.audio_features(df, mm.fake_media_backend).collect()[0]
    assert row["sample_rate"] == 16000
    assert 0.0 < row["rms"] < 1.0
    assert row["zero_crossings"] > 0


def test_video_frame_sample_fanout(spark, media_df):
    out = mm.video_frame_sample(media_df, mm.fake_media_backend, n_frames=3).collect()
    # 2 non-null payloads × 3 frames
    assert len(out) == 6
    idx = sorted((r["media_id"], r["frame_idx"]) for r in out)
    assert idx == [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2)]


def test_payload_stats_no_decode(spark, media_df):
    out = {r["media_id"]: r for r in mm.payload_stats(media_df).collect()}
    assert out[1]["payload_bytes"] == len(b"image-bytes-aaaa")
    assert out[1]["payload_sha256"] != out[2]["payload_sha256"]
    assert out[3]["payload_bytes"] is None


def test_unavailable_backend_raises(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        mm.image_features(media_df, mm.unavailable_media_backend).collect()
