"""Multimodal plumbing: schemas, batch fan-out, determinism, stub seams."""

from __future__ import annotations

import pytest

from blurrily_spark.sources.multimodal import (
    _EMB_DIM,
    decode_audio_features,
    decode_image_features,
    generate_media,
    sample_video_frames,
)


def test_image_features_schema_and_determinism(spark):
    media = generate_media(spark, n=30, seed=3)
    feats = decode_image_features(media)
    rows = feats.collect()
    assert feats.columns == ["media_id", "width", "height", "embedding"]
    assert len(rows) == media.where("kind = 'image'").count()
    assert all(len(r["embedding"]) == _EMB_DIM for r in rows)
    again = {r["media_id"]: r["embedding"] for r in decode_image_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["embedding"]


def test_audio_features(spark):
    media = generate_media(spark, n=30, seed=3)
    rows = decode_audio_features(media).collect()
    assert len(rows) == media.where("kind = 'audio'").count()
    assert all(r["duration_ms"] is not None for r in rows)


def test_video_frame_fanout(spark):
    media = generate_media(spark, n=30, seed=3)
    frames = sample_video_frames(media, every_ms=400)
    rows = frames.collect()
    vids = {r["media_id"]: r["meta"]["duration_ms"]
            for r in media.where("kind = 'video'").collect()}
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r)
    for vid, duration in vids.items():
        expected = len(range(0, duration, 400))
        assert len(by_vid[vid]) == expected
        assert sorted(x["frame_idx"] for x in by_vid[vid]) == list(range(expected))


def test_real_codec_seam_raises(spark):
    media = generate_media(spark, n=6, seed=3)
    with pytest.raises(Exception) as exc:
        decode_image_features(media, real=True).collect()
    assert "NotImplementedError" in str(exc.value) or "Pillow" in str(exc.value)
