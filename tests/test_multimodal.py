"""Multimodal plumbing: schemas, mapInPandas batching, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdutils_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_audio_features,
    decode_image_features,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, b"\x89PNG" + bytes(range(200)), "png", "image"),
        (2, b"\xff\xd8\xff" + bytes(200), "jpeg", "image"),
        (3, None, "png", "image"),
        (4, b"RIFF" + bytes(64000), "wav", "audio"),
        (5, bytes(5000), "mp4", "video"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features(media):
    rows = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert set(rows) == {1, 2, 3}
    r = rows[1]
    assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
    assert r["n_bytes"] == 204 and len(r["phash"]) == 16
    # determinism: same payload → same dims/hash on re-run
    again = {x["media_id"]: x for x in decode_image_features(media).collect()}
    assert again[1]["phash"] == r["phash"] and again[1]["width"] == r["width"]
    # null payload handled
    assert rows[3]["n_bytes"] == 0


def test_audio_features(media):
    rows = decode_audio_features(media).collect()
    assert len(rows) == 1
    assert rows[0]["duration_s"] == pytest.approx(64004 / 32000.0)


def test_frame_sampling(media):
    frames = sample_frames(media, every_n_bytes=1024, max_frames=4).collect()
    assert {f["frame_idx"] for f in frames} == {0, 1, 2, 3}
    assert all(f["media_id"] == 5 for f in frames)
    assert len(frames[0]["frame_payload"]) == 1024


def test_real_decode_is_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        decode_image_features(media, use_stub=False).collect()
