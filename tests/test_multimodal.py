"""Multimodal plumbing: binary columns through mapInPandas stages."""

import pytest
from pyspark.sql import functions as F

from walk_spark.sources.multimodal import (
    decode_media, sample_frames, synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=48).localCheckpoint(eager=True)


def test_media_schema_and_determinism(spark, media):
    assert media.count() == 48
    a = {r["media_id"]: bytes(r["content"])[:8] for r in media.collect()}
    b = {r["media_id"]: bytes(r["content"])[:8]
         for r in synthetic_media(spark, n=48).collect()}
    assert a == b


def test_decode_fake(media):
    d = decode_media(media, decoder="fake", feature_dim=8)
    rows = {r["media_id"]: r for r in d.collect()}
    assert len(rows) == 48
    img = next(r for r in rows.values() if r["modality"] == "image")
    assert img["width"] and img["height"] and img["duration_ms"] is None
    vid = next(r for r in rows.values() if r["modality"] == "video")
    assert vid["duration_ms"] and vid["n_frames"] is not None
    assert all(len(r["feature"]) == 8 for r in rows.values())
    assert all(len(r["sha256"]) == 64 for r in rows.values())


def test_decode_real_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_media(media, decoder="real")
    with pytest.raises(NotImplementedError):
        sample_frames(media, decoder="real")


def test_frame_sampling(media):
    frames = sample_frames(media, every_ms=5000)
    got = frames.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("maxi")
    ).collect()
    assert len(got) == 16  # one third of 48 are video
    for r in got:
        assert r["n"] == r["maxi"] + 1  # dense frame indices
    assert frames.filter(F.length("frame") == 0).count() == 0


def test_decoded_features_join_similarity(spark, media):
    """Decoded features feed the similarity operators unchanged — the
    multimodal and embedding paths share one schema convention."""
    from walk_spark.operators.similarity import cosine_topk
    d = decode_media(media, feature_dim=8).select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").alias("embedding"),
    )
    q = d.filter(F.col("vec_id") == 0).first()["embedding"]
    top = cosine_topk(d, [float(x) for x in q], k=3).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cosine"] == 1.0
