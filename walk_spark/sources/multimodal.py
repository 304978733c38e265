"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
metadata struct, and runs decode/feature/resize/frame-sample stages as
Arrow-batched ``mapInPandas`` passes so the bytes cross the JVM<->Python
boundary once per stage and never shuffle mid-stage.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernel is STUBBED: ``decoder="fake"`` produces deterministic
metadata derived from the byte content (so the plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested end to end),
and ``decoder="real"`` raises NotImplementedError at the exact seam where
a codec plugs in.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("url", StringType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("content_type", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),  # pooled embed
        StructField("sha256", StringType(), False),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 256,
                    partitions: int = 8) -> DataFrame:
    """Deterministic opaque blobs standing in for crawled media bytes."""

    def _gen(it):
        for pdf in it:
            ids = pdf["id"].astype("int64")
            rows = {"media_id": [], "url": [], "modality": [], "content": [],
                    "content_type": []}
            for i in ids:
                i = int(i)
                modality = ("image", "audio", "video")[i % 3]
                blob = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
                rows["media_id"].append(i)
                rows["url"].append(f"http://media.test/{modality}/{i}")
                rows["modality"].append(modality)
                rows["content"].append(blob)
                rows["content_type"].append(
                    {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[modality]
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def _fake_decode_batch(pdf: pd.DataFrame, feature_dim: int) -> pd.DataFrame:
    """Deterministic stand-in decode: metadata + pooled feature derived from
    the blob bytes — exercises exactly the schema/batch shape a real codec
    stage produces."""
    out = {k: [] for k in ("media_id", "modality", "width", "height",
                           "duration_ms", "n_frames", "feature", "sha256")}
    for mid, modality, blob in zip(
        pdf["media_id"], pdf["modality"], pdf["content"]
    ):
        b = bytes(blob or b"")
        h = hashlib.sha256(b)
        d = h.digest()
        out["media_id"].append(int(mid))
        out["modality"].append(modality)
        out["width"].append(64 + d[0] if modality == "image" else None)
        out["height"].append(64 + d[1] if modality == "image" else None)
        out["duration_ms"].append(
            1000 + d[2] * 100 if modality in ("audio", "video") else None
        )
        out["n_frames"].append(d[3] if modality == "video" else None)
        out["feature"].append(
            [((d[j % 32] / 255.0) - 0.5) for j in range(feature_dim)]
        )
        out["sha256"].append(h.hexdigest())
    return pd.DataFrame(out)


def decode_media(media: DataFrame, decoder: str = "fake",
                 feature_dim: int = 16) -> DataFrame:
    """Decode/feature-extract stage: mapInPandas over the binary column.

    ``decoder="real"`` is the seam where PIL/ffmpeg plug in (not available
    in this container)."""
    if decoder == "real":
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg) are not installed in this "
            "environment; use decoder='fake' for the plumbing path"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")

    def _decode(it):
        for pdf in it:
            yield _fake_decode_batch(pdf, feature_dim)

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  decoder: str = "fake") -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled
    frame (media_id, frame_idx, frame_ts_ms, frame binary). Fake decoder
    emits deterministic slices of the blob as 'frames'."""
    if decoder == "real":
        raise NotImplementedError("real frame decode requires ffmpeg")
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("frame", BinaryType(), False),
        ]
    )

    def _sample(it):
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [],
                    "frame": []}
            for mid, modality, blob in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                if modality != "video":
                    continue
                b = bytes(blob or b"")
                dur = 1000 + hashlib.sha256(b).digest()[2] * 100
                for idx, ts in enumerate(range(0, dur, every_ms)):
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(idx)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame"].append(b[idx % 8: idx % 8 + 16])
            yield pd.DataFrame(rows)

    return media.mapInPandas(_sample, schema=schema)
