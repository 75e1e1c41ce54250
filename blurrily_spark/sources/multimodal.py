"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real -- schemas, partitioning, Arrow batch flow
through ``mapInPandas``, per-frame explosion -- while the codec layer is
stubbed (no image/audio libraries in this container): ``real=False`` (the
default) substitutes a deterministic fake decode derived from the payload
bytes, and ``real=True`` raises NotImplementedError at the exact seam where
Pillow/ffmpeg/torchaudio would plug in. A production deployment replaces
only the ``_fake_*`` kernels; every DataFrame shape stays identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, embedding array<float>"
)
AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_ms int, mfcc array<float>"
)
FRAME_SCHEMA = "media_id long, frame_idx int, frame_ms int, frame array<float>"

_EMB_DIM = 16


def generate_media(
    spark: SparkSession, n: int = 64, seed: int = 13
) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-random bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8  # 256 B
        meta = {
            "width": 64 + (i % 8) * 16 if kind != "audio" else None,
            "height": 48 + (i % 8) * 12 if kind != "audio" else None,
            "duration_ms": 1000 + i * 37 if kind != "image" else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
            "sample_rate": 16000 if kind == "audio" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_embedding(payload: bytes, dim: int = _EMB_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: bytes -> unit vector."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / 2**32) - 0.5
    return (v / np.linalg.norm(v)).astype(np.float32)


def decode_image_features(media: DataFrame, real: bool = False) -> DataFrame:
    """image rows -> (media_id, width, height, embedding).

    Arrow-batched ``mapInPandas``: each batch decodes payloads column-wise.
    ``real=True`` is the Pillow seam (not available in this container).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                raise NotImplementedError(
                    "real image decode requires Pillow/torchvision; "
                    "install and replace _fake_embedding"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    "embedding": pdf["payload"].map(
                        lambda p: _fake_embedding(bytes(p)).tolist()
                    ),
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        op, IMAGE_FEATURES_SCHEMA
    )


def decode_audio_features(media: DataFrame, real: bool = False) -> DataFrame:
    """audio rows -> (media_id, duration_ms, mfcc[16])."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                raise NotImplementedError(
                    "real audio decode requires soundfile/torchaudio"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": pdf["meta"].map(lambda m: m["duration_ms"]),
                    "mfcc": pdf["payload"].map(
                        lambda p: _fake_embedding(bytes(p)).tolist()
                    ),
                }
            )

    return media.where(F.col("kind") == "audio").mapInPandas(
        op, AUDIO_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 500, real: bool = False
) -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_idx,
    frame_ms, frame-embedding).

    The fan-out (rows-per-frame) happens inside the Arrow batch, so a long
    video never materializes as one giant row downstream.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "frame_ms": [], "frame": []
            }
            for _, row in pdf.iterrows():
                duration = row["meta"]["duration_ms"] or 0
                payload = bytes(row["payload"])
                for idx, ms in enumerate(range(0, duration, every_ms)):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(idx)
                    out["frame_ms"].append(ms)
                    out["frame"].append(
                        _fake_embedding(payload + idx.to_bytes(4, "little")).tolist()
                    )
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "video").mapInPandas(op, FRAME_SCHEMA)
