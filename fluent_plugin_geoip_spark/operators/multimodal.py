"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side contract (schemas, partitioning, batch iteration, UDF
signatures) is real and tested; the actual media decoding is STUBBED because
the sandbox has no image/audio libraries — ``decode_image_batch`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
hash-derived stand-in is produced so the pipeline shape can be exercised and
benchmarked end-to-end.

At 100 TB the important properties are exactly the ones this module pins
down: media bytes never leave their partition (narrow ``mapInPandas``),
feature outputs are fixed-width arrays (Arrow-friendly), and decode
parallelism is per-batch, so executors stream batches without materializing
whole partitions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),       # images/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),    # audio/video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("phash", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),  # fixed 32-d
])

FEATURE_DIM = 32


def generate_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = hash-derived bytes)."""
    df = spark.range(n)
    mix = F.abs(F.xxhash64("id", F.lit(seed)))
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (mix % 3).cast("int") + 1)
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(kind, F.lit("/synthetic")).alias("mime"),
        F.when(kind != "audio", (64 + mix % 512).cast("int")).alias("width"),
        F.when(kind != "audio", (64 + (mix / 7).cast("long") % 512).cast("int"))
         .alias("height"),
        F.when(kind != "image", (1000 + mix % 60000)).alias("duration_ms"),
        F.encode(F.concat(F.lit("PAYLOAD:"), F.sha2(F.col("id").cast("string"), 256)),
                 "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic 32-d float feature from payload bytes (decode stand-in)."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32).astype(np.float64)
    return ((raw % 1000) / 1000.0 - 0.5).astype(np.float32)


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> np.ndarray:
    """Decode a batch of image payloads to feature vectors.

    Real decoding requires PIL/cv2 (absent in this container): raises
    ``NotImplementedError`` unless ``fake=True`` (deterministic stand-in).
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/cv2 (not available in this "
            "container); pass fake=True for the deterministic stand-in")
    return np.stack([_fake_decode(p) for p in payloads])


def extract_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """images → (media_id, phash, feature[32]) via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = decode_image_batch(pdf["payload"], fake=fake)
            phash = pdf["payload"].map(
                lambda p: int.from_bytes(hashlib.sha256(p or b"").digest()[:8],
                                         "big", signed=True))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "phash": phash,
                "feature": list(feats),
            })

    return (df.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(run, IMAGE_FEATURES_SCHEMA))


def sample_video_frames(df: DataFrame, every_ms: int = 1000,
                        fake: bool = True) -> DataFrame:
    """video → exploded (media_id, frame_ts_ms, feature). Frame timestamps
    come from metadata (native exprs); per-frame decode is the stub."""
    frames = (df.filter(F.col("kind") == "video")
              .select("media_id", "payload",
                      F.explode(F.sequence(
                          F.lit(0), F.col("duration_ms"),
                          F.lit(every_ms))).alias("frame_ts_ms")))

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError("video decode requires ffmpeg")
            feats = [
                _fake_decode((p or b"") + int(ts).to_bytes(8, "big"))
                for p, ts in zip(pdf["payload"], pdf["frame_ts_ms"])
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "frame_ts_ms": pdf["frame_ts_ms"],
                                "feature": feats})

    return frames.mapInPandas(run, schema)
