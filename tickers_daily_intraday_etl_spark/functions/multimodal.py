"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partition-preserving mapInPandas,
Arrow batch shapes) is real and tested; the actual codec step is STUBBED
— the sandbox has no image/audio libraries — behind
``decode_backend='fake'`` (deterministic bytes-derived features) or
``decode_backend='real'`` (raises NotImplementedError with the exact
library call a production deployment would make).

At scale: binaries stay columnar in parquet; decode runs as
``mapInPandas`` so each Arrow batch is processed vectorized and the
operation is embarrassingly parallel (no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode_features(payload: bytes | None) -> list[float] | None:
    """Deterministic stand-in for decode + feature-extract: features are a
    byte-histogram projection of the payload. Same bytes -> same features
    on every executor, so tests are exact."""
    if payload is None:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * FEATURE_DIM
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float64)
    return (hist / arr.size).astype(np.float32).tolist()


def extract_features(df: DataFrame, decode_backend: str = "fake") -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas
    (Arrow-batched, partition-preserving, no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_backend == "real":
                # Production: PIL.Image.open(io.BytesIO(b)) / soundfile.read /
                # av.open for video — none of these libs exist in this image.
                raise NotImplementedError(
                    "real decode requires pillow/soundfile/pyav; use decode_backend='fake'"
                )
            feats = pdf["payload"].map(_fake_decode_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: None if b is None else len(b)).astype("Int32"),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=_FEATURES_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payload through untouched (fake backend) but
    updates the typed metadata, preserving schema and partitioning."""
    return df.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def frame_sample_stub(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame
    timestamp (metadata-only; the decode itself is the stubbed step)."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        df.where(F.col("kind") == "video")
        .withColumn("frame_ts_ms", F.explode(F.sequence(F.lit(0), (n_frames - 1) * every_ms, F.lit(every_ms))))
        .select("media_id", "frame_ts_ms", "payload")
    )


def synthetic_media_oracle(spark, n: int = 128) -> DataFrame:
    """Deterministic media table whose payloads an ANSI-SQL oracle can
    reproduce: payload = the 32 ASCII bytes of md5(media index).  The
    binary column, typed metadata and Arrow plumbing are identical to the
    random variant — only the byte source is closed-form."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    mimes = F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"))
    i = F.col("id")
    k = (i % 3).cast("int") + 1  # element_at is 1-based
    is_image = i % 3 == 0
    return spark.range(n).select(
        F.concat(F.lit("m-"), i.cast("string")).alias("media_id"),
        F.element_at(kinds, k).alias("kind"),
        F.encode(F.md5(i.cast("string")), "utf-8").alias("payload"),
        F.element_at(mimes, k).alias("mime"),
        F.when(is_image, F.lit(64)).cast("int").alias("width"),
        F.when(is_image, F.lit(48)).cast("int").alias("height"),
        F.when(~is_image, (1000 + i * 7).cast("int")).alias("duration_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            (
                f"m-{i}",
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                int(rng.integers(1000, 10000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
