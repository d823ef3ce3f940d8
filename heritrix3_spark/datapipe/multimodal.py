"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) rides as ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition sizing, mapInPandas
batch shape, feature-vector schema — is real and tested; the actual codec
work is STUBBED (this container has no image/audio libraries):

* :func:`decode_media_udf` raises ``NotImplementedError`` by design when
  ``strict=True`` — the marked integration point for a real decoder
  (PIL/ffmpeg) on a production cluster;
* :func:`fake_feature_extract` is the deterministic stand-in used by tests
  and benchmarks: a hash-derived fixed-length float vector with exactly the
  batch shape a real extractor would produce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_DIM = 64
_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def synth_media_df(spark, n: int = 100, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(64 + i % 32))
        rows.append(
            (
                f"m{i:05d}",
                kind,
                {"image": "image/gif", "audio": "audio/wav", "video": "video/mp4"}[kind],
                (i % 64) + 1 if kind == "image" else None,
                (i % 48) + 1 if kind == "image" else None,
                (i * 250) if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


def decode_media(df: DataFrame, strict: bool = True) -> DataFrame:
    """Decode stage. ``strict=True`` marks the unimplemented codec boundary:
    the mapInPandas plumbing (schema in/out, batching) is the real
    production shape; only the inner decode call is stubbed."""

    def run(pdf_iter):
        for pdf in pdf_iter:
            if strict:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in "
                    "this environment; plug a real decoder here"
                )
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def fake_feature_extract(df: DataFrame) -> DataFrame:
    """Deterministic stand-in feature extractor with production batch shape:
    payload bytes -> FEATURE_DIM float vector (hash-expanded)."""

    def run(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload or b"\0", dtype=np.uint8).astype(np.float32)
                reps = int(np.ceil(FEATURE_DIM / max(len(b), 1)))
                v = np.tile(b, reps)[:FEATURE_DIM]
                norm = float(np.linalg.norm(v)) or 1.0
                feats.append((v / norm).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts) rows via sequence
    explode — pure column algebra; the actual frame decode plugs into
    :func:`decode_media`. Demonstrates bounded fan-out: frames-per-video =
    duration/every_ms, spread across partitions before decode."""
    vids = df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).select("media_id", (F.col("frame_idx") * every_ms).alias("frame_ts_ms"))
