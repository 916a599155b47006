"""Multimodal column plumbing: image/audio/video as opaque binary.

A 100 TB multimodal pipeline treats media as ``binary`` columns with
typed metadata and runs decode / feature-extraction / resize /
frame-sampling as **Arrow-batched Pandas functions over
``mapInPandas``** — the schema, partitioning, and batch shape here
are the real production plumbing. The decode kernels themselves are
stubbed (this container ships no image/audio codecs): each kernel
either raises ``NotImplementedError`` (strict) or produces a
deterministic fake (default) so the Spark-side contract is fully
testable.

Design notes for scale:
- media rows are *wide* (MBs of binary); ``maxPartitionBytes`` and
  Arrow batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``)
  bound executor memory, and ``mapInPandas`` streams batches — no
  per-partition materialization;
- metadata-only operations (filtering by size/mime/duration) never
  touch the binary column thanks to parquet column pruning — keep
  metadata in top-level columns, not inside a struct with the bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

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
        StructField("media_id", LongType(), False),
        StructField("mime_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("content", BinaryType(), True),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime_type", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decode+embed kernel: a cheap
    byte-histogram projection. Replace with PIL/torchvision/ffmpeg in
    environments that ship them."""
    if content is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(content[:4096]):
        acc[(i + b) % dim] += b
    total = float(sum(acc)) or 1.0
    return [v / total for v in acc]


def extract_image_features(
    df: DataFrame,
    dim: int = 64,
    strict: bool = False,
) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``.

    The UDF receives Arrow batches (pandas DataFrames) and yields
    result batches — constant memory per task regardless of partition
    size. ``strict=True`` raises ``NotImplementedError`` where a real
    codec is required, making the stub boundary explicit."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires a codec library (PIL/torchvision) "
                    "not shipped in this environment"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_type": pdf["mime_type"],
                    "feature": [
                        _fake_decode(c, dim) for c in pdf["content"]
                    ],
                }
            )

    return df.select("media_id", "mime_type", "content").mapInPandas(
        kernel, schema=IMAGE_FEATURE_SCHEMA
    )


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp.

    Timestamps are derived from metadata (``duration_ms``) JVM-side
    with ``sequence`` + ``explode`` — the binary only flows into the
    decode kernel. The frame decode itself is the stubbed part."""
    frames = df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "video frame decode requires ffmpeg, not shipped here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    # Deterministic fake frame: id+ts tag bytes.
                    "frame": [
                        f"frame:{mid}:{ts}".encode()
                        for mid, ts in zip(pdf["media_id"], pdf["frame_ts_ms"])
                    ],
                }
            )

    return frames.select("media_id", "frame_ts_ms", "content").mapInPandas(
        kernel, schema=out_schema
    )


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only profiling — never reads the binary column (check
    the scan's ReadSchema: ``content`` must be absent)."""
    return df.groupBy("mime_type").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg("n_bytes").alias("avg_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )
