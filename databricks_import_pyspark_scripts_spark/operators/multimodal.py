"""Multimodal column handling: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas functions.

North-star extension (SURVEY.md §7 Phase 5). The data model:

    media: STRUCT<content: BINARY,
                  mime: STRING,
                  width: INT, height: INT,      -- images/video
                  sample_rate: INT, channels: INT,  -- audio
                  duration_ms: BIGINT>           -- audio/video

Spark-side plumbing (schema, partitioning, UDF signatures, Arrow batch
shapes) is real and tested; the actual codec work is stubbed: the container
has no image/audio libraries, so ``decode_image_batch`` raises
``NotImplementedError`` unless a deterministic fake decoder is injected
(tests inject one). At 100 TB the pattern is:

* media rows are large -> keep ``spark.sql.files.maxPartitionBytes`` modest
  and NEVER collect; all transforms go through ``mapInPandas`` so one task
  streams Arrow batches instead of materializing a partition.
* metadata predicates (mime, width, duration) are plain columns -> parquet
  min/max pruning and pushdown work before any decode happens.
* decoded features (embeddings, frames) are emitted as new columns, the
  binary payload is dropped as early as possible (column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

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

MEDIA_SCHEMA = StructType([
    StructField("content", BinaryType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("duration_ms", LongType()),
])

IMAGE_FEATURE_DIM = 8

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mime", StringType()),
    StructField("feature", ArrayType(FloatType())),
])


def decode_image_batch(contents: pd.Series) -> pd.Series:
    """Decode image bytes -> pixel arrays. STUB: no imaging libraries in this
    environment; inject a fake via ``image_features(decoder=...)`` for tests.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; inject a decoder (e.g. PIL-based) in production")


def deterministic_fake_decoder(contents: pd.Series) -> pd.Series:
    """Deterministic stand-in decoder: md5-derived fixed-dim float vector per
    payload. Exercises the full Arrow path with stable values."""
    def feat(b: bytes) -> list[float]:
        digest = hashlib.md5(bytes(b)).digest()
        return [digest[i] / 255.0 for i in range(IMAGE_FEATURE_DIM)]
    return contents.map(feat)


def image_features(media_df: DataFrame, id_col: str = "media_id",
                   media_col: str = "media",
                   decoder: Callable[[pd.Series], pd.Series] | None = None,
                   ) -> DataFrame:
    """Decode + featurize image rows via mapInPandas.

    Filters to image/* BEFORE decoding (metadata predicate -> parquet
    pruning), streams Arrow batches, drops the binary payload in the output
    schema (column pruning for everything downstream).
    """
    decode = decoder or decode_image_batch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "feature": decode(pdf["content"]),
            })

    imgs = (media_df
            .filter(F.col(f"{media_col}.mime").startswith("image/"))
            .select(F.col(id_col).alias("media_id"),
                    F.col(f"{media_col}.mime").alias("mime"),
                    F.col(f"{media_col}.content").alias("content")))
    return imgs.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media_df: DataFrame, id_col: str = "media_id",
                      media_col: str = "media", every_ms: int = 1000) -> DataFrame:
    """Plan video frame sampling WITHOUT decoding: one output row per
    (media_id, frame_ts_ms) via sequence+explode on metadata only. The
    decode of each planned frame is a downstream mapInPandas (stubbed like
    images). This split keeps the explode JVM-side and lets Spark size
    shuffle partitions on row counts known before any codec runs."""
    dur = F.col(f"{media_col}.duration_ms")
    return (media_df
            .filter(F.col(f"{media_col}.mime").startswith("video/"))
            # zero/negative duration (corrupt or empty clip) -> zero planned
            # frames; without the guard sequence(0, -1) raises Illegal
            # sequence boundaries and kills the whole job at action time
            .filter(dur > 0)
            .select(F.col(id_col).alias("media_id"),
                    F.explode(
                        F.sequence(F.lit(0).cast("long"), dur - 1,
                                   F.lit(every_ms).cast("long"))).alias("frame_ts_ms")))


def audio_window_plan(media_df: DataFrame, id_col: str = "media_id",
                      media_col: str = "media",
                      window_ms: int = 5000) -> DataFrame:
    """Same pattern for audio: windowed segments from metadata only."""
    dur = F.col(f"{media_col}.duration_ms")
    return (media_df
            .filter(F.col(f"{media_col}.mime").startswith("audio/"))
            .filter(dur > 0)              # same zero-duration guard as frames
            .select(F.col(id_col).alias("media_id"),
                    F.col(f"{media_col}.sample_rate").alias("sample_rate"),
                    dur.alias("duration_ms"),
                    F.explode(
                        F.sequence(F.lit(0).cast("long"), dur - 1,
                                   F.lit(window_ms).cast("long"))).alias("window_start_ms"))
            .withColumn("window_end_ms",
                        F.least(F.col("window_start_ms") + window_ms,
                                F.col("duration_ms")))
            .drop("duration_ms"))


def synthesize_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/demos: binary payloads derived
    from the id, mixed mimes, realistic metadata."""
    base = spark.range(n).select(F.col("id").alias("media_id"))
    mime = (F.when(F.col("media_id") % 3 == 0, "image/png")
            .when(F.col("media_id") % 3 == 1, "audio/wav")
            .otherwise("video/mp4"))
    content = F.encode(F.concat(F.lit("payload-"), F.col("media_id").cast("string")), "utf-8")
    return base.select(
        "media_id",
        F.struct(
            content.alias("content"),
            mime.alias("mime"),
            F.when(mime.startswith("image/"), (F.col("media_id") % 4 + 1) * 256)
             .cast("int").alias("width"),
            F.when(mime.startswith("image/"), (F.col("media_id") % 3 + 1) * 256)
             .cast("int").alias("height"),
            F.when(mime.startswith("audio/"), F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(mime.startswith("audio/"), F.lit(1)).cast("int").alias("channels"),
            F.when(~mime.startswith("image/"), (F.col("media_id") % 10 + 1) * 2000)
             .cast("long").alias("duration_ms"),
        ).alias("media"))
