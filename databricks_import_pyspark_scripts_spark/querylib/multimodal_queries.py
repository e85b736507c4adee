"""Multimodal plumbing queries. The media table is synthesized
deterministically (no media testdata exists), the decode step uses the
deterministic md5-derived fake decoder (real codecs are stubbed —
operators.multimodal), and the oracle reproduces the identical math in
DuckDB — so even the mapInPandas Arrow path is value-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    IMAGE_FEATURE_DIM,
    deterministic_fake_decoder,
    frame_sample_plan,
    image_features,
    synthesize_media_table,
)
from . import register

N_MEDIA = 256

# hex pair at byte i of md5('payload-' || id) -> integer 0..255, portably
_HEX = "0123456789abcdef"


def _byte_sql(i: int) -> str:
    h = "md5('payload-' || CAST(media_id AS VARCHAR))"
    return (f"((instr('{_HEX}', substr({h}, {2 * i + 1}, 1)) - 1) * 16"
            f" + instr('{_HEX}', substr({h}, {2 * i + 2}, 1)) - 1)")


_FEATURE_SUM_SQL = " + ".join(f"{_byte_sql(i)} / 255.0"
                              for i in range(IMAGE_FEATURE_DIM))


@register(
    "multimodal_image_features",
    f"""
    SELECT media_id, 'image/png' AS mime,
           {IMAGE_FEATURE_DIM} AS dim,
           ROUND({_FEATURE_SUM_SQL}, 4) AS feature_sum
    FROM range(0, {N_MEDIA}) t(media_id)
    WHERE media_id % 3 = 0
    """,
    doc="Binary media column -> metadata-filtered mapInPandas decode "
        "(Arrow-batched) -> per-image feature vector; reduced to a rounded "
        "sum so the md5-derived fake decode is value-checked cross-engine.")
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media_table(spark, N_MEDIA)
    feats = image_features(media, decoder=deterministic_fake_decoder)
    as_double = F.transform(F.col("feature"), lambda x: x.cast("double"))
    return feats.select(
        "media_id", "mime",
        F.size("feature").alias("dim"),
        F.round(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x), 4)
        .alias("feature_sum"))


@register(
    "multimodal_frame_plan",
    f"""
    SELECT media_id, frame_ts_ms
    FROM (SELECT media_id, (media_id % 10 + 1) * 2000 AS duration_ms
          FROM range(0, {N_MEDIA}) t(media_id)
          WHERE media_id % 3 = 2),
         LATERAL unnest(generate_series(0, CAST(duration_ms - 1 AS BIGINT), 1000))
           AS u(frame_ts_ms)
    """,
    doc="Video frame-sampling plan from metadata only (sequence+explode, "
        "JVM-side, zero decodes): one row per planned frame.")
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media_table(spark, N_MEDIA)
    return frame_sample_plan(media, every_ms=1000)
