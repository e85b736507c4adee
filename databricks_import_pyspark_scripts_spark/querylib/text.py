"""Text-analysis operators over ``documents`` (north-star extensions):
token counting, quality scoring, language-ID heuristics, fingerprinting.

All pure column expressions — per-row, no shuffle, codegen'd — so they run at
scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    quality_score_col,
    token_count_col,
    word_count_col,
)
from ..sources.registry import load_table
from . import register


@register(
    "text_token_stats",
    r"""
    SELECT doc_id,
           LENGTH(text) AS n_chars_computed,
           LEN(regexp_split_to_array(TRIM(text), '\s+')) AS n_words,
           LEN(regexp_extract_all(LOWER(text), '[a-z0-9]+')) AS n_tokens
    FROM documents
    """,
    doc="Token counting: whitespace word count + BPE-ish alnum-run token "
        "count, both as builtin regexp expressions.")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_computed"),
        word_count_col(F.col("text")).alias("n_words"),
        token_count_col(F.col("text")).alias("n_tokens"),
    )


@register(
    "text_quality_score",
    r"""
    SELECT doc_id,
           ROUND(
             0.4 * LEAST(LENGTH(text) / 500.0, 1.0)
           + 0.3 * (1.0 - LEAST(LEN(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) * 1.0
                                / GREATEST(LENGTH(text), 1), 1.0))
           + 0.3 * LEAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) / 100.0, 1.0)
           , 4) AS quality
    FROM documents
    """,
    doc="Heuristic quality score in [0,1]: length saturation, punctuation "
        "ratio, word-count saturation — the standard pre-training corpus "
        "filter shape, all JVM-side.")
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id",
                    F.round(quality_score_col(F.col("text")), 4).alias("quality"))
