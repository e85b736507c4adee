"""CDC-semantics queries: the reference's F1 truth table exercised as
oracle-checked queries (SURVEY.md §2c).

A change feed is synthesized deterministically from the ``events`` table
(``event_id % 5`` picks the ``_change_type``, including NULL), then
``operators.cdc.filter_data`` — the real production operator — is applied.
The oracle re-states the truth table as plain SQL, so a semantic drift in the
operator (e.g. losing the null-safe comparison) breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import filter_data
from ..sources.registry import load_table
from . import register

# event_id % 5 -> change type; slot 4 stays NULL (snapshot row inside a CDF read)
_CHANGE_TYPE_SQL_CASE = """
    CASE event_id % 5
        WHEN 0 THEN 'insert'
        WHEN 1 THEN 'update_preimage'
        WHEN 2 THEN 'update_postimage'
        WHEN 3 THEN 'delete'
        ELSE NULL
    END"""


def _synthetic_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ct = (F.when(F.col("event_id") % 5 == 0, "insert")
          .when(F.col("event_id") % 5 == 1, "update_preimage")
          .when(F.col("event_id") % 5 == 2, "update_postimage")
          .when(F.col("event_id") % 5 == 3, "delete")
          .otherwise(F.lit(None).cast("string")))
    return (e.withColumn("_change_type", ct)
            .withColumn("_commit_version", (F.col("event_id") % 7).cast("long"))
            .withColumn("_commit_timestamp", F.col("ts")))


@register(
    "cdc_filter_event",
    f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ({_CHANGE_TYPE_SQL_CASE}) IS NULL
       OR ({_CHANGE_TYPE_SQL_CASE}) = 'insert'
    """,
    doc="EVENT data-type CDC filter: keep NULL + 'insert' only; CDC meta "
        "columns dropped afterwards.")
def cdc_filter_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = _synthetic_change_feed(spark, sf_dir)
    return filter_data(feed, "EVENT").select("event_id", "user_id", "event_type")


@register(
    "cdc_filter_property",
    f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ({_CHANGE_TYPE_SQL_CASE}) IS NULL
       OR ({_CHANGE_TYPE_SQL_CASE}) IN ('insert', 'update_postimage')
    """,
    doc="USER_PROPERTY CDC filter: NULL + insert + update_postimage pass "
        "(upsert semantics).")
def cdc_filter_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = _synthetic_change_feed(spark, sf_dir)
    return filter_data(feed, "USER_PROPERTY").select("event_id", "user_id", "event_type")


@register(
    "flagship_event_shaping",
    """
    SELECT epoch_ms(ts)                                   AS time,
           user_id,
           event_type,
           value                                          AS prop_value,
           CAST(props->>'$.k' AS BIGINT)                  AS prop_k,
           'group_B'                                      AS group_a_member
    FROM events
    """,
    doc="The reference's canary transformation (event shaping: epoch millis, "
        "property extraction, group-membership literals — "
        "/root/reference/unload_databricks_data_to_s3.py:411) flattened for "
        "the value gate; the struct-shaped original runs in entry().")
def flagship_event_shaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.unix_millis(F.col("ts")).alias("time"),
        "user_id",
        "event_type",
        F.col("value").alias("prop_value"),
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.lit("group_B").alias("group_a_member"),
    )


@register(
    "void_scrub_projection",
    """
    SELECT event_id, value AS v, event_type
    FROM events
    """,
    doc="VOID/NullType scrub (reference P1/P2) in the correctness gate: a "
        "VOID column and a struct with a VOID member are synthesized, "
        "drop_void_fields removes them, and the surviving nested value is "
        "projected out. A semantic drift in the scrub breaks schema or "
        "values here.")
def void_scrub_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.void_scrub import drop_void_fields

    e = load_table(spark, sf_dir, "events")
    dirty = (e.withColumn("ghost", F.lit(None))
             .withColumn("payload", F.struct(
                 F.col("value").alias("v"),
                 F.lit(None).alias("dead"),
             )))
    clean = drop_void_fields(dirty)
    assert "ghost" not in clean.columns
    return clean.select("event_id", F.col("payload.v").alias("v"), "event_type")


@register(
    "cdc_mutability_passthrough",
    """
    SELECT event_id, user_id, event_type
    FROM events
    """,
    doc="Mutability-mode bypass (reference --ingestion_in_mutability_mode): "
        "every change row flows through, meta columns still dropped.")
def cdc_mutability_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = _synthetic_change_feed(spark, sf_dir)
    return (filter_data(feed, "EVENT", mutability_mode=True)
            .select("event_id", "user_id", "event_type"))
