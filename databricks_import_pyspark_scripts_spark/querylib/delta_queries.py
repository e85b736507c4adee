"""Delta-protocol gate queries: the pure-Python transaction-log reader
(``sources/delta_log.py``) driven through the driver's DuckDB oracle gate.

A real Delta table is STAGED from the ``events`` table (two append commits
via the minimal protocol writer, deterministic timestamps), then read back
through the replay reader; the oracle re-derives the same rows straight
from the parquet source with the staging predicates restated as SQL. A
replay bug — wrong file set at a version, wrong change-type synthesis,
wrong commit metadata — breaks the value hash.

The staged table is cached per ``sf_dir`` under the system temp dir (the
build is deterministic, so reuse across the driver's runs is safe; a
``_SUCCESS`` marker guards against a torn build).

Reference parity: the reference's source IS a Delta table read via
versionAsOf / readChangeFeed (unload_databricks_data_to_s3.py:183-193);
these gates attest those read semantics without the Delta jars.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.delta_log import (
    read_delta_changes,
    read_delta_snapshot,
    write_delta_table,
)
from ..sources.registry import load_table
from . import register

_BASE_TS_MS = 1700000000000
# v0 = events with event_id % 3 == 0; v1 appends event_id % 3 == 1.
# (% 2 would leave no held-out rows to prove the reader is not just
# "read every parquet file in the directory".)
_V0_PRED, _V1_PRED = "event_id % 3 = 0", "event_id % 3 = 1"


def _staged_table(spark: SparkSession, sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = os.path.join(tempfile.gettempdir(),
                        f"spark_graft_delta_gate_{tag}_v1")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        e = (load_table(spark, sf_dir, "events")
             .select("event_id", "event_type", "value"))
        write_delta_table(
            spark,
            [e.filter(F.expr(_V0_PRED)), e.filter(F.expr(_V1_PRED))],
            path, base_ts_ms=_BASE_TS_MS)
        open(marker, "w").close()
    return path


@register(
    "delta_snapshot_agg",
    f"""
    SELECT 0 AS version, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM events WHERE {_V0_PRED}
    GROUP BY event_type
    UNION ALL
    SELECT 1 AS version, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM events WHERE {_V0_PRED} OR {_V1_PRED}
    GROUP BY event_type
    """,
    doc="VERSION AS OF through the pure-Python Delta log replay: the "
        "events table is staged as a real Delta table (two append "
        "commits), then BOTH versions are snapshot-read and aggregated. "
        "The v0 aggregate proves time travel (v1's files excluded); the "
        "v1 aggregate proves add-accumulation across commits. Oracle "
        "re-derives both states from the parquet source.")
def delta_snapshot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _staged_table(spark, sf_dir)
    parts = []
    for v in (0, 1):
        snap = read_delta_snapshot(spark, path, v)
        parts.append(
            snap.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .withColumn("version", F.lit(v).cast("int")))
    return parts[0].unionByName(parts[1]).select(
        "version", "event_type", "n", "sum_value")


@register(
    "delta_cdf_insert_feed",
    f"""
    SELECT event_id, event_type, ROUND(value, 4) AS value,
           'insert' AS change_type, 1 AS commit_version,
           {_BASE_TS_MS + 1000} AS commit_ts_ms
    FROM events WHERE {_V1_PRED}
    """,
    doc="Delta CDF through log replay: changes in (0, 1] of the staged "
        "table are exactly v1's appended rows, synthesized as "
        "change_type='insert' with the commit's pinned version and "
        "commitInfo timestamp. Row-level comparison — every appended "
        "event must appear exactly once with the right CDC metadata.")
def delta_cdf_insert_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _staged_table(spark, sf_dir)
    ch = read_delta_changes(spark, path, 0, 1)
    return ch.select(
        "event_id", "event_type",
        F.round(F.col("value"), 4).alias("value"),
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").cast("int").alias("commit_version"),
        (F.unix_millis(F.col("_commit_timestamp"))).alias("commit_ts_ms"))
