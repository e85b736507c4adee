"""Testdata table registry: load parquet tables and register temp views.

The reference reads governed Delta tables by name; outside Databricks our unit
of input is a directory of parquet files, one per table (TESTDATA.md). Views
are registered under the *original* table identifiers, which removes the
reference's fragile textual SQL rewrite (str.replace of table names inside the
user SQL — /root/reference/unload_databricks_data_to_s3.py:312,322,337 — which
corrupts queries when one table name is a substring of another).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader rejects
# outright; read them as long (legacy conf) and convert to micros, truncating
# exactly like engines that narrow ns->us (DuckDB included).
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain ``spark.read.parquet`` so Catalyst gets full
    predicate pushdown / column pruning / partition pruning on the scan."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _NANOS_TS_COLUMNS.get(name, ())
    if not ns_cols:
        return spark.read.parquet(path)
    # scope the legacy conf to THIS read: the parquet schema is captured at
    # read time (verified: collect after restore works), and leaving it set
    # would make every later nanos-parquet read in the session silently
    # yield raw long values instead of failing fast
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    for c in ns_cols:
        if isinstance(df.schema[c].dataType, LongType):
            # integer `div`, NOT `/`: double division loses the low microsecond
            # digits at epoch-nanos magnitude (~1.7e18 > 2^53)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return _normalize_ntz(df)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Relabel TIMESTAMP_NTZ columns as session-TZ TIMESTAMP.

    Parquet written without timezone metadata (the pandas/pyarrow default) is
    inferred as TIMESTAMP_NTZ under Spark 4's
    ``spark.sql.parquet.inferTimestampNTZ.enabled=true``, and NTZ is rejected
    by ``unix_millis``/``unix_micros``/``cast(.. as long)`` at analysis time.
    The session timezone is pinned UTC (session.py), so NTZ -> LTZ is a
    deterministic relabel of the same instant — identical epoch values, and
    DuckDB's ``epoch_us`` on the same file agrees. Normalizing here, at the
    single source choke point, keeps every downstream query engine-agnostic
    about how the fixture writer chose to stamp its timestamps.
    """
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view named exactly like the table."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_source(spark: SparkSession, path: str, fmt: str = "parquet",
                schema=None) -> DataFrame:
    """Format-dispatched batch scan: parquet/orc/json/csv.

    The symmetric read side of ``sinks.writers.write_export`` — together they
    make every SURVEY.md §2b source/sink format a first-class round trip.
    Columnar formats carry their own schema; for json/csv pass ``schema``
    to skip the inference pass (an extra full read of the data — at 100 TB
    always pass the schema, or sample: inference there is a second scan).
    """
    if fmt not in ("parquet", "orc", "json", "csv"):
        raise ValueError(
            f"unknown format {fmt!r}; expected one of parquet/orc/json/csv")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "json":
        return reader.json(path)
    return (reader.option("header", "true")
            .option("inferSchema", "true" if schema is None else "false")
            .csv(path))
