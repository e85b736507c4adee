"""Zone-map stats sidecars: per-file min/max column statistics written next
to an export, and predicate-driven FILE pruning on read.

The lakehouse data-skipping pattern (Delta/Iceberg keep these stats in their
metadata layer; reference scope note: the reference engine relies on
Databricks to do this invisibly — unload_databricks_data_to_s3.py never
touches file statistics): after a range-clustered or z-ordered export
(``sinks/writers.py``), each file covers a narrow key range, so a range
predicate touches a small fraction of files. The sidecar makes that skipping
available to ANY reader without opening parquet footers, and — critically at
100 TB — without a driver-side listing+footer pass over hundreds of
thousands of files: the stats are computed in the SAME distributed pass that
just wrote the data, keyed by ``input_file_name()``.

Pruning correctness does not depend on the stats' freshness policy being
clever: ``read_pruned`` intersects the requested range with each file's
[min, max] interval — a file is skipped ONLY when the predicate provably
matches nothing in it. NULL handling: files whose stats row has a NULL
min/max for the column (all-NULL file) are kept conservatively, and the
range predicate itself never matches NULL values, identical to the unpruned
filter.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIDECAR_NAME = "_zonemap.json"


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())  # noqa: SLF001
    return jvm, fs, hpath


def write_zonemap(spark: SparkSession, path: str,
                  stat_cols: list[str]) -> dict:
    """Compute per-file min/max for ``stat_cols`` over the parquet files at
    ``path`` and write them as ``_zonemap.json`` beside the data.

    One distributed scan, grouped on ``input_file_name()`` — per-file
    min/max aggregate with map-side partials, one shuffle on the file name
    (|files| groups). Returns the zonemap dict. The sidecar goes through
    the Hadoop FS API like the meta/log sidecars, so it lands on whatever
    filesystem the export used (file://, s3a://, ...).
    """
    df = spark.read.parquet(path)
    aggs = []
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    rows = (df.groupBy(F.input_file_name().alias("file"))
            .agg(*aggs).collect())
    zonemap = {
        "stat_cols": stat_cols,
        "files": {
            r.file: {c: [_jsonable(r[f"min_{c}"]), _jsonable(r[f"max_{c}"])]
                     for c in stat_cols}
            for r in rows
        },
    }
    jvm, fs, _ = _hadoop_path(spark, path)
    out = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{SIDECAR_NAME}")
    stream = fs.create(out, True)
    stream.write(bytearray(json.dumps(zonemap, indent=1).encode("utf-8")))
    stream.close()
    return zonemap


def _jsonable(v):
    """JSON-safe stat value; timestamps/dates/decimals go through str() and
    compare correctly later because read_pruned compares against the SAME
    str() form (ISO-8601 order == chronological order)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)


def read_zonemap(spark: SparkSession, path: str) -> dict:
    jvm, fs, _ = _hadoop_path(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{SIDECAR_NAME}")
    stream = fs.open(p)
    try:
        # py4j passes byte[] by value, so incremental stream.read(buf)
        # cannot fill a Python-side buffer; IOUtils returns the bytes
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def prune_files(zonemap: dict, col: str, lo, hi) -> list[str]:
    """Files whose [min, max] interval for ``col`` intersects [lo, hi]
    (inclusive); files with NULL stats are kept conservatively."""
    lo_j, hi_j = _jsonable(lo), _jsonable(hi)
    keep = []
    for f, stats in zonemap["files"].items():
        mn, mx = stats[col]
        if mn is None or mx is None:
            keep.append(f)
        elif not (mx < lo_j or mn > hi_j):
            keep.append(f)
    return sorted(keep)


def read_pruned(spark: SparkSession, path: str, col: str, lo, hi) -> DataFrame:
    """Range scan with zone-map file pruning: read ONLY the files whose
    stats interval intersects [lo, hi], then apply the exact predicate.

    Value-identical to ``spark.read.parquet(path).filter(col BETWEEN ...)``
    — the pruning is an upper-bound file list, the residual filter is still
    applied (and still pushed to the parquet scan for row-group skipping
    within the kept files). On a range-clustered export the kept list is
    ~|range| / |key span| of the files.
    """
    zonemap = read_zonemap(spark, path)
    files = prune_files(zonemap, col, lo, hi)
    if not files:
        return (spark.read.parquet(path)
                .filter(F.lit(False)))
    return (spark.read.parquet(*files)
            .filter(F.col(col).between(lo, hi)))
