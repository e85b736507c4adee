"""Z-order layout clustering (operators/layout.py): Morton interleave
correctness against a reference implementation, and the property the
operator exists for — a z-ordered file layout lets stats-based data
skipping prune on the SECOND clustered dimension, where a linearly
ordered layout cannot prune at all."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.layout import (
    ZORDER_BITS,
    interleave_bits,
    with_zorder_value,
    zorder_layout,
)
from databricks_import_pyspark_scripts_spark.sources.delta_log import (
    column_range_filter,
    read_delta_snapshot,
    write_delta_table,
)


def _morton2(a: int, b: int, bits: int = ZORDER_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (i * 2 + 1)
        z |= ((b >> i) & 1) << (i * 2)
    return z


def test_interleave_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (3, 200)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = {(r.a, r.b): r.z for r in df.withColumn(
        "z", interleave_bits([F.col("a"), F.col("b")])).collect()}
    for a, b in rows:
        assert got[(a, b)] == _morton2(a, b)


def test_with_zorder_value_monotone_in_top_bits(spark):
    """Bucket 0 of both columns must map below bucket max of both; the
    min/max aggregate drives the bucketing (no literals)."""
    df = spark.range(0, 1024).selectExpr("id", "id AS c2")
    z = with_zorder_value(df, ["id", "c2"]).collect()
    by_id = {r["id"]: r["__z"] for r in z}
    assert by_id[0] == 0
    assert by_id[1023] == max(by_id.values())


def test_zorder_layout_enables_second_dim_skipping(spark, tmp_path):
    """Same rows, two layouts: linear (range by id) and z-ordered on
    (id, c2) with c2 a pseudo-random permutation of id. A c2-only range
    predicate prunes NOTHING in the linear layout (every file spans the
    full c2 range) and MUST prune files in the z-ordered one."""
    n = 4096
    df = spark.range(n).selectExpr(
        "id", f"CAST((id * 2654435761) % {n} AS BIGINT) AS c2")

    lin = str(tmp_path / "linear")
    write_delta_table(spark, [df.repartitionByRange(8, "id")], lin,
                      enable_cdf=False)
    zod = str(tmp_path / "zorder")
    write_delta_table(spark, [zorder_layout(df, ["id", "c2"], 8)], zod,
                      enable_cdf=False)

    pred = column_range_filter("c2", 0, n // 16 - 1)
    lin_total = len(read_delta_snapshot(spark, lin).inputFiles())
    lin_pruned = len(read_delta_snapshot(
        spark, lin, stats_filter=pred).inputFiles())
    z_total = len(read_delta_snapshot(spark, zod).inputFiles())
    z_pruned = len(read_delta_snapshot(
        spark, zod, stats_filter=pred).inputFiles())
    assert lin_total == 8 and z_total == 8
    assert lin_pruned == lin_total  # linear layout cannot skip on c2
    assert z_pruned < z_total       # z-order can

    # and the pruned read is still exact under the row predicate
    got = sorted(r.c2 for r in read_delta_snapshot(
        spark, zod, stats_filter=pred)
        .filter(F.col("c2") < n // 16).collect())
    want = sorted(r.c2 for r in df.filter(F.col("c2") < n // 16).collect())
    assert got == want


def test_zorder_layout_file_count(spark, tmp_path):
    df = spark.range(1000).selectExpr("id", "id % 7 AS c2")
    out = zorder_layout(df, ["id", "c2"], 4)
    t = str(tmp_path / "zl")
    write_delta_table(spark, [out], t, enable_cdf=False)
    files = [f for f in os.listdir(t) if f.endswith(".parquet")]
    assert len(files) <= 4
    assert read_delta_snapshot(spark, t).count() == 1000
