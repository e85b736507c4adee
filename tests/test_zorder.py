"""Z-order layout: the Morton key must make parquet footer min/max bounds
useful on EVERY participating dimension, where linear clustering serves only
its own column. Measured directly from the written files' row-group stats —
the same pruning evidence a real scan uses."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.layout import (
    quantize_col,
    with_zorder_key,
    zorder_key_col,
)
from databricks_import_pyspark_scripts_spark.sinks.writers import write_export


def _two_dim_df(spark, n=40_000):
    # two independent uniform dimensions (y from a hash so it is NOT a
    # function of x — (id*k)%m would be, since x = id%m)
    return spark.range(n).select(
        (F.col("id") % 1000).alias("x"),
        F.pmod(F.hash("id"), F.lit(1000)).alias("y"),
        F.col("id").alias("payload"))


def _skippable_fraction(path: str, col: str, lo: int, hi: int) -> float:
    """ROW-weighted fraction of the table whose row groups' [min, max] for
    ``col`` is disjoint from the predicate range [lo, hi] — i.e., skippable
    by footer stats alone. Row-weighted, not group-counted: range
    partitioning leaves tiny tail row groups (a partition's last file may
    hold a handful of rows) whose min/max can miss any 5%-wide range by
    chance, and skipping those is noise, not pruning."""
    total = skippable = groups = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            stats = {g.column(i).path_in_schema: g.column(i).statistics
                     for i in range(g.num_columns)}
            s = stats[col]
            groups += 1
            total += g.num_rows
            if s.max < lo or s.min > hi:
                skippable += g.num_rows
    assert groups >= 8, f"layout produced too few row groups ({groups})"
    return skippable / total


def test_zorder_key_locality():
    """Pure key math: the Morton key of (q, q) interleaves bits — both
    dimensions' low bits sit in the key's low bits, so key ranges bound
    both dimensions (spot values computed by hand)."""
    import sys

    sys.path.insert(0, "/root/repo")
    # interleave of x=0b11, y=0b01 with 2 dims: bits x->positions 0,2; y->1,3
    from databricks_import_pyspark_scripts_spark.session import get_spark

    spark = get_spark("zorder_unit", master="local[2]")
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    key = df.select(zorder_key_col([F.col("x"), F.col("y")],
                                   bits_per_dim=2).alias("k")).collect()[0].k
    # x bits (1,1) at positions 0,2 -> 0b101; y bits (0,1): bit0=1 at pos 1
    assert key == 0b0111


def test_quantize_clamps_out_of_bounds(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)],
                               "v double")
    got = [r.q for r in df.select(
        quantize_col(F.col("v"), 0.0, 100.0, bits=8).alias("q")).collect()]
    assert got[0] == 0 and got[-1] == 255  # stale-stats values clamp to edges
    assert 0 <= min(got) and max(got) <= 255


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    df = _two_dim_df(spark)
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    # small row groups so the stats grid is fine-grained at test size
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "2500")
    try:
        write_export(df, zpath, "parquet", cluster_partitions=16,
                     zorder_by=["x", "y"])
        write_export(df, lpath, "parquet", cluster_partitions=16,
                     cluster_by=["x"])
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "100000")

    # point-ish range predicate on each dimension
    z_x = _skippable_fraction(zpath, "x", 100, 150)
    z_y = _skippable_fraction(zpath, "y", 100, 150)
    l_x = _skippable_fraction(lpath, "x", 100, 150)
    l_y = _skippable_fraction(lpath, "y", 100, 150)
    # linear-on-x: excellent on x, useless on y (<=1% of rows — only
    # chance-disjoint tail groups, never real pruning)
    assert l_x >= 0.8 and l_y <= 0.01
    # z-order: substantial skipping on BOTH dimensions
    assert z_x >= 0.5 and z_y >= 0.5
    # and the data survives intact
    assert (spark.read.parquet(zpath).count()
            == spark.read.parquet(lpath).count() == 40_000)


def test_zorder_rejects_cluster_by_combo(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="mutually exclusive"):
        write_export(_two_dim_df(spark, 10), str(tmp_path / "x"), "parquet",
                     cluster_by=["x"], zorder_by=["y"])


def test_unload_job_zorder_roundtrip(spark, tmp_path):
    """zorder_by flows through the unload pipeline: single-pass observe
    count above the range exchange, Morton key dropped from the output."""
    from databricks_import_pyspark_scripts_spark.plans.pipeline import (
        UnloadJob,
        run_unload,
    )

    src = str(tmp_path / "src")
    (_two_dim_df(spark, 5_000)
     .write.parquet(f"{src}/t/v=1"))
    out = str(tmp_path / "out")
    job = UnloadJob(source_root=src, table_versions={"t": [0, 1]},
                    sql="SELECT x, y, payload FROM t", output_path=out,
                    zorder_by=["x", "y"])
    report = run_unload(spark, job)
    assert report["rows"] == 5_000
    # the export root carries the meta/logs sidecars (W3/W4 layout): scope
    # the readback to the data files
    back = (spark.read.option("pathGlobFilter", "*.parquet").parquet(out))
    assert set(back.columns) == {"x", "y", "payload"}  # key dropped
    assert back.count() == 5_000


def test_zorder_bounds_passthrough_and_cli_parse(spark, tmp_path):
    """Supplied bounds skip the min/max pre-pass (no extra pipeline
    execution) and still produce a valid clustered layout; the CLI bounds
    grammar parses and rejects malformed entries."""
    import pytest

    from databricks_import_pyspark_scripts_spark.cli import _parse_zorder_bounds
    from databricks_import_pyspark_scripts_spark.plans.pipeline import (
        UnloadJob,
        run_unload,
    )

    assert _parse_zorder_bounds("x=0:1000, y=-5:5") == {
        "x": (0.0, 1000.0), "y": (-5.0, 5.0)}
    assert _parse_zorder_bounds(None) is None
    with pytest.raises(SystemExit, match="bad --zorder-bounds"):
        _parse_zorder_bounds("x=nope")

    src = str(tmp_path / "src")
    _two_dim_df(spark, 2_000).write.parquet(f"{src}/t/v=1")
    out = str(tmp_path / "out")
    job = UnloadJob(source_root=src, table_versions={"t": [0, 1]},
                    sql="SELECT x, y, payload FROM t", output_path=out,
                    zorder_by=["x", "y"],
                    zorder_bounds={"x": (0.0, 999.0), "y": (0.0, 999.0)})
    report = run_unload(spark, job)
    assert report["rows"] == 2_000
    back = spark.read.option("pathGlobFilter", "*.parquet").parquet(out)
    assert back.count() == 2_000


# --- r8: integer-exact in-plan variant + Delta data-skipping property -------
#
# The tests above cover the float-quantized with_zorder_key / write_export
# path (r4); the ones below cover the r8 oracle-exact twin
# (int_bucket_col / interleave_bits / with_zorder_value / zorder_layout)
# and the jar-less Delta stats-skipping synergy.

import os

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
