"""Zone-map sidecar tests: stats computation, file pruning correctness
(value-identical to the unpruned filter), and actual skipping on a
range-clustered export."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.sinks.writers import write_export
from databricks_import_pyspark_scripts_spark.sinks.zonemaps import (
    prune_files,
    read_pruned,
    read_zonemap,
    write_zonemap,
)


def _export_clustered(spark, tmp_path):
    out = str(tmp_path / "zm_export")
    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"))
    write_export(df, out, fmt="parquet", cluster_by=["k"],
                 cluster_partitions=8)
    return out, df


def test_zonemap_roundtrip_and_intervals(spark, tmp_path):
    out, _ = _export_clustered(spark, tmp_path)
    zm = write_zonemap(spark, out, ["k"])
    assert read_zonemap(spark, out) == zm
    files = zm["files"]
    assert len(files) == 8  # one per range partition
    # range-clustered: intervals are disjoint and cover 0..9999
    ivals = sorted(tuple(stats["k"]) for stats in files.values())
    assert ivals[0][0] == 0 and ivals[-1][1] == 9999
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ivals, ivals[1:]):
        assert a_hi < b_lo


def test_pruned_read_matches_full_filter_and_skips_files(spark, tmp_path):
    out, df = _export_clustered(spark, tmp_path)
    zm = write_zonemap(spark, out, ["k"])
    lo, hi = 2500, 3200
    kept = prune_files(zm, "k", lo, hi)
    assert 0 < len(kept) < 8  # genuinely skipped most files
    got = read_pruned(spark, out, "k", lo, hi)
    expect = (spark.read.parquet(out)
              .filter(F.col("k").between(lo, hi)))
    assert sorted(map(tuple, got.select("k", "v").collect())) == \
        sorted(map(tuple, expect.select("k", "v").collect()))


def test_prune_empty_range_and_null_stats_kept(spark, tmp_path):
    out, _ = _export_clustered(spark, tmp_path)
    zm = write_zonemap(spark, out, ["k"])
    assert prune_files(zm, "k", 100_000, 200_000) == []
    assert read_pruned(spark, out, "k", 100_000, 200_000).count() == 0
    # NULL stats are conservative: a fabricated all-NULL file stays in
    zm["files"]["fake://nullfile"] = {"k": [None, None]}
    assert "fake://nullfile" in prune_files(zm, "k", 100_000, 200_000)
