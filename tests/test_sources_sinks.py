"""Source/sink format coverage: JSON, CSV, ORC roundtrips plus the export
writer's zstd-parquet and VOID-scrub behavior (reference W1/W2 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.sinks.writers import write_export
from databricks_import_pyspark_scripts_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_json_roundtrip(spark, nation, tmp_path):
    out = str(tmp_path / "j")
    nation.write.mode("overwrite").json(out)
    back = spark.read.schema(nation.schema).json(out)
    assert sorted(r.n_name for r in back.collect()) == \
           sorted(r.n_name for r in nation.collect())


def test_csv_roundtrip(spark, nation, tmp_path):
    out = str(tmp_path / "c")
    nation.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(nation.schema).option("header", True).csv(out)
    assert back.count() == nation.count()
    assert dict(back.dtypes) == dict(nation.dtypes)  # explicit schema, no inference


def test_orc_roundtrip(spark, nation, tmp_path):
    out = str(tmp_path / "o")
    nation.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == nation.count()


def test_export_parquet_is_zstd_and_void_free(spark, tmp_path):
    df = (spark.range(10)
          .withColumn("ghost", F.lit(None))           # VOID column
          .withColumn("v", F.col("id") * 2))
    out = str(tmp_path / "exp")
    write_export(df, out, "parquet")
    back = spark.read.parquet(out)
    assert "ghost" not in back.columns                # W2 scrubs before write
    assert back.count() == 10
    import glob
    import pyarrow.parquet as pq
    f = glob.glob(f"{out}/part-*.parquet")[0]
    meta = pq.ParquetFile(f).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"


def test_export_json_keeps_nulls(spark, tmp_path):
    df = spark.range(3).withColumn("ghost", F.lit(None))
    out = str(tmp_path / "expj")
    write_export(df, out, "json")                     # W1: JSON not scrubbed
    assert spark.read.json(f"{out}/part-*").count() == 3


def test_bad_format_rejected(spark):
    with pytest.raises(ValueError):
        write_export(spark.range(1), "/tmp/x", "xml")


def test_export_csv_and_read_source_roundtrip(spark, nation, tmp_path):
    from databricks_import_pyspark_scripts_spark.sources.registry import read_source

    out = str(tmp_path / "expc")
    write_export(nation, out, "csv")
    back = read_source(spark, out, "csv", schema=nation.schema)
    assert back.count() == nation.count()
    assert dict(back.dtypes) == dict(nation.dtypes)


def test_export_orc_zstd_and_void_free(spark, tmp_path):
    from databricks_import_pyspark_scripts_spark.sources.registry import read_source

    df = (spark.range(10)
          .withColumn("ghost", F.lit(None))
          .withColumn("v", F.col("id") * 2))
    out = str(tmp_path / "expo")
    write_export(df, out, "orc")
    back = read_source(spark, out, "orc")
    assert "ghost" not in back.columns                # ORC scrubbed like parquet
    assert back.count() == 10


def test_read_source_rejects_unknown_format(spark):
    from databricks_import_pyspark_scripts_spark.sources.registry import read_source

    with pytest.raises(ValueError):
        read_source(spark, "/tmp/x", "avro")


def test_load_table_normalizes_ntz_timestamps(spark, tmp_path):
    """Pinned: a tz-less timestamp[us] parquet (pandas/pyarrow default, and
    what the driver's fixture generator emits since round 3) must come back
    as session-TZ TIMESTAMP with the exact same epoch values — NOT
    TIMESTAMP_NTZ, which unix_millis/unix_micros/cast-to-long all reject."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from databricks_import_pyspark_scripts_spark.sources.registry import (
        load_table,
    )

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    table = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array(micros, pa.timestamp("us")),  # NO timezone metadata
    })
    d = tmp_path / "ntzfix"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))

    df = load_table(spark, str(d), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), \
        f"expected TIMESTAMP, got {df.schema['ts'].dataType}"
    assert not isinstance(df.schema["ts"].dataType, TimestampNTZType)
    got = {r.event_id: r.us for r in
           df.selectExpr("event_id", "unix_micros(ts) AS us").collect()}
    assert got == {1: micros[0], 2: micros[1]}


def test_clustered_write_produces_disjoint_file_ranges(spark, tmp_path):
    """cluster_by range-clusters output files: per-file min/max footer
    stats over the cluster column must be (near-)disjoint so predicate
    scans can skip whole files — the property the option exists for."""
    import glob

    import pyarrow.parquet as pq

    from databricks_import_pyspark_scripts_spark.sinks.writers import (
        write_export,
    )

    df = (spark.range(0, 10_000)
          .selectExpr("id", "id % 97 AS k", "CAST(id AS STRING) AS s")
          .repartition(8))  # deliberately scrambled input
    out = str(tmp_path / "clustered")
    write_export(df, out, "parquet", cluster_by=["id"], cluster_partitions=6)
    ranges = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index("id")
        los, his = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        ranges.append((min(los), max(his)))
    assert len(ranges) > 1, "expected multiple range-clustered files"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {(lo1, hi1)} vs {(lo2, hi2)}"
    # every row survived the clustering shuffle
    assert spark.read.parquet(out).count() == 10_000


def test_partitioned_export_prunes_at_scan(spark, tmp_path):
    """partition_by writes hive-style col=value dirs; a downstream scan
    filtering on the partition column must prune at PLANNING time
    (PartitionFilters in the scan, only the matching directory's rows)."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.sinks.writers import write_export

    df = spark.range(0, 1000).select(
        "id", (F.col("id") % 4).alias("bucket"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("payload"))
    out = str(tmp_path / "part_out")
    write_export(df, out, "parquet", partition_by=["bucket"])

    import os
    dirs = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert dirs == ["bucket=0", "bucket=1", "bucket=2", "bucket=3"]

    back = spark.read.parquet(out).filter(F.col("bucket") == 2)
    assert back.count() == 250
    plan = back._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "PartitionFilters: [isnotnull(bucket" in plan.replace("#", "")[:10_000] or \
           "PartitionFilters" in plan
    # the pruned scan must not read the other three directories
    assert back.select(F.countDistinct("bucket")).collect()[0][0] == 1


def test_unload_job_partition_by_roundtrip(spark, tmp_path):
    """partition_by flows through the unload pipeline (UnloadJob + CLI arg
    shape) and composes with the observe-count single-pass write."""
    import os

    from databricks_import_pyspark_scripts_spark.plans.pipeline import (
        UnloadJob,
        run_unload,
    )

    src = str(tmp_path / "src")
    (spark.range(0, 120)
     .selectExpr("id", "id % 3 AS grp", "CAST(id AS DOUBLE) AS v")
     .write.parquet(f"{src}/t/v=1"))
    out = str(tmp_path / "out")
    job = UnloadJob(source_root=src, table_versions={"t": [0, 1]},
                    sql="SELECT id, grp, v FROM t", output_path=out,
                    partition_by=["grp"])
    report = run_unload(spark, job)
    assert report["rows"] == 120
    assert sorted(d for d in os.listdir(out) if d.startswith("grp=")) == \
        ["grp=0", "grp=1", "grp=2"]
    # the export root also carries the meta/logs sidecars (reference W3/W4
    # layout), so a partitioned readback targets the partition dirs with
    # basePath — exactly what a downstream consumer of this layout does
    back = (spark.read.option("basePath", out).parquet(f"{out}/grp=*"))
    assert back.count() == 120
    assert set(back.columns) == {"id", "grp", "v"}
