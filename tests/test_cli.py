"""CLI end-to-end: subprocess run of the unload job against a tiny versioned
layout (the reference's operational entry path, C1)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest


def test_cli_unload(spark, tmp_path):
    root = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, name string, v double"
    ).write.parquet(f"{root}/tbl/v=3")

    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root,
         "--table-versions-map", "tbl=0-3",
         "--sql", "SELECT id, UPPER(name) AS uname, v * 10 AS v10 FROM tbl",
         "--output-path", out,
         "--format", "json",
         "--partitioning-strategy", "repartition"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
             "HOME": "/root", "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["rows"] == 2
    got = spark.read.json(f"{out}/part-*")
    assert sorted(r.uname for r in got.collect()) == ["A", "B"]


def test_cli_requires_sql(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", str(tmp_path), "--table-versions-map", "t=0-1",
         "--output-path", str(tmp_path / "o")],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert proc.returncode == 2


def test_cli_cluster_by_produces_range_clustered_parquet(spark, tmp_path):
    """--cluster-by flows CLI -> UnloadJob -> write_export: the export's
    parquet files carry narrow, disjoint ranges of the cluster column."""
    import glob

    import pyarrow.parquet as pq

    root = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.range(0, 2000).selectExpr("id", "id % 7 AS grp") \
        .repartition(4).write.parquet(f"{root}/tbl/v=1")

    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root,
         "--table-versions-map", "tbl=0-1",
         "--sql", "SELECT id, grp FROM tbl",
         "--output-path", out,
         "--format", "parquet",
         "--cluster-by", "id",
         "--max-records-per-file", "500"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
             "HOME": "/root", "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["rows"] == 2000
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 2  # maxRecordsPerFile=500 over 2000 rows
    ranges = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index("id")
        stats = [meta.row_group(rg).column(idx).statistics
                 for rg in range(meta.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    overlaps = sum(1 for (l1, h1), (l2, h2) in zip(ranges, ranges[1:])
                   if h1 > l2)
    # AQE may coalesce the tiny range shuffle into one partition which
    # maxRecordsPerFile then splits sequentially — still perfectly
    # clustered; assert no overlapping file ranges either way
    assert overlaps == 0, f"overlapping file ranges: {ranges}"


def test_cli_maintenance_lifecycle(spark, tmp_path):
    """optimize -> drift -> vacuum through the CLI: compaction commits a
    new version, the drift report is empty (same schema), vacuum retires
    the original, and the compacted snapshot still serves reads."""
    import json

    root = str(tmp_path / "lake")
    (spark.range(5000).selectExpr("id", "id % 5 AS grp")
     .repartition(16).write.parquet(f"{root}/t/v=1"))

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
             "--source-root", root, "--table", "t", *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300)

    p1 = run("--maintenance", "optimize", "--optimize-partitions", "2")
    assert p1.returncode == 0, p1.stderr[-2000:]
    rep = json.loads(p1.stdout.strip().splitlines()[-1])
    assert rep["to_version"] == 2 and rep["files_after"] == 2

    p2 = run("--maintenance", "drift", "--drift-from", "1", "--drift-to", "2")
    assert p2.returncode == 0, p2.stderr[-2000:]
    assert json.loads(p2.stdout.strip().splitlines()[-1]) == []

    p3 = run("--maintenance", "vacuum", "--keep-from-version", "2")
    assert p3.returncode == 0, p3.stderr[-2000:]
    assert json.loads(p3.stdout.strip().splitlines()[-1])["snapshots"] == [1]
    assert spark.read.parquet(f"{root}/t/v=2").count() == 5000

    # arg validation: maintenance needs --table; vacuum needs the version
    p4 = run("--maintenance", "vacuum")
    assert p4.returncode == 2


def test_cli_neardup_index_build_and_probe(spark, tmp_path):
    """The neardup-index maintenance verb: build the band index of the
    latest snapshot through the CLI, then probe it with
    incremental_neardup and find a planted near-dup — the full
    ingest-side workflow a production pipeline schedules."""
    import json

    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        incremental_neardup,
    )

    base = ("the quick brown fox jumps over the lazy dog and naps "
            "in the warm afternoon sun beside the old oak tree")
    root = str(tmp_path / "lake")
    hist = spark.createDataFrame(
        [(1, base), (2, "unrelated historical text about engines")],
        "doc_id long, text string")
    hist.write.parquet(f"{root}/docs/v=1")
    idx_path = str(tmp_path / "band_index")
    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "docs",
         "--maintenance", "neardup-index", "--output-path", idx_path],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["snapshot_version"] == 1 and rep["band_rows"] > 0
    stored = spark.read.parquet(idx_path)
    newb = spark.createDataFrame(
        [(100, base + " again")], "doc_id long, text string")
    got = incremental_neardup(hist, newb, "doc_id", "text",
                              threshold=0.5, index=stored).collect()[0]
    assert got.has_near_dup and got.best_match_id == 1
    # arg validation: the verb needs --output-path
    p2 = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "docs",
         "--maintenance", "neardup-index"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert p2.returncode == 2


def test_cli_delta_ingest_ticks(spark, tmp_path):
    """delta-ingest verb: tick 1 pulls the full CDF history from a REAL
    Delta table dir and persists the mark; tick 2 is a no-op; after a new
    commit, tick 3 pulls only the delta into its own range= dir."""
    import os

    from delta_fixture import V2_TS_MS, _commit, make_delta_table

    root = str(tmp_path / "src")
    make_delta_table(os.path.join(root, "tbl"))
    out = str(tmp_path / "ingest")
    state = str(tmp_path / "state" / "hwm")

    def tick():
        proc = subprocess.run(
            [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
             "--source-root", root, "--table", "tbl",
             "--maintenance", "delta-ingest",
             "--state-path", state, "--output-path", out],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
            env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
                 "HOME": "/root",
                 "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    r1 = tick()
    assert r1["high_water_mark"] == 2 and r1["new_data"]
    assert r1["range"] == [0, 2] and r1["rows"] > 0
    r2 = tick()
    assert r2["high_water_mark"] == 2 and not r2["new_data"]
    _commit(os.path.join(root, "tbl", "_delta_log"), 3, [
        {"commitInfo": {"timestamp": V2_TS_MS + 1000, "operation": "DELETE"}},
        {"remove": {"path": "part=a/f4.parquet", "deletionTimestamp": 9,
                    "dataChange": True, "partitionValues": {"part": "a"}}}])
    r3 = tick()
    assert r3["high_water_mark"] == 3 and r3["range"] == [3, 3]
    assert r3["rows"] == 2  # ids 7, 8 deleted
    got = spark.read.parquet(f"{out}/range=3-3")
    assert sorted(r.id for r in got.collect()) == [7, 8]


def test_cli_unload_delta_destination(spark, tmp_path):
    """--format delta end-to-end through the subprocess CLI: the export
    lands as a real Delta table (read back through the log-replay
    reader), sidecars under underscore names."""
    import os

    from databricks_import_pyspark_scripts_spark.sources.delta_log import (
        read_delta_snapshot,
    )

    root = str(tmp_path / "src")
    out = str(tmp_path / "out_delta")
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, name string, v double"
    ).write.parquet(f"{root}/tbl/v=3")

    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root,
         "--table-versions-map", "tbl=0-3",
         "--sql", "SELECT id, UPPER(name) AS uname, v * 10 AS v10 FROM tbl",
         "--output-path", out,
         "--format", "delta"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
             "HOME": "/root", "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["rows"] == 2
    snap = read_delta_snapshot(spark, out)
    assert sorted(r.uname for r in snap.collect()) == ["A", "B"]
    assert os.path.exists(os.path.join(out, "_meta"))
    assert os.path.exists(os.path.join(out, "_delta_log"))


def test_cli_delta_maintenance_verbs(spark, tmp_path):
    """delta-optimize / delta-checkpoint / delta-vacuum drive the
    transactional writer's maintenance surface through the subprocess CLI
    against a real Delta table dir."""
    import os

    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        append_delta,
        create_delta_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_log import (
        read_delta_snapshot,
    )

    root = str(tmp_path / "root")
    t = f"{root}/tbl"
    create_delta_table(
        spark,
        spark.range(0, 50).selectExpr("id AS k", "CAST(id AS double) AS v"),
        t, ts_ms=1000)
    for i in range(2):
        append_delta(
            spark,
            spark.range(50 + i * 10, 60 + i * 10)
            .selectExpr("id AS k", "CAST(id AS double) AS v"),
            t, ts_ms=2000 + i)

    env = {"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAVA_HOME": os.environ.get("JAVA_HOME", "")}

    def verb(*extra):
        proc = subprocess.run(
            [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
             "--source-root", root, "--table", "tbl", *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
            env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    rep = verb("--maintenance", "delta-optimize")
    assert rep["files_after"] <= rep["files_before"]
    rep = verb("--maintenance", "delta-checkpoint")
    assert rep["checkpoint_version"] >= 2
    assert os.path.exists(os.path.join(
        t, "_delta_log", f"{rep['checkpoint_version']:020d}.checkpoint.parquet"))
    rep = verb("--maintenance", "delta-vacuum", "--retention-hours", "0")
    assert rep["deleted_files"] >= 0
    assert read_delta_snapshot(spark, t).count() == 70


def test_cli_iceberg_ingest_tick(spark, tmp_path):
    """iceberg-ingest subprocess e2e: one tick pulls the full history into
    a range dir and persists the ordinal mark; a second tick is a no-op."""
    import os

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        write_iceberg_table,
    )

    root = str(tmp_path / "root")
    a = spark.range(0, 9).selectExpr("id AS k", "CAST(id AS double) AS v")
    b = spark.range(9, 12).selectExpr("id AS k", "CAST(id AS double) AS v")
    write_iceberg_table(spark, [a, b], f"{root}/tbl")
    out = str(tmp_path / "out")
    mark = str(tmp_path / "mark")

    def tick():
        proc = subprocess.run(
            [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
             "--source-root", root, "--table", "tbl",
             "--maintenance", "iceberg-ingest",
             "--output-path", out, "--state-path", mark],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
            env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
                 "HOME": "/root",
                 "JAVA_HOME": os.environ.get("JAVA_HOME", "")})
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    rep = tick()
    assert rep["high_water_mark"] == 1 and rep["new_data"]
    assert rep["rows"] == 12 and rep["range"] == [0, 1]
    assert spark.read.parquet(f"{out}/range=0-1").count() == 12
    rep2 = tick()
    assert rep2["high_water_mark"] == 1 and not rep2["new_data"]


def test_cli_iceberg_append(spark, tmp_path):
    """iceberg-append subprocess e2e: rows from a parquet input land as a
    new CAS-committed snapshot; the reader sees base + appended."""
    import os

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        read_iceberg_snapshot,
        write_iceberg_table,
    )

    root = str(tmp_path / "root")
    a = spark.range(0, 9).selectExpr("id AS k", "CAST(id AS double) AS v")
    write_iceberg_table(spark, [a], f"{root}/tbl")
    add = spark.range(9, 14).selectExpr("id AS k", "CAST(id AS double) AS v")
    src = str(tmp_path / "add_rows")
    add.coalesce(1).write.parquet(src)

    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "tbl",
         "--maintenance", "iceberg-append", "--append-input", src],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
             "HOME": "/root",
             "JAVA_HOME": os.environ.get("JAVA_HOME", "")})
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["rows_appended"] == 5 and rep["snapshots"] == 2
    got = sorted(r.k for r in
                 read_iceberg_snapshot(spark, f"{root}/tbl").collect())
    assert got == list(range(14))


def test_cli_iceberg_delete_where(spark, tmp_path):
    """iceberg-delete-where subprocess e2e: the DML verb commits one
    merge-on-read delete snapshot; the reader no longer serves the
    matched rows; a second no-match run commits nothing."""
    import os

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        read_iceberg_snapshot,
        write_iceberg_table,
    )

    root = str(tmp_path / "root")
    a = spark.range(0, 20).selectExpr("id AS k", "CAST(id AS double) AS v")
    write_iceberg_table(spark, [a], f"{root}/tbl")

    env = {"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "JAVA_HOME": os.environ.get("JAVA_HOME", "")}
    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "tbl",
         "--maintenance", "iceberg-delete-where",
         "--delete-predicate", "k % 4 = 1"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["deleted_any"] and rep["live_rows"] == 15
    got = sorted(r.k for r in
                 read_iceberg_snapshot(spark, f"{root}/tbl").collect())
    assert got == [k for k in range(20) if k % 4 != 1]

    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "tbl",
         "--maintenance", "iceberg-delete-where",
         "--delete-predicate", "k < 0"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert not rep["deleted_any"] and rep["live_rows"] == 15


def test_cli_iceberg_set_and_drop_ref(spark, tmp_path):
    """iceberg-set-ref / iceberg-drop-ref subprocess e2e: a tag pinned at
    the first snapshot resolves through the reader, then drops."""
    import os

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        read_iceberg_snapshot,
        write_iceberg_table,
    )

    root = str(tmp_path / "root")
    a = spark.range(0, 9).selectExpr("id AS k", "CAST(id AS double) AS v")
    b = spark.range(9, 14).selectExpr("id AS k", "CAST(id AS double) AS v")
    write_iceberg_table(spark, [a, b], f"{root}/tbl")
    env = {"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "JAVA_HOME": os.environ.get("JAVA_HOME", "")}
    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "tbl",
         "--maintenance", "iceberg-set-ref", "--ref-name", "v1",
         "--ref-type", "tag", "--ref-snapshot-id", "1000"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["ref"] == "v1" and rep["metadata_version"] == 3
    got = sorted(r.k for r in read_iceberg_snapshot(
        spark, f"{root}/tbl", ref="v1").collect())
    assert got == list(range(9))
    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "tbl",
         "--maintenance", "iceberg-drop-ref", "--ref-name", "v1"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    with pytest.raises(FileNotFoundError):
        read_iceberg_snapshot(spark, f"{root}/tbl", ref="v1")


def test_cli_delta_clone_and_rewrite_manifests(spark, tmp_path):
    """delta-clone and iceberg-rewrite-manifests subprocess e2e."""
    import os

    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        create_delta_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        iceberg_metadata_table,
        write_iceberg_table,
    )

    root = str(tmp_path / "root")
    df = spark.range(0, 12).selectExpr("id AS k", "CAST(id AS double) AS v")
    create_delta_table(spark, df, f"{root}/dtbl", ts_ms=1000)
    env = {"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "JAVA_HOME": os.environ.get("JAVA_HOME", "")}
    dst = str(tmp_path / "cl")
    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "dtbl",
         "--maintenance", "delta-clone", "--clone-target", dst],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["rows"] == 12

    commits = [spark.range(i * 5, (i + 1) * 5).selectExpr(
        "id AS k", "CAST(id AS double) AS v") for i in range(3)]
    write_iceberg_table(spark, commits, f"{root}/itbl")
    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "itbl",
         "--maintenance", "iceberg-rewrite-manifests"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["rewritten"] and rep["data_manifests"] == 1
    mans = iceberg_metadata_table(spark, f"{root}/itbl",
                                  "manifests").collect()
    assert sum(m.content == 0 for m in mans) == 1


def test_cli_uniform_sync_and_row_lineage(spark, tmp_path):
    """uniform-sync and iceberg-enable-row-lineage subprocess e2e."""
    import os

    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        create_delta_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        read_iceberg_snapshot_with_row_ids,
        write_iceberg_table,
    )

    root = str(tmp_path / "root")
    df = spark.range(0, 15).selectExpr("id AS k", "CAST(id AS double) AS v")
    create_delta_table(spark, df, f"{root}/dtbl", ts_ms=1000)
    env = {"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "JAVA_HOME": os.environ.get("JAVA_HOME", "")}
    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "dtbl",
         "--maintenance", "uniform-sync"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert json.loads(proc.stdout.strip().splitlines()[-1])["rows"] == 15

    write_iceberg_table(spark, [df], f"{root}/itbl")
    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "itbl",
         "--maintenance", "iceberg-enable-row-lineage"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["format_version"] == 3 and rep["next_row_id"] == 15
    ids = sorted(r._row_id for r in read_iceberg_snapshot_with_row_ids(
        spark, f"{root}/itbl").collect())
    assert ids == list(range(15))


def test_cli_iceberg_update_where(spark, tmp_path):
    """iceberg-update-where subprocess e2e: one atomic MoR commit
    updates the matched rows in place."""
    import os

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        read_iceberg_snapshot,
        write_iceberg_table,
    )

    root = str(tmp_path / "root")
    a = spark.range(0, 12).selectExpr("id AS k", "CAST(id AS double) AS v")
    write_iceberg_table(spark, [a], f"{root}/tbl")

    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "tbl",
         "--maintenance", "iceberg-update-where",
         "--delete-predicate", "k % 3 = 0",
         "--set-exprs", '{"v": "v + 100"}'],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
             "HOME": "/root",
             "JAVA_HOME": os.environ.get("JAVA_HOME", "")})
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["updated_any"] and rep["live_rows"] == 12
    got = {r.k: r.v for r in
           read_iceberg_snapshot(spark, f"{root}/tbl").collect()}
    assert got == {k: float(k) + (100 if k % 3 == 0 else 0)
                   for k in range(12)}


def test_cli_iceberg_merge_catalog(spark, tmp_path):
    """iceberg-merge-catalog subprocess e2e: the MERGE commits through
    the FileRestCatalog CommitTableRequest path — matched keys update,
    fresh keys insert, the catalog head advances to the new snapshot."""
    import os

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        read_iceberg_snapshot,
        write_iceberg_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.rest_catalog import (
        FileRestCatalog,
    )

    root = str(tmp_path / "root")
    wh = str(tmp_path / "wh")
    a = spark.range(0, 10).selectExpr("id AS k", "CAST(id AS double) AS v")
    write_iceberg_table(spark, [a], f"{root}/tbl")
    FileRestCatalog(wh).register_table("db", "tbl", f"{root}/tbl")
    srcdir = str(tmp_path / "src_rows")
    spark.createDataFrame([(3, 30.0), (12, 12.0)], "k long, v double") \
        .coalesce(1).write.parquet(srcdir)

    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "db.tbl",
         "--maintenance", "iceberg-merge-catalog",
         "--warehouse", wh,
         "--append-input", srcdir, "--merge-on", "k",
         "--set-exprs", '{"v": "s.v"}'],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
             "HOME": "/root",
             "JAVA_HOME": os.environ.get("JAVA_HOME", "")})
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["merged_any"]
    cat = FileRestCatalog(wh)
    meta = cat.load_table("db", "tbl")["metadata"]
    assert meta["current-snapshot-id"] == rep["snapshot_id"]
    got = {r.k: r.v for r in
           read_iceberg_snapshot(spark, f"{root}/tbl").collect()}
    expect = {k: float(k) for k in range(10)}
    expect[3], expect[12] = 30.0, 12.0
    assert got == expect


def test_cli_iceberg_merge(spark, tmp_path):
    """iceberg-merge subprocess e2e: upsert source rows from a parquet
    input through the MERGE verb — matched keys update, fresh keys
    insert, one atomic snapshot."""
    import os

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        read_iceberg_snapshot,
        write_iceberg_table,
    )

    root = str(tmp_path / "root")
    a = spark.range(0, 10).selectExpr("id AS k", "CAST(id AS double) AS v")
    write_iceberg_table(spark, [a], f"{root}/tbl")
    srcdir = str(tmp_path / "src_rows")
    spark.createDataFrame([(3, 30.0), (12, 12.0)], "k long, v double") \
        .coalesce(1).write.parquet(srcdir)

    proc = subprocess.run(
        [sys.executable, "-m", "databricks_import_pyspark_scripts_spark.cli",
         "--source-root", root, "--table", "tbl",
         "--maintenance", "iceberg-merge",
         "--append-input", srcdir, "--merge-on", "k",
         "--set-exprs", '{"v": "s.v"}'],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
             "HOME": "/root",
             "JAVA_HOME": os.environ.get("JAVA_HOME", "")})
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["merged_any"] and rep["live_rows"] == 11
    got = {r.k: r.v for r in
           read_iceberg_snapshot(spark, f"{root}/tbl").collect()}
    expect = {k: float(k) for k in range(10)}
    expect[3], expect[12] = 30.0, 12.0
    assert got == expect
