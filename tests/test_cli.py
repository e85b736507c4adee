"""CLI end-to-end: subprocess run of the unload job against a tiny versioned
layout (the reference's operational entry path, C1)."""

from __future__ import annotations

import json
import subprocess
import sys


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
