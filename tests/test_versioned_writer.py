"""Write-side of the versioned convention: snapshot commits derive CDF rows
(insert/delete/update pre+post) that round-trip through the reader and the
CDC filter — the full Databricks-free Delta-CDF-equivalent cycle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.cdc import derive_changes, filter_data
from databricks_import_pyspark_scripts_spark.sinks.versioned_writer import commit_snapshot
from databricks_import_pyspark_scripts_spark.sources.versioned import fetch_data


@pytest.fixture(scope="module")
def v1(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, score double")


@pytest.fixture(scope="module")
def v2(spark):
    # 1 unchanged, 2 updated, 3 deleted, 4 inserted
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (4, "d", 40.0)],
        "id long, name string, score double")


def test_derive_changes_classification(spark, v1, v2):
    ch = derive_changes(v1, v2, ["id"], commit_version=2)
    got = {(r.id, r._change_type): (r.name, r.score) for r in ch.collect()}
    assert got == {
        (4, "insert"): ("d", 40.0),
        (3, "delete"): ("c", 30.0),
        (2, "update_preimage"): ("b", 20.0),
        (2, "update_postimage"): ("b", 25.0),
    }
    assert all(r._commit_version == 2 for r in ch.collect())


def test_derive_changes_null_safe(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "id long, v string")
    new = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    ch = derive_changes(old, new, ["id"], 5)
    got = {(r.id, r._change_type) for r in ch.collect()}
    # id 1: NULL == NULL -> unchanged; id 2: x -> NULL is an update
    assert got == {(2, "update_preimage"), (2, "update_postimage")}


def test_commit_roundtrip(spark, v1, v2, tmp_path):
    root = str(tmp_path / "vt")
    commit_snapshot(spark, v1, root, "t", version=1, keys=["id"])
    commit_snapshot(spark, v2, root, "t", version=2, keys=["id"], base_version=1)

    # snapshot read (start==0 dispatch)
    assert fetch_data(spark, root, "t", 0, 2).count() == 3
    # incremental read (1, 2]
    inc = fetch_data(spark, root, "t", 1, 2)
    assert inc.count() == 4

    # EVENT semantics: only the insert survives
    ev = filter_data(inc, "EVENT")
    assert [(r.id, r.name) for r in ev.collect()] == [(4, "d")]

    # USER_PROPERTY semantics: insert + postimage
    up = {r.id: r.score for r in filter_data(inc, "USER_PROPERTY").collect()}
    assert up == {4: 40.0, 2: 25.0}


def test_commit_retry_is_idempotent(spark, tmp_path):
    """Re-running commit_snapshot for the same version must not duplicate
    change rows (dynamic partition overwrite of that version's partition)."""
    from databricks_import_pyspark_scripts_spark.sinks.versioned_writer import (
        commit_snapshot,
    )
    from databricks_import_pyspark_scripts_spark.sources.versioned import read_changes

    root = str(tmp_path)
    v1 = spark.createDataFrame([(1, "a")], "id long, v string")
    v2 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    commit_snapshot(spark, v1, root, "t", 1, ["id"])
    commit_snapshot(spark, v2, root, "t", 2, ["id"], base_version=1)
    commit_snapshot(spark, v2, root, "t", 2, ["id"], base_version=1)  # retry
    ch = read_changes(spark, root, "t", 1, 2).collect()
    assert len(ch) == 1 and ch[0]["_change_type"] == "insert"  # not doubled


def test_derive_changes_rejects_missing_key_column(spark):
    """A key column absent from one snapshot must be a hard error, not
    NULL-padded: the join is eqNullSafe, so an all-NULL key conjunct would
    match every old row to every new row (a silent quadratic cross join
    emitted as bogus update pairs)."""
    old = spark.createDataFrame([(1, "a")], "id long, v string")
    new = spark.createDataFrame([("b",)], "v string")  # no id column
    with pytest.raises(ValueError, match="key column 'id' missing from new"):
        derive_changes(old, new, ["id"], 2)
    with pytest.raises(ValueError, match="missing from old"):
        derive_changes(new, old, ["id"], 2)


def test_vacuum_table_removes_prefix_and_triggers_cdf_error(spark, tmp_path):
    import pytest as _pytest

    from databricks_import_pyspark_scripts_spark.sinks.versioned_writer import (
        commit_snapshot,
        vacuum_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.versioned import (
        ChangelogNotFoundError,
        extract_missing_cdf_error_signature,
        read_changes,
        read_snapshot,
    )

    root = str(tmp_path)
    for v in (1, 2, 3):
        df = spark.createDataFrame(
            [(i, f"v{v}") for i in range(3 + v)], "id long, payload string")
        commit_snapshot(spark, df, root, "t", v, ["id"],
                        base_version=v - 1 if v > 1 else None)
    # full range readable before the vacuum
    assert read_changes(spark, root, "t", 1, 3).count() > 0

    removed = vacuum_table(spark, root, "t", keep_from_version=3)
    assert removed["snapshots"] == [1, 2]
    # the first commit has no base, so no v=1 changelog partition exists
    assert set(removed["changes"]) == {2}

    # the latest snapshot survives; the vacuumed prefix raises the
    # CLASSIFIED error (E1), which the pipeline's E2 fallback consumes
    assert read_snapshot(spark, root, "t", 3).count() == 6
    with _pytest.raises(ChangelogNotFoundError) as ei:
        read_changes(spark, root, "t", 1, 3)
    assert extract_missing_cdf_error_signature(ei.value) == "CHANGELOG_NOT_FOUND"
    # idempotent: a second vacuum removes nothing
    assert vacuum_table(spark, root, "t", 3) == {
        "snapshots": [], "changes": []}


def test_optimize_table_compacts_and_preserves_data(spark, tmp_path):
    """OPTIMIZE: many small files -> a new version with few sized files,
    identical data, and an empty changelog marker (layout commit, not a
    data commit) -- so snapshot readers get the compacted files and
    incremental readers see a zero-row diff, not a vacuumed hole."""
    from databricks_import_pyspark_scripts_spark.sinks.versioned_writer import (
        commit_snapshot,
        optimize_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.versioned import (
        read_changes,
        read_snapshot,
    )

    root = str(tmp_path)
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"))
    commit_snapshot(spark, df.repartition(64), root, "t", 1, keys=["id"])
    report = optimize_table(spark, root, "t", target_partitions=4)
    assert report == {"from_version": 1, "to_version": 2,
                      "files_before": 64, "files_after": 4}
    back = read_snapshot(spark, root, "t", 2)
    assert back.count() == 10_000
    assert back.orderBy("id").collect() == df.orderBy("id").collect()
    # the layout commit serves an EMPTY incremental diff, not an error
    assert read_changes(spark, root, "t", 1, 2).count() == 0
    # old version intact until vacuum retires it (OPTIMIZE-then-VACUUM)
    assert read_snapshot(spark, root, "t", 1).count() == 10_000


def test_optimize_table_zorder_clusters_new_version(spark, tmp_path):
    """zorder_by recluster: the new version's files carry tight min/max
    footer bounds on BOTH dimensions (row-weighted skippable fraction
    measured from the written row groups, same metric as test_zorder)."""
    import glob

    import pyarrow.parquet as pq

    from databricks_import_pyspark_scripts_spark.sinks.versioned_writer import (
        optimize_table,
        write_snapshot,
    )

    root = str(tmp_path)
    df = spark.range(40_000).select(
        (F.col("id") % 1000).alias("x"),
        F.pmod(F.hash("id"), F.lit(1000)).alias("y"))
    write_snapshot(df.repartition(32), root, "t", 1)
    report = optimize_table(spark, root, "t", target_partitions=16,
                            zorder_by=["x", "y"])
    assert report["to_version"] == 2 and report["files_after"] <= 16

    def skippable(col):
        total = skip = 0
        for f in glob.glob(f"{root}/t/v=2/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                s = {g.column(i).path_in_schema: g.column(i).statistics
                     for i in range(g.num_columns)}[col]
                total += g.num_rows
                if s.max < 100 or s.min > 150:
                    skip += g.num_rows
        return skip / total

    assert skippable("x") >= 0.5 and skippable("y") >= 0.5


def test_optimize_table_requires_snapshot(spark, tmp_path):
    from databricks_import_pyspark_scripts_spark.sinks.versioned_writer import (
        optimize_table,
    )

    with pytest.raises(ValueError, match="no snapshots"):
        optimize_table(spark, str(tmp_path), "missing")


def test_schema_drift_report(spark, tmp_path):
    from databricks_import_pyspark_scripts_spark.sinks.versioned_writer import (
        schema_drift_report,
        write_snapshot,
    )

    root = str(tmp_path)
    v1 = spark.createDataFrame([(1, "a", 1.5)], "id long, s string, v double")
    v2 = spark.createDataFrame([(1, 2, True)], "id long, v int, flag boolean")
    write_snapshot(v1, root, "t", 1)
    write_snapshot(v2, root, "t", 2)
    got = schema_drift_report(spark, root, "t", 1, 2)
    assert got == [
        {"column": "flag", "change": "added",
         "from_type": None, "to_type": "boolean"},
        {"column": "s", "change": "removed",
         "from_type": "string", "to_type": None},
        {"column": "v", "change": "type_changed",
         "from_type": "double", "to_type": "int"},
    ]
    assert schema_drift_report(spark, root, "t", 1, 1) == []
