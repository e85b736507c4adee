"""Source layer: versions-map parser, snapshot/changelog reads, dispatcher,
error classifier. Mirrors the reference's pure-function tests
(/root/reference/test/unload_databricks_data_to_s3_tests.py:14-28) and closes
its untested gaps (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from databricks_import_pyspark_scripts_spark.sources.versioned import (
    ChangelogNotFoundError,
    extract_missing_cdf_error_signature,
    fetch_data,
    parse_table_versions_map,
    read_changes,
    read_snapshot,
)


def test_parse_single_table():
    assert parse_table_versions_map("cat.sch.t=1-2") == {"cat.sch.t": [1, 2]}


def test_parse_two_tables():
    assert parse_table_versions_map("cat.sch.t=1-2,c2.s2.t2=11-12") == {
        "cat.sch.t": [1, 2],
        "c2.s2.t2": [11, 12],
    }


def test_parse_empty_and_bad():
    assert parse_table_versions_map("") == {}
    with pytest.raises(ValueError):
        parse_table_versions_map("nonsense")


def test_error_classifier():
    assert extract_missing_cdf_error_signature(
        Exception("DELTA_CHANGE_DATA_FILE_NOT_FOUND: gone")) == "DELTA_CHANGE_DATA_FILE_NOT_FOUND"
    assert extract_missing_cdf_error_signature(
        Exception("FAILED_READ_FILE.DBR_FILE_NOT_EXIST boom")) == "FAILED_READ_FILE.DBR_FILE_NOT_EXIST"
    assert extract_missing_cdf_error_signature(Exception("other")) is None


@pytest.fixture(scope="module")
def versioned_root(spark, tmp_path_factory):
    """<root>/t/v=1, <root>/t/v=2 snapshots + <root>/t_changes changelog."""
    root = str(tmp_path_factory.mktemp("versioned"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, val string")
    v2 = spark.createDataFrame([(1, "a"), (2, "b2"), (3, "c")], "id int, val string")
    v1.write.parquet(f"{root}/t/v=1")
    v2.write.parquet(f"{root}/t/v=2")
    changes = spark.createDataFrame(
        [
            (2, "b2", "update_postimage", 2, "2024-01-01T00:00:00"),
            (2, "b", "update_preimage", 2, "2024-01-01T00:00:00"),
            (3, "c", "insert", 2, "2024-01-01T00:00:00"),
        ],
        "id int, val string, _change_type string, _commit_version long, _commit_timestamp string",
    )
    changes.write.partitionBy("_commit_version").parquet(f"{root}/t_changes")
    return root


def test_read_snapshot(spark, versioned_root):
    assert read_snapshot(spark, versioned_root, "t", 1).count() == 2
    assert read_snapshot(spark, versioned_root, "t", 2).count() == 3


def test_read_changes_range(spark, versioned_root):
    df = read_changes(spark, versioned_root, "t", 1, 2)
    assert df.count() == 3
    assert set(df.columns) >= {"_change_type", "_commit_version", "_commit_timestamp"}
    # (2, 2] is empty
    assert read_changes(spark, versioned_root, "t", 2, 2).count() == 0


def test_fetch_data_dispatch(spark, versioned_root):
    # start==0 -> snapshot of end, NOT "changes since 0"
    assert fetch_data(spark, versioned_root, "t", 0, 2).count() == 3
    assert "_change_type" in fetch_data(spark, versioned_root, "t", 1, 2).columns


def test_changelog_read_is_partition_pruned(spark, versioned_root):
    """The version-range predicate must land in PartitionFilters (the
    changelog is written partitioned by _commit_version), so an incremental
    read lists only the requested versions' files — O(delta), not
    O(history), at any scale."""
    df = read_changes(spark, versioned_root, "t", 1, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "_commit_version" in pf


def test_missing_snapshot_raises(spark, versioned_root):
    with pytest.raises(ChangelogNotFoundError):
        read_snapshot(spark, versioned_root, "t", 99)
    with pytest.raises(ChangelogNotFoundError):
        read_changes(spark, versioned_root, "missing_table", 1, 2)


def test_vacuumed_changelog_head_detected(spark, tmp_path):
    """Deleted leading version partitions (the VACUUM emulation) must raise
    the classifiable error, not return a silently partial result."""
    import pytest as _pytest

    from databricks_import_pyspark_scripts_spark.sources.versioned import (
        ChangelogNotFoundError,
        extract_missing_cdf_error_signature,
        read_changes,
    )

    from pyspark.sql import functions as F

    root = str(tmp_path)
    df = spark.createDataFrame(
        [(i, "insert", v) for v in (3, 4, 5) for i in range(2)],
        "id long, _change_type string, _commit_version long")
    (df.withColumn("_commit_timestamp", F.current_timestamp())
       .write.partitionBy("_commit_version").parquet(f"{root}/t_changes"))
    # versions 3..5 exist; asking for (2,5] is fine...
    assert read_changes(spark, root, "t", 2, 5).count() == 6
    # ...but (1,5] needs version 2, which was "vacuumed"
    with _pytest.raises(ChangelogNotFoundError) as ei:
        read_changes(spark, root, "t", 1, 5)
    assert extract_missing_cdf_error_signature(ei.value) == "CHANGELOG_NOT_FOUND"


def test_delta_branch_option_plumbing(spark, monkeypatch):
    """The Delta branch (the reference's primary source,
    /root/reference/unload_databricks_data_to_s3.py:183-200) can't run in
    this jars-free sandbox, so pin its option plumbing with a mocked
    reader: versionAsOf for snapshots; readChangeFeed with
    startingVersion = s+1 (the (s, e] range convention) for changes."""
    from unittest import mock

    from databricks_import_pyspark_scripts_spark.sources import versioned

    reader = mock.MagicMock()
    reader.format.return_value = reader
    reader.option.return_value = reader
    reader.load.return_value = mock.sentinel.df
    monkeypatch.setattr(versioned, "_delta_available", lambda _spark: True)
    with mock.patch.object(type(spark), "read",
                           new_callable=mock.PropertyMock,
                           return_value=reader):
        out = versioned.read_snapshot(spark, "/r", "t", 7)
        assert out is mock.sentinel.df
        reader.format.assert_called_once_with("delta")
        reader.option.assert_called_once_with("versionAsOf", 7)
        reader.load.assert_called_once_with("/r/t")

        reader.reset_mock()
        out = versioned.read_changes(spark, "/r", "t", 3, 9)
        assert out is mock.sentinel.df
        reader.format.assert_called_once_with("delta")
        assert reader.option.call_args_list == [
            mock.call("readChangeFeed", "true"),
            mock.call("startingVersion", 4),
            mock.call("endingVersion", 9),
        ]
        reader.load.assert_called_once_with("/r/t")


def test_empty_leading_diff_is_not_vacuum(spark, tmp_path):
    """A committed version with ZERO change rows (identical snapshots) must
    stay readable as an incremental range: commit_snapshot leaves an empty
    _commit_version marker dir, so the eager vacuum check doesn't misread
    the empty leading diff and downgrade the export to latest-only."""
    from databricks_import_pyspark_scripts_spark.sinks.versioned_writer import (
        commit_snapshot,
    )

    root = str(tmp_path)
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, val string")
    commit_snapshot(spark, v1, root, "t", version=1, keys=["id"])
    # v2 == v1: empty diff; v3 adds a row
    commit_snapshot(spark, v1, root, "t", version=2, keys=["id"], base_version=1)
    v3 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, val string")
    commit_snapshot(spark, v3, root, "t", version=3, keys=["id"], base_version=2)
    # (1, 3] starts at the empty diff v2 — must serve, not raise
    df = read_changes(spark, root, "t", 1, 3)
    assert df.count() == 1
    assert df.filter(df._commit_version == 3).count() == 1


def test_commit_snapshot_rejects_version_equal_base(spark, tmp_path):
    """version == base_version would have the lazy diff read the snapshot
    directory the commit just overwrote — rejected eagerly."""
    import pytest as _pytest

    from databricks_import_pyspark_scripts_spark.sinks.versioned_writer import (
        commit_snapshot,
    )

    v1 = spark.createDataFrame([(1, "a")], "id int, val string")
    with _pytest.raises(ValueError, match="base_version"):
        commit_snapshot(spark, v1, str(tmp_path), "t", version=1, keys=["id"],
                        base_version=1)


def test_changelog_schema_evolution_union(spark, tmp_path):
    """Additive schema evolution across versions (Delta CDF behavior): a
    column introduced in a later version must surface as NULL on earlier
    versions' change rows when reading a range spanning both — without
    mergeSchema, whichever partition Spark sampled first would silently
    decide the schema and the other version's column would vanish."""
    from databricks_import_pyspark_scripts_spark.sinks.versioned_writer import (
        commit_snapshot,
    )
    from databricks_import_pyspark_scripts_spark.sources.versioned import (
        read_changes,
    )

    root = str(tmp_path / "evo")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string")
    commit_snapshot(spark, v1, root, "t", version=1, keys=["id"])
    v2 = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b2", 0.7), (3, "c", 0.9)],
        "id long, val string, score double")
    commit_snapshot(spark, v2, root, "t", version=2, keys=["id"],
                    base_version=1)

    ch = read_changes(spark, root, "t", 1, 2)
    assert "score" in ch.columns
    # the old side of the diff never had `score`: preimages are NULL-padded
    pre = ch.filter("_change_type = 'update_preimage'").collect()
    assert pre and all(r.score is None for r in pre)
    # id 1 changed ONLY in the new column — still a real update pair
    assert {r.id for r in pre} == {1, 2}
    post = {r.id: r.score for r in
            ch.filter("_change_type = 'update_postimage'").collect()}
    assert post == {1: 0.5, 2: 0.7}
    ins = {r.id: r.score for r in
           ch.filter("_change_type = 'insert'").collect()}
    assert ins == {3: 0.9}
