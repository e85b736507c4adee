"""CDC filter truth table (reference F1 semantics, SURVEY.md §2c) — the gap
the reference's own tests never covered."""

from __future__ import annotations

import pytest

from databricks_import_pyspark_scripts_spark.operators.cdc import filter_data
from databricks_import_pyspark_scripts_spark.sources.versioned import CDC_COLUMNS

ROWS = [
    (1, None),
    (2, "insert"),
    (3, "update_postimage"),
    (4, "update_preimage"),
    (5, "delete"),
]


@pytest.fixture(scope="module")
def feed(spark):
    df = spark.createDataFrame(ROWS, "id int, _change_type string")
    return (df.withColumn("_commit_version", df.id.cast("long"))
            .withColumn("_commit_timestamp", df.id.cast("timestamp")))


def kept_ids(df):
    return sorted(r.id for r in df.select("id").collect())


def test_event_keeps_null_and_insert(feed):
    out = filter_data(feed, "EVENT")
    assert kept_ids(out) == [1, 2]
    assert not set(out.columns) & set(CDC_COLUMNS)


@pytest.mark.parametrize("dt", ["USER_PROPERTY", "GROUP_PROPERTY", "WAREHOUSE_PROPERTY"])
def test_property_types_also_keep_postimage(feed, dt):
    assert kept_ids(filter_data(feed, dt)) == [1, 2, 3]


def test_mutability_mode_keeps_everything(feed):
    out = filter_data(feed, "EVENT", mutability_mode=True)
    assert kept_ids(out) == [1, 2, 3, 4, 5]
    assert not set(out.columns) & set(CDC_COLUMNS)  # meta still dropped


def test_snapshot_frame_passthrough(spark):
    df = spark.createDataFrame([(1,), (2,)], "id int")
    out = filter_data(df, "EVENT")
    assert kept_ids(out) == [1, 2]  # no _change_type -> untouched


def test_unknown_data_type_rejected(feed):
    with pytest.raises(ValueError):
        filter_data(feed, "BOGUS")
