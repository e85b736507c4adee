"""VOID-scrub golden schema tests: the reference's own 9-column nested
fixture (/root/reference/test/unload_databricks_data_to_s3_tests.py:41-64,
FIXTURES.md A.3) plus the deeper edge cases it missed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    NullType,
    StringType,
    StructField,
    StructType,
)

from databricks_import_pyspark_scripts_spark.operators.void_scrub import drop_void_fields

SCHEMA = StructType([
    StructField("id", IntegerType(), True),
    StructField("name", StringType(), True),
    StructField("void_field", NullType(), True),
    StructField("empty_struct", StructType([
        StructField("void_nested", NullType(), True)]), True),
    StructField("mixed_struct", StructType([
        StructField("valid_field", StringType(), True),
        StructField("void_field", NullType(), True)]), True),
    StructField("void_array", ArrayType(NullType()), True),
    StructField("valid_array", ArrayType(StringType()), True),
    StructField("void_map", MapType(StringType(), NullType()), True),
    StructField("valid_map", MapType(StringType(), StringType()), True),
])

DATA = [
    (1, "Alice", None, (None,), ("valid_value", None), [], ["item1", "item2"], {}, {"key1": "value1"}),
    (2, "Bob", None, (None,), ("another_value", None), [], [], {}, {}),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    return drop_void_fields(spark.createDataFrame(DATA, SCHEMA))


def test_reference_fixture_schema(scrubbed):
    names = [f.name for f in scrubbed.schema.fields]
    assert "void_field" not in names          # top-level VOID dropped
    assert "void_array" not in names          # array<void> dropped
    assert "void_map" not in names            # map<_,void> dropped
    assert "empty_struct" in names            # all-void struct -> NULL column
    assert "valid_array" in names and "valid_map" in names
    mixed = next(f for f in scrubbed.schema.fields if f.name == "mixed_struct")
    assert [sf.name for sf in mixed.dataType.fields] == ["valid_field"]


def test_result_is_parquet_writable(scrubbed, tmp_path):
    # the operator's whole purpose; also catches our all-void-struct
    # NULL-as-string improvement over the reference's VOID-typed NULL
    scrubbed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert not any(isinstance(f.dataType, NullType) for f in scrubbed.schema.fields)


def test_values_survive(scrubbed):
    rows = {r.id: r for r in scrubbed.collect()}
    assert rows[1].mixed_struct.valid_field == "valid_value"
    assert rows[1].valid_array == ["item1", "item2"]
    assert rows[1].valid_map == {"key1": "value1"}
    assert rows[1].empty_struct is None


def test_nested_all_void_struct_removed(spark):
    # reference bug we fix: nested all-void structs resurface as VOID fields
    schema = StructType([
        StructField("id", IntegerType(), True),
        StructField("outer", StructType([
            StructField("keep", StringType(), True),
            StructField("inner_void", StructType([
                StructField("v", NullType(), True)]), True),
        ]), True),
    ])
    df = spark.createDataFrame([(1, ("x", (None,)))], schema)
    out = drop_void_fields(df)
    outer = next(f for f in out.schema.fields if f.name == "outer")
    assert [sf.name for sf in outer.dataType.fields] == ["keep"]
    assert not any(isinstance(sf.dataType, NullType) for sf in outer.dataType.fields)


def test_null_struct_stays_null(spark):
    schema = StructType([
        StructField("s", StructType([
            StructField("keep", StringType(), True),
            StructField("v", NullType(), True)]), True),
    ])
    df = spark.createDataFrame([((None),), ((("x", None)),)], schema)
    out = drop_void_fields(df).collect()
    vals = sorted((r.s is None for r in out), reverse=True)
    assert vals == [True, False]  # NULL struct preserved as NULL


def test_array_elements_cleaned(spark):
    schema = StructType([
        StructField("arr", ArrayType(StructType([
            StructField("keep", StringType(), True),
            StructField("v", NullType(), True)])), True),
    ])
    df = spark.createDataFrame([([("a", None), ("b", None)],)], schema)
    row = drop_void_fields(df).collect()[0]
    assert [e.keep for e in row.arr] == ["a", "b"]


def test_no_void_noop(spark, sf_dir):
    from databricks_import_pyspark_scripts_spark.sources.registry import load_table
    df = load_table(spark, sf_dir, "nation")
    assert drop_void_fields(df) is df  # zero-cost when schema is clean
