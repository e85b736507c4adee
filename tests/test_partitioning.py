"""Partition sizing: the reference's boundary cases
(/root/reference/test/unload_databricks_data_to_s3_tests.py:30-34) plus the
target_partitions-wins rule its TODO never tested."""

from __future__ import annotations

import pytest

from databricks_import_pyspark_scripts_spark.operators.partitioning import (
    calculate_num_partitions,
    get_partition_count,
    size_output,
)


def test_boundaries():
    assert get_partition_count(0, 2) == 1   # 0 rows still 1 partition
    assert get_partition_count(1, 2) == 1
    assert get_partition_count(2, 2) == 1
    assert get_partition_count(3, 2) == 2


def test_target_partitions_wins_outright(spark):
    df = spark.range(100)
    # calc would say ceil(100/10)=10; target 3 wins, no count() is run
    assert calculate_num_partitions(df, 10, target_partitions=3) == 3
    assert calculate_num_partitions(df, 10) == 10


def test_size_output_strategies(spark):
    df = spark.range(100)
    assert size_output(df, "none") is df
    assert size_output(df, "repartition", 10).rdd.getNumPartitions() == 10
    assert size_output(df, "coalesce", 10, target_partitions=2).rdd.getNumPartitions() == 2
    with pytest.raises(ValueError):
        size_output(df, "bogus")
