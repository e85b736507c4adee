"""Registry sanity: every query runs at smoke scale; every oracle key has a
query; entry() smoke contract."""

from __future__ import annotations

import pytest

from databricks_import_pyspark_scripts_spark.querylib import all_oracles, all_queries


def test_oracle_keys_subset_of_queries():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_runs_smoke(spark, sf_dir, name):
    df = all_queries()[name](spark, sf_dir)
    assert df.columns  # schema resolves
    assert df.count() >= 0


def test_entry_contract(spark):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as ent
    df = ent.entry(spark)
    assert df.count() > 0
    assert {"time", "user_id", "event_type", "user_properties"} <= set(df.columns)
