"""Registry sanity: every query runs at smoke scale; every oracle key has a
query; entry() smoke contract."""

from __future__ import annotations

import pytest

from databricks_import_pyspark_scripts_spark.querylib import all_oracles, all_queries


def test_oracle_keys_subset_of_queries():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25


@pytest.fixture(scope="module")
def duck(sf_dir):
    """DuckDB connection with the testdata views — used to DESCRIBE each
    oracle (plans only, no data read) for the column-parity assert."""
    import duckdb

    from databricks_import_pyspark_scripts_spark.sources.registry import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_runs_smoke(spark, sf_dir, duck, name):
    df = all_queries()[name](spark, sf_dir)
    assert df.columns  # schema resolves
    # column-name parity with the oracle, statically: the driver's compare
    # sorts columns by name before hashing, so an alias mismatch fails the
    # gate even when every value matches. DESCRIBE costs a DuckDB plan,
    # not a read — this pins parity for ALL registered queries every pytest
    # run, not just the ones in the driver's attestation window.
    osql = all_oracles().get(name)
    if osql is not None:
        duck_cols = [r[0] for r in duck.execute(f"DESCRIBE {osql}").fetchall()]
        assert sorted(df.columns) == sorted(duck_cols)
    assert df.count() >= 0


def test_entry_contract(spark):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as ent
    df = ent.entry(spark)
    assert df.count() > 0
    assert {"time", "user_id", "event_type", "user_properties"} <= set(df.columns)
