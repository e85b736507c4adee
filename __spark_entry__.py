"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``databricks_import_pyspark_scripts_spark``: the driver's
verify runs ``entry(spark)`` as a smoke check, runs each ``queries()[name]``
at sf=0.01 against the matching ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the caller's cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from databricks_import_pyspark_scripts_spark.plans.flagship import flagship
from databricks_import_pyspark_scripts_spark.querylib import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship canary-style event shaping on sf0.001 (rows > 0, stable schema)."""
    return flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return all_oracles()
