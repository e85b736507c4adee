from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from databricks_import_pyspark_scripts_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spark_graft_tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
