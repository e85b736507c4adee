"""Bucketed tables: the shuffle-free co-located join strategy for repeated
big-big joins at scale (SCALE.md). Writing both sides bucketed by the join
key lets Spark plan a SortMergeJoin with NO Exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # spark.sql.warehouse.dir is static; tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (load_table(spark, sf_dir, "lineitem")
     .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("li_b"))
    (load_table(spark, sf_dir, "orders")
     .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("ord_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li = spark.table("li_b")
    o = spark.table("ord_b")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    # disable AQE broadcast demotion noise for a stable plan read
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # a bucket-aligned join needs no shuffle on either side
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan[:2000]
    # and the result is correct
    assert joined.count() == li.count()


def test_bucketed_agg_avoids_shuffle(spark, bucketed):
    li = spark.table("li_b")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert agg.count() > 0
