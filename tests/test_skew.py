"""Salted aggregation/join correctness: results must equal the unsalted
equivalents regardless of salt count."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.skew import (
    salted,
    salted_agg,
    salted_join,
)


def test_salt_range(spark):
    df = salted(spark.range(1000), num_salts=8)
    vals = {r._salt for r in df.select("_salt").distinct().collect()}
    assert vals <= set(range(8)) and len(vals) > 1


def test_salted_agg_matches_plain(spark):
    # heavily skewed: 90% of rows share key 0
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"))
    plain = {(r.k): (r.s, r.n) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count(F.lit(1)).alias("n")).collect()}
    got = {(r.k): (r.s, r.n) for r in salted_agg(
        df, ["k"],
        aggs=[F.sum("s").alias("s"), F.sum("n").alias("n")],
        partial_aggs=[F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")],
        num_salts=16).collect()}
    assert got == plain


def test_salted_join_matches_plain(spark):
    big = spark.range(5000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("rid"))
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e"), (9, "zz")],
        "k long, label string")
    plain = big.join(small, "k").groupBy("label").count()
    got = salted_join(big, small, "k", num_salts=8).groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, got.collect()))


def test_salted_join_left(spark):
    big = spark.range(100).select((F.col("id") % 3).alias("k"), "id")
    small = spark.createDataFrame([(0, "x")], "k long, label string")
    got = salted_join(big, small, "k", num_salts=4, how="left")
    assert got.count() == 100
    assert got.filter(F.col("label").isNull()).count() == 66


def test_salted_topk_matches_plain(spark):
    from pyspark.sql.window import Window

    from databricks_import_pyspark_scripts_spark.operators.skew import salted_topk

    df = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, "hot")
         .otherwise((F.col("id") % 23).cast("string")).alias("k"),
        (F.col("id") * 7919 % 104729).alias("v"), F.col("id"))
    order = [F.col("v").desc(), F.col("id")]
    w = Window.partitionBy("k").orderBy(*order)
    plain = {(r.k, r.rank): (r.v, r.id) for r in
             df.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= 50).collect()}
    got = {(r.k, r.rank): (r.v, r.id) for r in
           salted_topk(df, ["k"], order, k=50, num_salts=8).collect()}
    assert got == plain and len(got) > 50
