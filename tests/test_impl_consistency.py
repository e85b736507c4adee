"""The bulk (explode/codegen) and column-expression forms of SimHash and LSH
bucketing must produce byte-identical results — they share oracle SQL twins,
so silent divergence would surface as confusing gate failures later."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.dedup import simhash_col, simhash_df
from databricks_import_pyspark_scripts_spark.operators.similarity import (
    lsh_bucket_col,
    lsh_buckets_df,
)
from databricks_import_pyspark_scripts_spark.sources.registry import load_table


def test_simhash_forms_agree(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(100)
    wide = {r.doc_id: r.s for r in
            d.select("doc_id", simhash_col(F.col("text")).alias("s")).collect()}
    bulk = {r.doc_id: r.simhash for r in simhash_df(d, "doc_id", "text").collect()}
    assert wide == bulk


def test_lsh_bucket_forms_agree(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(100)
    col_form = {r.vec_id: r.b for r in
                e.select("vec_id",
                         lsh_bucket_col(F.col("embedding")).alias("b")).collect()}
    df_form = {r.vec_id: r.bucket for r in
               lsh_buckets_df(e, "vec_id", "embedding").collect()}
    assert col_form == df_form


def test_simhash_forms_agree_on_null_and_empty(spark):
    """simhash_df must match simhash_col on the degenerate inputs too:
    NULL text (col form yields 0) and token-less text (all bits set) —
    previously NULL-text docs vanished from simhash_df entirely."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_col,
        simhash_df,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "!!! ???"), (4, "")],
        "doc_id long, text string")
    col_form = {r.doc_id: r.s for r in
                df.select("doc_id", simhash_col(F.col("text")).alias("s")).collect()}
    df_form = {r.doc_id: r.simhash for r in
               simhash_df(df, "doc_id", "text").collect()}
    assert set(df_form) == {1, 2, 3, 4}           # nobody vanishes
    assert df_form == col_form                     # bit-identical forms
    assert df_form[2] == 0                         # NULL text
    assert df_form[3] == 2 ** SIMHASH_BITS - 1     # tokenless text
