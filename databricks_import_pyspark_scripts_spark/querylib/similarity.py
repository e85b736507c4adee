"""Similarity-search queries over ``embeddings``: brute-force cosine top-k
(the exact baseline) and sign-random-projection LSH top-k (the scale path).

Both are fully value-checked against DuckDB: the hyperplanes are deterministic
(seeded) Rademacher vectors embedded as literals in the generated oracle SQL,
and bucket math is integer-exact (operators.similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    QUANT_SCALE,
    brute_force_topk,
    lsh_topk,
    rademacher_planes,
)
from ..sources.registry import load_table
from . import register

# every 50th vector is a query — keeps brute force at |V|^2/50 pairs
QUERY_MOD = 50
TOP_K = 5

_COS_SQL = ("list_dot_product(CAST(q.q_embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[]))"
            " / sqrt(list_dot_product(CAST(q.q_embedding AS DOUBLE[]), CAST(q.q_embedding AS DOUBLE[]))"
            " * list_dot_product(CAST(v.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[])))")


def _bucket_sql(vec_expr: str) -> str:
    """Generated bucket expression: must mirror operators.similarity.lsh_bucket_col."""
    planes = rademacher_planes()
    q = (f"list_transform(CAST({vec_expr} AS DOUBLE[]), "
         f"x -> CAST(round(x * {QUANT_SCALE}) AS BIGINT))")
    terms = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(str(w) for w in plane) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({q}, CAST({lit} AS BIGINT[])) >= 0 "
            f"THEN {2 ** i} ELSE 0 END")
    return "(" + "\n       + ".join(terms) + ")"


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (e.filter(F.col("vec_id") % QUERY_MOD == 0)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q_embedding")))


@register(
    "similarity_topk_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_embedding
               FROM embeddings WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
      SELECT q.query_id, v.vec_id,
             ROUND({_COS_SQL}, 4) AS cosine
      FROM embeddings v CROSS JOIN q
      WHERE v.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= {TOP_K}
    """,
    doc="Exact cosine top-k: broadcast the small query set over all vectors "
        "(broadcast nested-loop — the big side never shuffles), then "
        "per-query top-k with vec_id tiebreak.")
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(vectors, _queries_df(spark, sf_dir), k=TOP_K)


@register(
    "similarity_topk_lsh",
    f"""
    WITH v AS (SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS q_embedding,
                 {_bucket_sql('embedding')} AS bucket
          FROM embeddings WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
      SELECT q.query_id, v.vec_id,
             ROUND({_COS_SQL}, 4) AS cosine
      FROM v JOIN q ON v.bucket = q.bucket
      WHERE v.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= {TOP_K}
    """,
    doc="ANN top-k via 8-plane sign-random-projection LSH buckets; "
        "integer-quantized bucket math makes the approximate result "
        "deterministic and value-checkable across engines.")
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(vectors, _queries_df(spark, sf_dir), k=TOP_K)
