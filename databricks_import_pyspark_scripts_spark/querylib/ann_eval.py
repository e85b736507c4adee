"""ANN evaluation harness: recall@k of each approximate index against the
exact brute-force top-k, as a first-class oracle-checked query.

A production vector pipeline needs this loop — "how much recall does the
cheap index give up?" — continuously, not as a one-off notebook. Both the
Spark side and the oracle COMPOSE the already-registered queries (the
spark_fn and oracle of the brute-force / IVF / LSH entries are reused
verbatim), so the evaluation can never drift from what the gate actually
checks: the approximate oracles nest as CTE bodies (standard SQL allows a
WITH inside a CTE's subquery).

Integer hit counts / k ratios — exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import REGISTRY, register
from . import similarity as _similarity  # noqa: F401 — registers the ANN queries
from .similarity import TOP_K

EVAL_METHODS = ("similarity_topk_ivf", "similarity_topk_lsh")


def _recall_oracle() -> str:
    bf = REGISTRY["similarity_topk_bruteforce"].oracle
    parts = []
    for m in EVAL_METHODS:
        short = m.rsplit("_", 1)[-1]
        parts.append(f"ap_{short} AS ({REGISTRY[m].oracle})")
    evals = "\n      UNION ALL ".join(
        f"""SELECT bf.query_id, '{m.rsplit("_", 1)[-1]}' AS method,
               CAST(SUM(CASE WHEN ap.vec_id IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS hits
        FROM bf LEFT JOIN ap_{m.rsplit("_", 1)[-1]} ap
          ON bf.query_id = ap.query_id AND bf.vec_id = ap.vec_id
        GROUP BY bf.query_id"""
        for m in EVAL_METHODS)
    return f"""
    WITH bf AS ({bf}),
    {", ".join(parts)},
    e AS ({evals})
    SELECT query_id, method, hits,
           ROUND(hits * 1.0 / {TOP_K}, 4) AS recall_at_k
    FROM e
    """


@register(
    "ann_recall_eval",
    _recall_oracle(),
    doc=f"Recall@{TOP_K} of each ANN index (IVF nprobe=2, 16-table sign-LSH) "
        "against exact brute-force cosine, per query — the index-quality "
        "feedback loop a production vector pipeline runs continuously. "
        "Composes the registered queries' spark_fn/oracle verbatim (nested "
        "WITH), so the evaluation cannot drift from the gated definitions. "
        "Exact integer hit counts.")
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = REGISTRY["similarity_topk_bruteforce"].spark_fn(spark, sf_dir)
    out = None
    for m in EVAL_METHODS:
        short = m.rsplit("_", 1)[-1]
        ap = (REGISTRY[m].spark_fn(spark, sf_dir)
              .select("query_id", "vec_id", F.lit(1).alias("hit")))
        e = (bf.join(ap, ["query_id", "vec_id"], "left")
             .groupBy("query_id")
             .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                  .cast("long").alias("hits"))
             .select("query_id", F.lit(short).alias("method"), "hits"))
        out = e if out is None else out.unionByName(e)
    return out.select(
        "query_id", "method", "hits",
        F.round(F.col("hits") * F.lit(1.0) / TOP_K, 4).alias("recall_at_k"))


RRF_C = 60  # the standard reciprocal-rank-fusion constant (Cormack 2009)
RRF_METHODS = ("similarity_topk_lsh", "similarity_topk_pq")


def _rrf_oracle() -> str:
    a = REGISTRY[RRF_METHODS[0]].oracle
    b = REGISTRY[RRF_METHODS[1]].oracle
    return f"""
    WITH ra AS ({a}),
    rb AS ({b}),
    f AS (
      SELECT COALESCE(ra.query_id, rb.query_id) AS query_id,
             COALESCE(ra.vec_id, rb.vec_id) AS vec_id,
             ROUND(COALESCE(CAST(1 AS DOUBLE) / ({RRF_C} + ra.rank), 0)
                   + COALESCE(CAST(1 AS DOUBLE) / ({RRF_C} + rb.rank), 0),
                   6) AS rrf_score
      FROM ra FULL JOIN rb
        ON ra.query_id = rb.query_id AND ra.vec_id = rb.vec_id)
    SELECT query_id, vec_id, rrf_score, rank FROM (
      SELECT query_id, vec_id, rrf_score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_score DESC, vec_id) AS rank
      FROM f)
    WHERE rank <= {TOP_K}
    """


@register(
    "similarity_hybrid_rrf",
    _rrf_oracle(),
    doc=f"Reciprocal-rank fusion (C={RRF_C}) of the two approximate "
        "indexes' rankings (multi-table sign-LSH and PQ-ADC): the "
        "standard zero-tuning retrieval ensemble — items ranked by "
        "sum(1/(C+rank)) across lists, per-query top-k re-cut. Composes "
        "the registered queries verbatim (nested WITH); fusion math is "
        "IEEE-double identical across engines, rounded for the value "
        "hash. Candidate lists are per-query-bounded, so the fusion join "
        "and window touch k-sized data no matter the corpus size.")
def similarity_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ra = (REGISTRY[RRF_METHODS[0]].spark_fn(spark, sf_dir)
          .select("query_id", "vec_id", F.col("rank").alias("r_a")))
    rb = (REGISTRY[RRF_METHODS[1]].spark_fn(spark, sf_dir)
          .select("query_id", "vec_id", F.col("rank").alias("r_b")))
    f = (ra.join(rb, ["query_id", "vec_id"], "full_outer")
         .select("query_id", "vec_id",
                 F.round(
                     F.coalesce(F.lit(1.0) / (F.lit(RRF_C) + F.col("r_a")),
                                F.lit(0.0))
                     + F.coalesce(F.lit(1.0) / (F.lit(RRF_C) + F.col("r_b")),
                                  F.lit(0.0)), 6).alias("rrf_score")))
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(),
                                               F.col("vec_id"))
    return (f.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K))
