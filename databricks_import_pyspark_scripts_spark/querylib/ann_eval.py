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
