"""Corpus-clustering queries over ``embeddings``: integer-exact Lloyd
k-means (fully value-checked — the whole iteration chain unrolls into the
DuckDB oracle as CTEs) and cluster-balanced sampling for corpus mixture
control.

The reference engine has no clustering tier; this is part of the
LLM-training-data extension surface (see operators/clustering.py for the
precision model that makes k-means oracle-checkable at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import (
    CENTROID_MOD,
    KMEANS_ITERS,
    KMEANS_SCALE,
    cluster_balanced_sample,
    kmeans_assign_arrow,
)
from ..sources.registry import load_table
from . import register

EMB_DIM = 64        # embeddings table vector width (TESTDATA.md)
SAMPLE_CAP = 40     # balanced-sample per-cluster cap


def _q_cte() -> str:
    return ("q AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), "
            f"x -> CAST(round(x * {KMEANS_SCALE}) AS BIGINT)) AS qv "
            "FROM embeddings)")


def _assign_cte(i: int, cents: str) -> str:
    """score + argmin CTEs for one Lloyd assignment against centroid CTE
    ``cents`` (distance via the dot-product identity — integer-valued, so
    exact in DOUBLE and tie-stable across engines)."""
    return f"""
    s{i} AS (
      SELECT q.vec_id, q.qv, c.cid,
             list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))
             - 2 * list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(c.cq AS DOUBLE[]))
             + list_dot_product(CAST(c.cq AS DOUBLE[]), CAST(c.cq AS DOUBLE[])) AS d
      FROM q CROSS JOIN {cents} c),
    a{i} AS (
      SELECT vec_id, qv, cid FROM (
        SELECT vec_id, qv, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM s{i})
      WHERE rn = 1)"""


def _update_cte(i: int, prev: str) -> str:
    """centroid floor-mean update from assignment ``a{i}``, empty clusters
    keeping their previous centroid."""
    return f"""
    l{i} AS (SELECT cid, generate_subscripts(qv, 1) AS dim, unnest(qv) AS val
             FROM a{i}),
    u{i} AS (SELECT cid, dim, SUM(val) AS s, COUNT(*) AS n
             FROM l{i} GROUP BY cid, dim),
    n{i} AS (SELECT cid, list((s - ((s % n + n) % n)) // n ORDER BY dim) AS cq
             FROM u{i} GROUP BY cid),
    c{i + 1} AS (SELECT c.cid, COALESCE(nn.cq, c.cq) AS cq
                 FROM {prev} c LEFT JOIN n{i} nn USING (cid))"""


def _kmeans_ctes() -> str:
    """The full unrolled KMEANS_ITERS-round pipeline; final assignment CTE
    is ``a{KMEANS_ITERS}``."""
    parts = [
        _q_cte(),
        f"c0 AS (SELECT vec_id // {CENTROID_MOD} AS cid, qv AS cq "
        f"FROM q WHERE vec_id % {CENTROID_MOD} = 0)",
    ]
    for i in range(KMEANS_ITERS):
        parts.append(_assign_cte(i, f"c{i}"))
        parts.append(_update_cte(i, f"c{i}"))
    parts.append(_assign_cte(KMEANS_ITERS, f"c{KMEANS_ITERS}"))
    return "WITH " + ",\n".join(parts)


@register(
    "cluster_kmeans_assign",
    f"""
    {_kmeans_ctes()}
    SELECT vec_id, cid AS cluster_id FROM a{KMEANS_ITERS}
    """,
    doc="Integer-exact Lloyd k-means over quantized embeddings: "
        f"{KMEANS_ITERS} broadcast-assign + floor-mean-update rounds from "
        "the deterministic every-Nth seed; the oracle unrolls the identical "
        "rounds as CTEs. Per round: one broadcast join (corpus never "
        "shuffles to assign) + one cid-shuffle with 64 codegen'd partial "
        "sums.")
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # Arrow-GEMM form, not the lazy expression chain: assignment distance
    # is k interpreted zip_with/aggregate lambda evaluations per vector per
    # round in the expression form vs one int64 matmul per Arrow batch
    # here. Bit-identical output (argmin tiebreak to smallest cid) pinned
    # on this exact table by tests/test_clustering.py::
    # test_arrow_kmeans_on_real_embeddings (r14 optimization; evidence in
    # OPTIMIZATION_r14.md).
    return kmeans_assign_arrow(e, "vec_id", "embedding", dim=EMB_DIM)


@register(
    "cluster_balanced_sample",
    f"""
    {_kmeans_ctes()}
    SELECT vec_id, cluster_id, rk FROM (
      SELECT vec_id, cid AS cluster_id,
             ROW_NUMBER() OVER (PARTITION BY cid
                                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS rk
      FROM a{KMEANS_ITERS})
    WHERE rk <= {SAMPLE_CAP}
    """,
    doc="Cluster-balanced corpus sample: md5-ranked members capped per "
        "k-means cluster — the mixture-control pass that downsamples "
        "boilerplate/duplicate-heavy embedding pockets without a global "
        "sort.")
def cluster_balanced_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # materialize the assignment before the window: the sampler's
    # cluster_id shuffle sits ON TOP of the Lloyd chain, and the combined
    # plan measured 7.5-14.3 s warm vs 6.2-7.2 s with the chain
    # checkpointed once (sf0.1; the SCALE.md lineage decision rule's
    # "consumer adds its own exchange" case). Arrow-GEMM form as in
    # cluster_kmeans_assign (r14).
    asg = (kmeans_assign_arrow(e, "vec_id", "embedding", dim=EMB_DIM)
           .localCheckpoint(eager=True))
    return cluster_balanced_sample(asg, "vec_id", cap=SAMPLE_CAP)
