"""Distributed k-means document clustering as pure DataFrame operations.

A training-data pipeline clusters its corpus embeddings to balance domain
mix, spot near-duplicate pockets, and drive curriculum/mixture sampling.
``pyspark.ml.clustering.KMeans`` exists (and ``operators.similarity.
kmeans_centroids`` already uses it for IVF training), but its cluster
identities are not reproducible in an engine-independent SQL oracle — so the
gate-checkable path here re-expresses Lloyd's algorithm directly in the
DataFrame API with INTEGER-EXACT arithmetic:

* embeddings quantize to ``round(x * SCALE)`` BIGINTs (same trick as the
  LSH bucket math in ``operators/similarity.py``) — every distance is an
  exact int64, so argmin ties break identically in any engine;
* initial centroids are the vectors with ``id % centroid_mod == 0`` (the
  deterministic seed the IVF stand-in quantizer uses);
* the centroid update is the element-wise FLOOR of the member mean
  (exact integer floor-division), keeping centroids integer vectors.

Scale shape: each Lloyd round is one broadcast join (k centroid rows
against the corpus — the corpus never shuffles for assignment) plus one
hash shuffle on cluster id for the update, whose per-dimension sums are
map-side partial-aggregated through ``dim`` codegen'd SUM columns (no
64x posexplode row inflation). At 100 TB you run a handful of rounds with
``materialize=True`` so each round's assignment is computed once
(localCheckpoint breaks the re-execution chain exactly like
``operators/graph.py`` does for connected components); the default lazy
form keeps the whole chain a single Catalyst plan — what the oracle-gated
query uses at small T.

Reference scope note: the reference engine (amplitude/
databricks-import-pySpark-scripts) has no clustering tier — this module is
part of the mandated LLM-training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KMEANS_SCALE = 1000    # embedding quantization: round(x * SCALE) -> BIGINT
CENTROID_MOD = 100     # deterministic seed: vectors with id % MOD == 0
KMEANS_ITERS = 2       # Lloyd rounds for the oracle-gated query


def quantize_vec(vec: Column, scale: int = KMEANS_SCALE) -> Column:
    """array<float> -> array<long>: the exact-integer embedding the whole
    module computes on (identical to the LSH quantization in
    operators.similarity, so both families share one precision model)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("long"))


def sq_dist_col(a: Column, b: Column) -> Column:
    """Exact int64 squared L2 distance between two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def floordiv_col(s: Column, n: Column) -> Column:
    """floor(s/n) as BIGINT, exact for negative sums too. ``(s - posmod)``
    is an exact multiple of n, so the double-valued ``/`` is exact and the
    cast loses nothing (quotients here are bounded by the quantized
    coordinate range, far below 2^53)."""
    posmod = ((s % n) + n) % n
    return ((s - posmod) / n).cast("long")


def init_centroids(q: DataFrame, id_col: str,
                   centroid_mod: int = CENTROID_MOD) -> DataFrame:
    """(cid, cq): deterministic seed centroids — every ``centroid_mod``-th
    vector by id. k therefore tracks corpus size (sf0.01 -> 5 cells,
    sf0.1 -> 50), the same policy as the IVF stand-in quantizer."""
    return (q.filter(F.col(id_col) % centroid_mod == 0)
            .select((F.col(id_col) / centroid_mod).cast("long").alias("cid"),
                    F.col("qv").alias("cq")))


def assign_clusters(q: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """(id, qv, cid): nearest centroid per vector, ties to the smallest cid.

    The centroid side is k rows — broadcast, so the corpus streams map-side
    and never shuffles for assignment. argmin via ``min(struct(d, cid))``:
    exact integer distances make the tiebreak engine-independent.
    """
    scored = (q.join(F.broadcast(cents))
              .withColumn("_d", sq_dist_col(F.col("qv"), F.col("cq"))))
    return (scored.groupBy(id_col)
            .agg(F.first("qv").alias("qv"),
                 F.min(F.struct(F.col("_d"), F.col("cid"))).alias("_m"))
            .select(id_col, "qv", F.col("_m.cid").alias("cid")))


def update_centroids(assigned: DataFrame, prev: DataFrame,
                     dim: int) -> DataFrame:
    """(cid, cq): element-wise floor-mean of each cluster's members.

    One hash shuffle on cid with ``dim`` codegen'd per-dimension SUMs
    (map-side partial agg — the same wide-aggregate shape as the 60-bit
    simhash votes), then exact integer floor-division. A cluster that lost
    every member keeps its previous centroid (left join + coalesce), so k
    never shrinks mid-run.
    """
    sums = (assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("_n"),
                 *[F.sum(F.col("qv").getItem(i)).alias(f"_s{i}")
                   for i in range(dim)]))
    new_cq = F.array(*[floordiv_col(F.col(f"_s{i}"), F.col("_n"))
                       for i in range(dim)])
    upd = sums.select("cid", new_cq.alias("_new_cq"))
    # both sides are k rows; broadcast the update so the join never falls
    # back to a sort-merge exchange inside the lazy iteration chain
    return (prev.join(F.broadcast(upd), "cid", "left")
            .select("cid", F.coalesce(F.col("_new_cq"), F.col("cq")).alias("cq")))


def kmeans_assign(vectors: DataFrame, id_col: str, vec_col: str, dim: int,
                  centroid_mod: int = CENTROID_MOD,
                  iters: int = KMEANS_ITERS,
                  scale: int = KMEANS_SCALE,
                  materialize: bool = False) -> DataFrame:
    """(id, cluster_id): Lloyd's k-means assignment after ``iters`` exact
    integer rounds from the deterministic seed.

    ``materialize=False`` (default) keeps the whole iteration chain one
    lazy Catalyst plan — right for small ``iters`` and for the SQL oracle,
    which unrolls the identical rounds as CTEs. ``materialize=True``
    localCheckpoints each round's assignment (same lineage-breaking policy
    as graph.min_label_propagation), making cost linear in ``iters`` — the
    100 TB form, at the price of eager execution.

    Seed contract: at least one id divisible by ``centroid_mod`` must
    exist, else the lazy plan returns an EMPTY assignment (there is no
    cheap lazy check; ``kmeans_assign_arrow`` raises on the same input
    because it collects the seeds anyway).
    """
    q = vectors.select(F.col(id_col),
                       quantize_vec(F.col(vec_col), scale).alias("qv"))
    cents = init_centroids(q, id_col, centroid_mod)
    for _ in range(iters):
        assigned = assign_clusters(q, cents, id_col)
        if materialize:
            assigned = assigned.localCheckpoint(eager=True)
        cents = update_centroids(assigned, cents, dim)
    final = assign_clusters(q, cents, id_col)
    return final.select(F.col(id_col), F.col("cid").alias("cluster_id"))


def cluster_balanced_sample(assignment: DataFrame, id_col: str,
                            cap: int) -> DataFrame:
    """(id, cluster_id, rk): at most ``cap`` members per cluster, chosen by
    the md5 hash of the id — the deterministic "random" the split/sampling
    family already uses, so over-represented clusters (boilerplate pockets,
    duplicate-heavy domains) are down-sampled without a global sort.
    One window shuffle on cluster_id; within-cluster rank is bounded work
    per partition and AQE handles a skewed giant cluster."""
    from pyspark.sql import Window
    w = (Window.partitionBy("cluster_id")
         .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)))
    return (assignment
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= cap)
            .select(id_col, "cluster_id", "rk"))


def assign_clusters_np(q: DataFrame, cents_rows: list, id_col: str) -> DataFrame:
    """Arrow twin of ``assign_clusters`` for the materialized production
    path: centroids arrive as COLLECTED rows (k rows — driver-bounded, the
    same legitimacy class as the CMS probe) and each Arrow batch computes
    all squared distances as one int64 matmul, ``|q|^2 - 2 qC^T + |c|^2``.

    Bit-identity with the expression form: every operand is an exact int64
    (dots bounded far below 2^63 for round(x*1000)-quantized embeddings),
    and ``argmin`` returns the FIRST minimum — centroids are sorted by cid,
    so ties break to the smallest cid exactly like ``min(struct(d, cid))``.
    Asserted on real data by tests/test_clustering.py.
    """
    import numpy as np
    import pandas as pd

    rows = sorted(cents_rows, key=lambda r: r.cid)
    c_mat = np.array([list(r.cq) for r in rows], dtype=np.int64)
    cids = np.array([r.cid for r in rows], dtype=np.int64)
    cn2 = (c_mat * c_mat).sum(axis=1)
    id_type = q.schema[id_col].dataType.simpleString()

    def _assign(it):
        for pdf in it:
            qm = np.array(pdf["qv"].tolist(), dtype=np.int64)
            d = ((qm * qm).sum(axis=1)[:, None]
                 - 2 * (qm @ c_mat.T) + cn2[None, :])
            idx = d.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "qv": pdf["qv"],
                                "cid": cids[idx]})

    return q.mapInPandas(
        _assign, schema=f"{id_col} {id_type}, qv array<long>, cid long")


def kmeans_assign_arrow(vectors: DataFrame, id_col: str, vec_col: str,
                        dim: int, centroid_mod: int = CENTROID_MOD,
                        iters: int = KMEANS_ITERS,
                        scale: int = KMEANS_SCALE) -> DataFrame:
    """(id, cluster_id): the production form of ``kmeans_assign`` — eager
    per round (centroids collect to the driver: k rows), Arrow-matmul
    assignment, localCheckpointed assignments. Identical output to the
    lazy expression form (tests pin frame equality); use this for many
    rounds / large k where k interpreted-lambda distance evaluations per
    row per round dominate (measured 23.4 s -> 9.3 s end-to-end on
    200k x 16d x 64 centroids x 3 rounds, local[16]; the remaining cost is
    checkpoint IO + the update shuffles, not assignment compute)."""
    q = vectors.select(F.col(id_col),
                       quantize_vec(F.col(vec_col), scale).alias("qv"))
    cents = init_centroids(q, id_col, centroid_mod)
    cents_rows = cents.collect()
    if not cents_rows:
        raise ValueError(
            f"no seed centroids: no {id_col} is divisible by "
            f"{centroid_mod} (the lazy kmeans_assign would silently return "
            f"an empty assignment on the same input)")
    for _ in range(iters):
        assigned = assign_clusters_np(q, cents_rows, id_col)
        assigned = assigned.localCheckpoint(eager=True)
        prev = vectors.sparkSession.createDataFrame(
            [(int(r.cid), list(r.cq)) for r in cents_rows],
            "cid long, cq array<long>")
        cents_rows = update_centroids(assigned, prev, dim).collect()
    final = assign_clusters_np(q, cents_rows, id_col)
    return final.select(F.col(id_col), F.col("cid").alias("cluster_id"))
