"""k-means clustering operator tests: exact integer arithmetic, Lloyd
convergence behavior, empty-cluster retention, materialized-vs-lazy
equivalence, and balanced-sample caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.clustering import (
    cluster_balanced_sample,
    floordiv_col,
    init_centroids,
    kmeans_assign,
    quantize_vec,
    sq_dist_col,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_floordiv_matches_python_floor(spark):
    rows = [(a, n) for a in (-7, -6, -1, 0, 1, 6, 7) for n in (1, 2, 3, 5)]
    df = spark.createDataFrame(rows, "s long, n long")
    got = df.select("s", "n",
                    floordiv_col(F.col("s"), F.col("n")).alias("fd")).collect()
    for r in got:
        assert r.fd == r.s // r.n, (r.s, r.n, r.fd)


def test_sq_dist_exact(spark):
    df = spark.createDataFrame([(1,)], "x long").select(
        sq_dist_col(F.array(F.lit(1), F.lit(-2)).cast("array<long>"),
                    F.array(F.lit(4), F.lit(2)).cast("array<long>")).alias("d"))
    assert df.first().d == 9 + 16


def test_kmeans_separates_two_blobs(spark):
    # two tight blobs around (0,0) and (10,10); centroid_mod=4 seeds exactly
    # ids 0 (blob A) and 4 (blob B)
    rows = [
        (0, [0.0, 0.1]), (1, [0.2, 0.0]), (2, [0.1, 0.1]),
        (4, [10.0, 10.1]), (5, [9.9, 10.0]), (6, [10.1, 9.9]),
    ]
    out = kmeans_assign(_vecs(spark, rows), "vec_id", "embedding", dim=2,
                        centroid_mod=4, iters=2)
    got = {r.vec_id: r.cluster_id for r in out.collect()}
    blob_a = {got[0], got[1], got[2]}
    blob_b = {got[4], got[5], got[6]}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b


def test_kmeans_materialized_equals_lazy(spark):
    rows = [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(60)]
    df = _vecs(spark, rows)
    lazy = kmeans_assign(df, "vec_id", "embedding", dim=2,
                         centroid_mod=10, iters=2, materialize=False)
    eager = kmeans_assign(df, "vec_id", "embedding", dim=2,
                          centroid_mod=10, iters=2, materialize=True)
    assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, eager.collect()))


def test_empty_cluster_keeps_previous_centroid(spark):
    # seed ids 0 and 10 (mod 10); every vector sits on top of seed 0, so
    # cluster 1 goes empty after round 1 — k must not shrink and the run
    # must not error
    rows = [(i, [0.0, 0.0]) for i in range(11)]
    rows[10] = (10, [0.0001, 0.0])  # sub-quantum offset: quantizes to [0,0],
    # so seed 1 == seed 0 and every tie breaks to cid 0 -> cluster 1 empty
    out = kmeans_assign(_vecs(spark, rows), "vec_id", "embedding", dim=2,
                        centroid_mod=10, iters=2)
    got = {r.vec_id: r.cluster_id for r in out.collect()}
    assert len(got) == 11
    assert set(got.values()) == {0}


def test_quantize_and_seed_shape(spark):
    df = _vecs(spark, [(0, [0.0015, -0.0015]), (5, [1.0, 2.0])])
    q = df.select("vec_id", quantize_vec(F.col("embedding")).alias("qv"))
    vals = {r.vec_id: r.qv for r in q.collect()}
    assert vals[0] == [2, -2]  # round-half-up at scale 1000
    cents = init_centroids(q, "vec_id", centroid_mod=5)
    assert {(r.cid, tuple(r.cq)) for r in cents.collect()} == {
        (0, (2, -2)), (1, (1000, 2000))}


def test_balanced_sample_caps_every_cluster(spark):
    rows = [(i, [float(i >= 50) * 10, 0.0]) for i in range(100)]
    asg = kmeans_assign(_vecs(spark, rows), "vec_id", "embedding", dim=2,
                        centroid_mod=50, iters=1)
    kept = cluster_balanced_sample(asg, "vec_id", cap=7)
    sizes = {r.cluster_id: r.n for r in
             kept.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 7 for n in sizes.values())
    assert kept.filter(F.col("rk") > 7).count() == 0
    # deterministic: same input -> same kept set
    again = cluster_balanced_sample(asg, "vec_id", cap=7)
    assert sorted(map(tuple, kept.collect())) == sorted(map(tuple, again.collect()))


def test_arrow_kmeans_bit_identical_to_expression_form(spark):
    from databricks_import_pyspark_scripts_spark.operators.clustering import (
        kmeans_assign_arrow,
    )

    rows = [(i, [float((i * 7) % 13) - 6.0, float((i * 3) % 11) / 2,
                 float(i % 5) * 1.5]) for i in range(90)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    expr = kmeans_assign(df, "vec_id", "embedding", dim=3,
                         centroid_mod=15, iters=3)
    arrow = kmeans_assign_arrow(df, "vec_id", "embedding", dim=3,
                                centroid_mod=15, iters=3)
    assert sorted(map(tuple, expr.collect())) == sorted(map(tuple, arrow.collect()))


def test_arrow_kmeans_on_real_embeddings(spark, sf_dir):
    from databricks_import_pyspark_scripts_spark.operators.clustering import (
        kmeans_assign_arrow,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    expr = kmeans_assign(emb, "vec_id", "embedding", dim=64)
    arrow = kmeans_assign_arrow(emb, "vec_id", "embedding", dim=64)
    assert sorted(map(tuple, expr.collect())) == sorted(map(tuple, arrow.collect()))


def test_quantize_np_half_up_matches_expression_on_dyadic_halves(spark):
    """quantize_np must implement HALF_UP (Spark round()), not numpy's
    half-to-even: dyadic-rational coordinates scale to EXACT .5 values
    (0.0625 * 1000 = 62.5 exactly in float64) where the two rules diverge.
    Both paths multiply the same float64 by the same scale, so agreement
    on these values pins the rounding rule itself (r14 fused-arrow k-means
    quantizes in numpy instead of shipping expression-quantized arrays)."""
    import numpy as np

    from databricks_import_pyspark_scripts_spark.operators.clustering import (
        quantize_np,
        quantize_vec,
    )

    vals = [0.0625, -0.0625, 5.0625, -5.0625, 0.1875, -0.1875,
            0.5, -0.5, 1.5, -1.5, 0.0, -0.0, 2.25, -2.25,
            0.123456, -9.87654, 3.0, -3.0]
    df = spark.createDataFrame([(0, vals)],
                               "vec_id long, embedding array<double>")
    expr = df.select(quantize_vec(F.col("embedding")).alias("qv")).collect()
    got = quantize_np(np.array([vals], dtype=np.float64))
    assert list(expr[0].qv) == got[0].tolist()
    # and the divergence is real: banker's rounding would disagree on 62.5
    assert got[0][0] == 63 and got[0][1] == -63
