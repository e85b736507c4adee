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


def _bucket_sql(vec_expr: str, planes: list[list[int]] | None = None) -> str:
    """Generated bucket expression: must mirror operators.similarity.lsh_bucket_col
    (or, when passed a per-table plane slice, one table of lsh_table_buckets_df)."""
    planes = planes if planes is not None else rademacher_planes()
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


def _multi_table_lsh_oracle() -> str:
    from ..operators.similarity import NUM_TABLES, PLANES_PER_TABLE

    planes = rademacher_planes(NUM_TABLES * PLANES_PER_TABLE)
    branches = []
    for t in range(NUM_TABLES):
        sl = planes[t * PLANES_PER_TABLE:(t + 1) * PLANES_PER_TABLE]
        branches.append(
            f"SELECT vec_id, {t} AS tbl, {_bucket_sql('embedding', sl)} AS bucket "
            f"FROM embeddings")
    vb = "\n      UNION ALL ".join(branches)
    return f"""
    WITH vb AS (
      {vb}
    ),
    qb AS (SELECT vec_id AS query_id, tbl, bucket FROM vb
           WHERE vec_id % {QUERY_MOD} = 0),
    cand AS (
      SELECT DISTINCT qb.query_id, vb.vec_id
      FROM vb JOIN qb ON vb.tbl = qb.tbl AND vb.bucket = qb.bucket
      WHERE vb.vec_id <> qb.query_id),
    scored AS (
      SELECT c.query_id, c.vec_id,
             ROUND({_COS_SQL}, 4) AS cosine
      FROM cand c
      JOIN embeddings v ON c.vec_id = v.vec_id
      JOIN (SELECT vec_id AS query_id, embedding AS q_embedding
            FROM embeddings WHERE vec_id % {QUERY_MOD} = 0) q
        ON c.query_id = q.query_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= {TOP_K}
    """


@register(
    "similarity_topk_lsh",
    _multi_table_lsh_oracle(),
    doc="ANN top-k via multi-table sign-random-projection LSH (16 tables x "
        "5 planes, OR-amplified): candidates collide in >= 1 table, scored "
        "once. Measured recall@10 = 0.71 on the near-random synthetic "
        "corpus vs 0.005 single-table (operators/similarity.py). Integer-"
        "quantized bucket math keeps the approximation deterministic and "
        "value-checkable across engines.")
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_multi_topk

    vectors = load_table(spark, sf_dir, "embeddings")
    return lsh_multi_topk(vectors, _queries_df(spark, sf_dir), k=TOP_K)


from ..operators.similarity import CENTROID_MOD  # noqa: E402

_ASSIGN_COS_SQL = (
    "list_dot_product(CAST(x.embedding AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[]))"
    " / sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]), CAST(x.embedding AS DOUBLE[]))"
    " * list_dot_product(CAST(c.c_emb AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])))")

from ..operators.similarity import IVF_NPROBE  # noqa: E402

_IVF_ORACLE = f"""
    WITH cents AS (
      SELECT vec_id // {CENTROID_MOD} AS centroid_id, embedding AS c_emb
      FROM embeddings WHERE vec_id % {CENTROID_MOD} = 0),
    ranked AS (
      SELECT x.vec_id, c.centroid_id,
             ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                ORDER BY ROUND({_ASSIGN_COS_SQL}, 8) DESC,
                                         c.centroid_id) AS rn
      FROM embeddings x CROSS JOIN cents c),
    assign AS (
      SELECT vec_id, centroid_id AS cell FROM ranked WHERE rn = 1),
    qassign AS (
      SELECT vec_id, centroid_id AS cell FROM ranked
      WHERE rn <= {IVF_NPROBE} AND vec_id % {QUERY_MOD} = 0),
    v AS (SELECT e.vec_id, e.embedding, a.cell
          FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
    q AS (SELECT e.vec_id AS query_id, e.embedding AS q_embedding, a.cell
          FROM embeddings e JOIN qassign a ON e.vec_id = a.vec_id
          WHERE e.vec_id % {QUERY_MOD} = 0),
    scored AS (
      SELECT q.query_id, v.vec_id,
             ROUND({_COS_SQL}, 4) AS cosine
      FROM v JOIN q ON v.cell = q.cell
      WHERE v.vec_id <> q.query_id)
    SELECT query_id, vec_id, cosine, rank FROM (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= {TOP_K}
    """


@register(
    "similarity_topk_ivf",
    _IVF_ORACLE,
    doc="IVF (inverted-file) ANN top-k, nprobe=2: deterministic centroid set "
        "(every 250th vector standing in for offline k-means), nearest-"
        "centroid cell assignment (rounded-cosine argmax, id tie-break), "
        "each query scoring its 2 nearest cells' lists. The cell id is a "
        "plain column — at scale it's computed at ingest and used as the "
        "partition key.")
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    vectors = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(vectors, _queries_df(spark, sf_dir), k=TOP_K)


_PAIR_COS_SQL = ("list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
                 " / sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))"
                 " * list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))")

NEAR_DUP_THRESHOLD = 0.3


def _embedding_dedup_oracle() -> str:
    from ..operators.dedup import MAX_BUCKET
    from ..operators.similarity import NUM_TABLES, PLANES_PER_TABLE

    planes = rademacher_planes(NUM_TABLES * PLANES_PER_TABLE)
    branches = []
    for t in range(NUM_TABLES):
        sl = planes[t * PLANES_PER_TABLE:(t + 1) * PLANES_PER_TABLE]
        branches.append(
            f"SELECT vec_id, {t} AS tbl, {_bucket_sql('embedding', sl)} AS bucket "
            f"FROM reps")
    vb = "\n      UNION ALL ".join(branches)
    return f"""
    WITH reps AS (
      SELECT embedding, MIN(vec_id) AS vec_id
      FROM embeddings GROUP BY embedding
    ),
    vb AS (
      {vb}
    ),
    ok AS (
      SELECT tbl, bucket FROM vb
      GROUP BY tbl, bucket
      HAVING COUNT(*) BETWEEN 2 AND {MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM vb a JOIN vb b ON a.tbl = b.tbl AND a.bucket = b.bucket
                         AND a.vec_id < b.vec_id
      JOIN ok ON a.tbl = ok.tbl AND a.bucket = ok.bucket)
    SELECT id_a, id_b, cosine FROM (
      SELECT c.id_a, c.id_b,
             ROUND({_PAIR_COS_SQL}, 4) AS cosine
      FROM cand c
      JOIN embeddings a ON c.id_a = a.vec_id
      JOIN embeddings b ON c.id_b = b.vec_id)
    WHERE cosine >= {NEAR_DUP_THRESHOLD}
    """


@register(
    "dedup_embedding_cosine",
    _embedding_dedup_oracle(),
    doc="Embedding-cosine near-duplicate pairs: multi-table LSH candidate "
        "self-join (16 tables x 5 planes, same OR-amplification as the "
        "top-k path — the single-bucket form measured 1.1% pair recall, "
        "11 of 990 true pairs) + exact-cosine verify over the threshold. "
        "Candidates are an equi-join on (tbl, bucket) — O(L x n / 2^b) "
        "pairs, never a cartesian. Threshold 0.3 fits the synthetic "
        "corpus's similarity range; at a production ~0.95 threshold the "
        "per-table collision probability is near 1 and recall approaches "
        "100% at far lower candidate volume.")
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import MAX_BUCKET, bucket_pairs
    from ..operators.similarity import lsh_table_buckets_pd_df, pair_cosines

    emb = load_table(spark, sf_dir, "embeddings")
    # Candidates via within-bucket pair explode (operators.dedup.bucket_pairs)
    # rather than a bucket-table self-join: the Arrow int-matmul bucket build
    # then executes exactly once into a single groupBy — nothing to persist
    # (the earlier shape persisted the bucket table to stop both join sides
    # re-executing it, and those pins accumulated across queries in a
    # long-lived session).
    # Exact-dup pre-collapse (byte-identical vectors -> min-id representative,
    # one shuffle on the vector) plus the MAX_BUCKET guard bound the pair
    # explode on duplicate-heavy corpora — N identical vectors would land in
    # one bucket of every table and explode ~N^2/2 pairs per table otherwise.
    reps = (emb.groupBy("embedding").agg(F.min("vec_id").alias("vec_id"))
            .select("vec_id", "embedding"))
    vb = lsh_table_buckets_pd_df(reps, "vec_id", "embedding")
    cand = (bucket_pairs(vb, ["tbl", "bucket"], F.col("vec_id"),
                         max_bucket=MAX_BUCKET)
            .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
            .distinct())
    # Verify strategy is size-aware (operators.similarity.pair_cosines): on
    # this corpus OR-16 bucketing keeps 41% of ALL pairs (adversarial
    # near-random vectors at threshold 0.3), so the PAIR set is the big side
    # and the vector table the small one — `auto` resolves to broadcasting
    # it into the candidate stream (zero pair shuffle; the plan test pins
    # the broadcast resolution). The r6 melt-join shuffled 1.6M melted rows
    # each carrying a 64-dim struct (~500 MB) to reassemble pairs; that
    # shuffle's spill/page pressure caused the 2x bench wobble (SCALE.md r7
    # root-cause). The melt path remains the non-broadcastable-corpus scale
    # path (auto picks it past the 256 MB estimate) and is exercised by
    # semdedup + tests.
    return (pair_cosines(cand, emb, "vec_id", "embedding", strategy="auto")
            .withColumn("cosine", F.round(F.col("cosine"), 4))
            .filter(F.col("cosine") >= NEAR_DUP_THRESHOLD))


def _pq_ctes() -> str:
    """The q/ms/cb/sv/enc/qsv/qtab CTE block shared by the PQ and IVF-PQ
    oracles — one definition, so the subset-scoring invariant the Spark
    side pins (pq_query_tables) holds in the SQL twins too."""
    from ..operators.similarity import PQ_K, PQ_M

    d_sub = 64 // PQ_M
    sq = ("list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[]))"
          " - 2 * list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
          " + list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))")
    sub = f"q.qv[mm.m * {d_sub} + 1 : mm.m * {d_sub} + {d_sub}]"
    return f"""
    q AS (
      SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                    x -> CAST(round(x * {QUANT_SCALE}) AS BIGINT)) AS qv
      FROM embeddings),
    ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
    cb AS (
      SELECT mm.m, q.vec_id AS j, {sub} AS cbv
      FROM q, ms mm WHERE q.vec_id < {PQ_K}),
    sv AS (
      SELECT q.vec_id, mm.m, {sub} AS sub FROM q, ms mm),
    enc AS (
      SELECT vec_id, m, j AS code FROM (
        SELECT sv.vec_id, sv.m, cb.j,
               ROW_NUMBER() OVER (
                 PARTITION BY sv.vec_id, sv.m
                 ORDER BY {sq.format(a='sv.sub', b='cb.cbv')}, cb.j) AS rn
        FROM sv JOIN cb ON sv.m = cb.m)
      WHERE rn = 1),
    qsv AS (
      SELECT vec_id AS query_id, m, sub FROM sv WHERE vec_id % {QUERY_MOD} = 0),
    qtab AS (
      SELECT qsv.query_id, qsv.m, cb.j AS code,
             {sq.format(a='qsv.sub', b='cb.cbv')} AS td
      FROM qsv JOIN cb ON qsv.m = cb.m)"""


def _pq_oracle() -> str:
    return f"""
    WITH {_pq_ctes()},
    scored AS (
      SELECT qtab.query_id, enc.vec_id, CAST(SUM(td) AS BIGINT) AS adc_dist
      FROM enc JOIN qtab ON enc.m = qtab.m AND enc.code = qtab.code
      WHERE enc.vec_id <> qtab.query_id
      GROUP BY qtab.query_id, enc.vec_id)
    SELECT query_id, vec_id, adc_dist, rank FROM (
      SELECT query_id, vec_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS rank
      FROM scored)
    WHERE rank <= {TOP_K}
    """


@register(
    "similarity_topk_pq",
    _pq_oracle(),
    doc="Product-quantization ADC top-k: vectors compress to 8 4-bit "
        "subspace codes; queries score candidates through broadcast "
        "per-subspace distance tables summed per pair — the 32x-compression "
        "scale path (composes with IVF cells as IVF-PQ). Deterministic "
        "codebooks + exact int64 distances make ANN oracle-checkable.")
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_adc_topk

    vectors = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(vectors, _queries_df(spark, sf_dir), k=TOP_K)


def _ivf_pq_oracle() -> str:
    from ..operators.similarity import IVF_NPROBE

    return f"""
    WITH {_pq_ctes()},
    cents AS (
      SELECT vec_id // {CENTROID_MOD} AS centroid_id, embedding AS c_emb
      FROM embeddings WHERE vec_id % {CENTROID_MOD} = 0),
    ranked AS (
      SELECT x.vec_id, c.centroid_id,
             ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                ORDER BY ROUND({_ASSIGN_COS_SQL}, 8) DESC,
                                         c.centroid_id) AS rn
      FROM embeddings x CROSS JOIN cents c),
    assign AS (
      SELECT vec_id, centroid_id AS cell FROM ranked WHERE rn = 1),
    qassign AS (
      SELECT vec_id AS query_id, centroid_id AS cell FROM ranked
      WHERE rn <= {IVF_NPROBE} AND vec_id % {QUERY_MOD} = 0),
    cand AS (
      SELECT qa.query_id, a.vec_id
      FROM assign a JOIN qassign qa ON a.cell = qa.cell
      WHERE a.vec_id <> qa.query_id),
    scored AS (
      SELECT c.query_id, c.vec_id, CAST(SUM(qtab.td) AS BIGINT) AS adc_dist
      FROM cand c
      JOIN enc ON enc.vec_id = c.vec_id
      JOIN qtab ON qtab.query_id = c.query_id
              AND qtab.m = enc.m AND qtab.code = enc.code
      GROUP BY c.query_id, c.vec_id)
    SELECT query_id, vec_id, adc_dist, rank FROM (
      SELECT query_id, vec_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS rank
      FROM scored)
    WHERE rank <= {TOP_K}
    """


@register(
    "similarity_topk_ivfpq",
    _ivf_pq_oracle(),
    doc="IVF-PQ ANN top-k — the production shape: IVF cells prune "
        "candidates (nprobe=2), PQ codes score survivors by asymmetric "
        "distance; raw vectors are touched by neither at query time. Both "
        "index columns are ingest-time artifacts; at 100 TB a query reads "
        "nprobe/k-cells of the corpus at 8 bytes per candidate.")
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_pq_topk

    vectors = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(vectors, _queries_df(spark, sf_dir), k=TOP_K)


def _semdedup_oracle() -> str:
    from ..operators.dedup import MAX_BUCKET
    from ..operators.similarity import SEMDEDUP_EPS_COS

    return f"""
    WITH cents AS (
      SELECT vec_id // {CENTROID_MOD} AS centroid_id, embedding AS c_emb
      FROM embeddings WHERE vec_id % {CENTROID_MOD} = 0),
    ranked AS (
      SELECT x.vec_id, c.centroid_id,
             ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                ORDER BY ROUND({_ASSIGN_COS_SQL}, 8) DESC,
                                         c.centroid_id) AS rn
      FROM embeddings x CROSS JOIN cents c),
    assign AS (
      SELECT vec_id, centroid_id AS cell FROM ranked WHERE rn = 1),
    ok AS (
      SELECT cell FROM assign GROUP BY cell
      HAVING COUNT(*) BETWEEN 2 AND {MAX_BUCKET}),
    av AS (
      SELECT e.vec_id, e.embedding, a.cell
      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({_PAIR_COS_SQL}, 4) AS cosine
      FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN ok ON a.cell = ok.cell),
    dropped AS (
      SELECT id_b AS vec_id, MAX(cosine) AS max_sim_smaller
      FROM pairs WHERE cosine >= {SEMDEDUP_EPS_COS}
      GROUP BY id_b)
    SELECT a.vec_id, a.cell,
           d.vec_id IS NOT NULL AS is_dropped,
           d.max_sim_smaller
    FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """


@register(
    "dedup_semantic_semdedup",
    _semdedup_oracle(),
    doc="SemDeDup (Abbas et al. 2023) semantic dedup flags: coarse-quantizer "
        "clusters confine the pairwise cosine to within-cluster pairs; an "
        "item is dropped when its cosine to a smaller-id cluster-mate "
        "reaches the eps threshold (the paper's keep-earliest rule — no "
        "transitive closure). One broadcast-centroid assignment pass, one "
        "shuffle on the cell id, Arrow melt-join exact-cosine verify; the "
        "max_bucket guard bounds degenerate clusters.")
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import MAX_BUCKET
    from ..operators.similarity import semdedup_flags

    emb = load_table(spark, sf_dir, "embeddings")
    cents = (emb.filter(F.col("vec_id") % CENTROID_MOD == 0)
             .select((F.col("vec_id") / CENTROID_MOD).cast("long")
                     .alias("centroid_id"), "embedding"))
    return semdedup_flags(emb, cents, max_bucket=MAX_BUCKET)


# Semantic-decontamination stand-in eval set: every 20th vector. The flag
# threshold applies to the 4-dp-ROUNDED max cosine so the comparison both
# engines make is over the same exact decimal grid (the raw maxima agree
# to ~1e-13; the grid absorbs that).
DECON_BENCH_MOD = 20
DECON_TAU = 0.35


@register(
    "dedup_decontaminate_semantic",
    f"""
    WITH b AS (SELECT embedding AS b_emb FROM embeddings
               WHERE vec_id % {DECON_BENCH_MOD} = 0),
    s AS (
      SELECT v.vec_id,
             MAX(list_dot_product(CAST(v.embedding AS DOUBLE[]), CAST(b.b_emb AS DOUBLE[]))
                 / sqrt(list_dot_product(CAST(v.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[]))
                        * list_dot_product(CAST(b.b_emb AS DOUBLE[]), CAST(b.b_emb AS DOUBLE[])))) AS m
      FROM embeddings v CROSS JOIN b
      WHERE v.vec_id % {DECON_BENCH_MOD} <> 0
      GROUP BY v.vec_id)
    SELECT vec_id, ROUND(m, 4) AS max_benchmark_cos,
           ROUND(m, 4) >= {DECON_TAU} AS contaminated
    FROM s
    """,
    doc="Embedding-space benchmark decontamination — the semantic "
        "complement of dedup_decontaminate_benchmark's n-gram pass: "
        "paraphrased or re-tokenized eval items share no shingles but "
        "stay cosine-close, so every training item is scored by its max "
        "exact cosine against the (broadcast) benchmark embedding set "
        f"and flagged at {DECON_TAU} on the 4-dp grid. Scale shape: the "
        "corpus is scanned once and never shuffles — benchmark broadcast "
        "nested-loop into the Arrow cosine, per-id max partial-aggregates "
        "map-side; for 10^5+-item benchmarks prefilter with the ANN index "
        "and exact-score only collisions (operator docstring).")
def dedup_decontaminate_semantic(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from ..operators.similarity import max_benchmark_cosine

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % DECON_BENCH_MOD == 0)
    corpus = emb.filter(F.col("vec_id") % DECON_BENCH_MOD != 0)
    mx = max_benchmark_cosine(corpus, bench)
    return mx.select(
        "vec_id",
        F.round(F.col("max_benchmark_cos"), 4).alias("max_benchmark_cos"),
        (F.round(F.col("max_benchmark_cos"), 4) >= DECON_TAU)
        .alias("contaminated"))


# ---------------------------------------------------------------------------
# embedding statistics + dimensionality reduction

_COV_DIMS = 16          # emit the (i <= j) upper triangle of the first 16
_COV_SCALE = 1000       # integer quantization: exact cross-engine moments


@register(
    "embedding_covariance_agg",
    f"""
    WITH dims AS (SELECT UNNEST(range(0, {_COV_DIMS})) AS i),
    u AS (SELECT e.vec_id, d.i,
                 CAST(ROUND(e.embedding[d.i + 1] * {_COV_SCALE}) AS BIGINT)
                 AS x
          FROM embeddings e CROSS JOIN dims d),
    n AS (SELECT COUNT(*) AS n FROM embeddings)
    SELECT a.i AS i, b.i AS j,
           CAST((SELECT n FROM n) * SUM(a.x * b.x)
                - SUM(a.x) * SUM(b.x) AS BIGINT) AS cov_num
    FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
    doc="Distributed covariance moments (operators/embedding_stats.py "
        "embedding_moments): each executor batch reduces to ONE "
        "(n, sums, gram) partial via integer GEMM — the PCA input shape "
        "where the corpus never leaves the executors and the driver "
        "combines O(batches * d^2) numbers. The gate emits the scaled "
        "covariance NUMERATOR n*Sxy - Sx*Sy over quantized values "
        "(exact int64, no float drift) for the first 16 dims' upper "
        "triangle; the oracle recomputes it relationally from the raw "
        "embeddings.")
def embedding_covariance_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.embedding_stats import embedding_moments

    e = load_table(spark, sf_dir, "embeddings")
    n, sums, gram = embedding_moments(e, dim=64, quant_scale=_COV_SCALE)
    rows = [(i, j, int(n * gram[i][j] - sums[i] * sums[j]))
            for i in range(_COV_DIMS) for j in range(i, _COV_DIMS)]
    return spark.createDataFrame(rows, "i int, j int, cov_num long")


_RP_PLANES_SEED = 7
_RP_NUM_PLANES = 8
_RP_CANDIDATES = 25     # reduced-space superset size before exact re-rank


def _rp_planes() -> list[list[int]]:
    return rademacher_planes(num_planes=_RP_NUM_PLANES, seed=_RP_PLANES_SEED)


def _rp_coord_sqls(vec_expr: str) -> list[str]:
    q = (f"list_transform(CAST({vec_expr} AS DOUBLE[]), "
         f"x -> CAST(round(x * {QUANT_SCALE}) AS BIGINT))")
    return [
        "list_dot_product(" + q + ", CAST(["
        + ", ".join(str(w) for w in plane) + "] AS BIGINT[]))"
        for plane in _rp_planes()]


def _rp_rerank_oracle() -> str:
    r = _rp_coord_sqls("embedding")
    cols = ", ".join(f"{e} AS r{i}" for i, e in enumerate(r))
    l2 = " + ".join(f"(v.r{i} - q.r{i}) * (v.r{i} - q.r{i})"
                    for i in range(_RP_NUM_PLANES))
    return f"""
    WITH red AS (
      SELECT vec_id, embedding, {cols} FROM embeddings),
    qred AS (
      SELECT vec_id AS query_id, embedding AS q_embedding,
             {', '.join(f'r{i}' for i in range(_RP_NUM_PLANES))}
      FROM red WHERE vec_id % {QUERY_MOD} = 0),
    cand AS (
      SELECT q.query_id, v.vec_id, v.embedding, q.q_embedding,
             ROW_NUMBER() OVER (PARTITION BY q.query_id
                                ORDER BY {l2}, v.vec_id) AS rn
      FROM red v CROSS JOIN qred q
      WHERE v.vec_id <> q.query_id),
    scored AS (
      SELECT query_id, vec_id, ROUND({_COS_SQL.replace('q.q_embedding',
                                                       'q_embedding')
                                      .replace('v.embedding',
                                               'embedding')}, 4) AS cosine
      FROM cand WHERE rn <= {_RP_CANDIDATES})
    SELECT query_id, vec_id, cosine, rank FROM (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= {TOP_K}
    """


@register(
    "similarity_topk_rp_rerank",
    _rp_rerank_oracle(),
    doc="Two-stage retrieval: an 8-dim INTEGER random projection "
        "(Rademacher planes over quantized embeddings — JL-preserved L2, "
        "bit-exact cross-engine) shortlists the 25 nearest candidates "
        "per query at 8 bigint ops per pair, then the ORIGINAL vectors "
        "re-rank just the shortlist by exact cosine. The "
        "reduce-then-rerank pattern production retrieval uses: the "
        "expensive metric only ever touches candidates. Reduced vectors "
        "are an ingest-time artifact (operators/embedding_stats.py "
        "rp_reduce_col).")
def similarity_topk_rp_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.embedding_stats import rp_l2_col, rp_reduce_col
    from ..operators.similarity import cosine_col

    planes = _rp_planes()
    emb = load_table(spark, sf_dir, "embeddings")
    # Shortlist on the REDUCED vectors only (r14, guide §2.3/§8: decide
    # with small rows, attach the payload after): the candidate window
    # previously carried BOTH full 64-dim embedding arrays per (vector,
    # query) pair through the rank exchange — ~16x the bytes of the
    # (query_id, vec_id, l2) triple actually needed to pick the top 25.
    # The exact-cosine re-rank re-attaches embeddings to the 25*|Q|
    # surviving pairs by broadcasting the SURVIVOR KEY SET onto the
    # embeddings scan (VERDICT r14 #2: the r14 shape broadcast the full
    # embeddings table — a corpus-scale broadcast that OOMs at 100 TB;
    # guide §8: broadcast the plan, not the payload). The query-embedding
    # attach is left unhinted: qemb is corpus-derived (|corpus|/50 full
    # vectors), so AQE picks broadcast locally and falls back to a
    # |Q|-scale shuffle join at scale.
    red = emb.select("vec_id",
                     rp_reduce_col(F.col("embedding"), planes,
                                   quant_scale=QUANT_SCALE).alias("r"))
    qred = (red.filter(F.col("vec_id") % QUERY_MOD == 0)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("r").alias("qr")))
    pairs = (red.crossJoin(F.broadcast(qred))
             .filter(F.col("vec_id") != F.col("query_id"))
             .select("query_id", "vec_id",
                     rp_l2_col(F.col("r"), F.col("qr")).alias("l2")))
    w1 = Window.partitionBy("query_id").orderBy("l2", "vec_id")
    cand = (pairs.withColumn("rn", F.row_number().over(w1))
            .filter(F.col("rn") <= _RP_CANDIDATES)
            .select("query_id", "vec_id"))
    qemb = (emb.filter(F.col("vec_id") % QUERY_MOD == 0)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q_embedding")))
    scored = (emb.select("vec_id", "embedding")
              .join(F.broadcast(cand), "vec_id")
              .join(qemb, "query_id")
              .select("query_id", "vec_id",
                      F.round(cosine_col(F.col("embedding"),
                                         F.col("q_embedding")),
                              4).alias("cosine")))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "vec_id", "cosine", "rank"))
