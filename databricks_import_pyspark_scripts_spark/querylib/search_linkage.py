"""Search, record-linkage, passage-dedup, and anomaly-detection queries —
the r5 second-wave extension tier. All fully value-checked against DuckDB:

* BM25 is made cross-engine-exact by the ln-free rational idf + fixed-point
  contribution quantization (operators/search.py docstring has the proof
  sketch); the contribution formula is a single shared SQL string.
* Record linkage uses integer levenshtein — identical classical definition
  in both engines.
* Passage/containment metrics are md5-set arithmetic — integer-exact.
* MAD anomaly flags compare exact half-integer medians of integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import TOKENS_SQL, shingles_sql
from ..operators.linkage import LINKAGE_MAX_DIST
from ..operators.search import (
    BM25_CONTRIB_SQL,
    BM25_FIXED,
    BM25_TOPK,
    CONTAIN_MIN_SHARED,
    OVERLAP_MAX_GROUPS,
    PASSAGE_W,
    bm25_topk,
    containment_pairs,
    cross_group_passage_overlap,
    duplicate_passage_stats,
    top_terms_as_queries,
)
from ..sources.registry import load_table
from . import register

BM25_N_TERMS = 9
BM25_TERMS_PER_QUERY = 3


def _bm25_oracle() -> str:
    return f"""
    WITH post AS (
      SELECT doc_id, t AS term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest({TOKENS_SQL}) AS t FROM documents)
      GROUP BY doc_id, t),
    dls AS (SELECT doc_id, len({TOKENS_SQL}) AS dl FROM documents),
    scalars AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dls),
    totals AS (SELECT term, SUM(tf) AS cnt FROM post GROUP BY term),
    ranked AS (
      SELECT term, ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rk
      FROM totals),
    queries AS (
      SELECT CAST(FLOOR((rk - 1) * 1.0 / {BM25_TERMS_PER_QUERY}) AS BIGINT)
               AS qid, term
      FROM ranked WHERE rk <= {BM25_N_TERMS}),
    dfreq AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
    contrib AS (
      SELECT q.qid, p.doc_id,
             {BM25_CONTRIB_SQL} AS contrib_fx
      FROM post p
      JOIN queries q USING (term)
      JOIN dfreq USING (term)
      JOIN dls USING (doc_id)
      CROSS JOIN scalars),
    per_doc AS (
      SELECT qid, doc_id, CAST(SUM(contrib_fx) AS BIGINT) AS score_fx
      FROM contrib GROUP BY qid, doc_id)
    SELECT qid, rank, doc_id, score_fx,
           ROUND(score_fx / {BM25_FIXED}.0, 4) AS score
    FROM (SELECT qid, doc_id, score_fx,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY score_fx DESC, doc_id ASC) AS rank
          FROM per_doc)
    WHERE rank <= {BM25_TOPK}
    """


@register(
    "text_bm25_search",
    _bm25_oracle(),
    doc="BM25 lexical search: inverted-index postings, document-frequency "
        "idf, length-normalized tf, top-5 docs per query. The query workload "
        "is derived deterministically from the corpus (top-9 terms chunked "
        "in threes). ln-free rational idf + 1e-6 fixed-point contribution "
        "quantization make the scores bit-identical across engines; the "
        "contribution formula is one shared SQL string (BM25_CONTRIB_SQL), "
        "so Spark and the oracle cannot drift. Plan: two partial-agg "
        "shuffles (postings, df) + broadcast query/scalar joins + per-qid "
        "window top-k.")
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import bm25_index

    docs = load_table(spark, sf_dir, "documents")
    index = bm25_index(docs, "doc_id", "text")
    queries = top_terms_as_queries(index.postings, BM25_N_TERMS,
                                   BM25_TERMS_PER_QUERY)
    out = bm25_topk(docs, queries, "doc_id", "text", BM25_TOPK, index=index)
    return out.select("qid", "rank", "doc_id", "score_fx", "score")


def _er_oracle() -> str:
    return f"""
    SELECT a.c_nationkey AS c_nationkey,
           a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {LINKAGE_MAX_DIST}
    """


@register(
    "er_customer_blocking",
    _er_oracle(),
    doc="Record linkage via FastSS delete-1 neighborhoods: each name "
        "explodes into its ~(len+1) single-deletion keys; candidates "
        "equi-join on (nation block, key) — near-linear, never the "
        "quadratic block self-join — then one JVM levenshtein verify per "
        "deduped candidate pair. Exactly equivalent to the quadratic "
        "baseline (pinned by test_search_linkage); the oracle states the "
        "quadratic semantics directly. Integer distances, exact across "
        "engines.")
def er_customer_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import deletion_neighborhood_matches

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    return deletion_neighborhood_matches(
        cust, "c_custkey", "c_name", ["c_nationkey"])


def _windows_sql(w: int) -> str:
    """DuckDB twin of operators.search.passage_windows_col: all w-token
    windows, stride 1, duplicates kept, whole text when shorter."""
    return f"""
    CASE WHEN len({TOKENS_SQL}) < {w}
         THEN [array_to_string({TOKENS_SQL}, ' ')]
         ELSE list_transform(
                generate_series(1, len({TOKENS_SQL}) - {w - 1}),
                i -> array_to_string({TOKENS_SQL}[i:i + {w - 1}], ' '))
    END"""


def _passage_oracle() -> str:
    return f"""
    WITH wins AS (
      SELECT doc_id, md5(unnest({_windows_sql(PASSAGE_W)})) AS h
      FROM documents),
    multi AS (
      SELECT h FROM (SELECT DISTINCT doc_id, h FROM wins)
      GROUP BY h HAVING COUNT(*) >= 2),
    per_doc AS (
      SELECT w.doc_id,
             COUNT(*) AS n_windows,
             CAST(SUM(CASE WHEN m.h IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dup_windows
      FROM wins w LEFT JOIN multi m USING (h)
      GROUP BY w.doc_id)
    SELECT doc_id, n_windows, n_dup_windows,
           ROUND(n_dup_windows * 1.0 / n_windows, 4) AS dup_frac,
           n_dup_windows > 0 AS has_dup_passage
    FROM per_doc
    """


@register(
    "text_duplicate_passages",
    _passage_oracle(),
    doc=f"Duplicated-passage detection: every {PASSAGE_W}-token window "
        "(stride 1) md5-hashed; windows occurring in >= 2 distinct docs "
        "mark their spans as cross-document duplicates — the fixed-window "
        "hash-join approximation of suffix-array exact-substring dedup "
        "(Lee et al. 2022), two shuffles at any scale instead of a global "
        "suffix sort. Integer-exact md5-set arithmetic.")
def text_duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return duplicate_passage_stats(docs, "doc_id", "text", PASSAGE_W)


def _overlap_oracle() -> str:
    return f"""
    WITH wins AS (
      SELECT source, md5(unnest({_windows_sql(PASSAGE_W)})) AS h
      FROM documents),
    gs AS (SELECT DISTINCT source, h FROM wins),
    ok AS (SELECT h FROM gs GROUP BY h
           HAVING COUNT(*) BETWEEN 2 AND {OVERLAP_MAX_GROUPS}),
    pairs AS (
      SELECT a.source AS group_a, b.source AS group_b,
             COUNT(*) AS n_shared_passages
      FROM gs a JOIN gs b ON a.h = b.h AND a.source < b.source
      JOIN ok ON a.h = ok.h
      GROUP BY 1, 2),
    sizes AS (SELECT source, COUNT(*) AS n FROM gs GROUP BY source)
    SELECT group_a, group_b, n_shared_passages,
           x.n AS n_a, y.n AS n_b,
           ROUND(n_shared_passages * 1.0 / LEAST(x.n, y.n), 4)
             AS overlap_frac
    FROM pairs JOIN sizes x ON group_a = x.source
               JOIN sizes y ON group_b = y.source
    """


@register(
    "dedup_cross_source_overlap",
    _overlap_oracle(),
    doc=f"Cross-corpus contamination matrix: distinct shared {PASSAGE_W}-"
        "token passages for every source pair, with containment-of-the-"
        "smaller-side overlap share — the pre-mixing report that exposes "
        "syndicated/mirrored sources before they flood a training mix. "
        "Passage-level, so partial syndication (shared paragraphs inside "
        "distinct docs) counts. Scale shape: group tag carried through "
        "the Arrow window-hash map (no corpus-sized re-join); the pair "
        "explode is bounded per hash by the number of GROUPS sharing it "
        f"(cap {OVERLAP_MAX_GROUPS}, oracle-mirrored), never by doc "
        "count; output is at most |sources|^2 matrix cells. Integer-exact "
        "md5-set arithmetic.")
def dedup_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return cross_group_passage_overlap(docs, "doc_id", "text", "source",
                                       PASSAGE_W)


def _containment_oracle() -> str:
    from ..operators.search import (
        CONTAIN_DF_DEN,
        CONTAIN_DF_FLOOR,
        CONTAIN_DF_NUM,
        CONTAIN_MAX_DF,
    )

    return f"""
    WITH sh AS (
      SELECT doc_id, unnest({shingles_sql()}) AS s FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    scal AS (SELECT COUNT(*) AS n_docs FROM documents),
    ok AS (
      SELECT s FROM sh GROUP BY s
      HAVING COUNT(*) <= {CONTAIN_DF_FLOOR}
          OR (COUNT(*) * {CONTAIN_DF_DEN}
              <= (SELECT n_docs FROM scal) * {CONTAIN_DF_NUM}
              AND COUNT(*) <= {CONTAIN_MAX_DF})),
    rare AS (SELECT sh.doc_id, sh.s FROM sh JOIN ok USING (s)),
    shared AS (
      SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS n_shared
      FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= {CONTAIN_MIN_SHARED})
    SELECT s.a, s.b, s.n_shared, z.n AS n_a,
           ROUND(s.n_shared * 1.0 / z.n, 4) AS containment_a
    FROM shared s JOIN sizes z ON z.doc_id = s.a
    """


@register(
    "dedup_containment_pairs",
    _containment_oracle(),
    doc="Asymmetric shingle containment |A∩B|/|A| for pairs sharing >= "
        f"{CONTAIN_MIN_SHARED} distinct RARE 3-shingles — catches a small "
        "doc embedded in a large one (quote farms, concatenated dumps), "
        "which symmetric Jaccard under-scores. Stop-shingle guard: shingles "
        "above the document-frequency cap (floor 8 / 5% of corpus AND an "
        "absolute 1000-doc cap — the relative cap alone still admits "
        "million-doc shingles at 100M-doc corpora; integer cross-multiply "
        "mirrored in the oracle) are dropped BEFORE the self-join, bounding "
        "per-shingle fan-out the same way MAX_BUCKET bounds LSH buckets.")
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", "text", 3, CONTAIN_MIN_SHARED)


MAD_SIGMA = 3  # flag days beyond 3x the median absolute deviation


def _mad_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    m AS (SELECT event_type, median(cnt) AS med FROM d GROUP BY 1),
    md AS (SELECT d.event_type, median(abs(cnt - med)) AS mad
           FROM d JOIN m USING (event_type) GROUP BY 1)
    SELECT d.event_type, d.day, d.cnt, m.med, md.mad,
           abs(d.cnt - m.med) > {MAD_SIGMA} * md.mad AS is_anomaly
    FROM d JOIN m USING (event_type) JOIN md USING (event_type)
    """


@register(
    "events_anomaly_mad",
    _mad_oracle(),
    doc="Robust time-series anomaly detection on daily event volumes: "
        "median + median-absolute-deviation per event type, flag days "
        f"beyond {MAD_SIGMA}x MAD. Medians of integer counts are exact "
        "half-integers (interpolated identically in Spark and DuckDB), so "
        "the flags are deterministic — no float tolerance needed. The "
        "daily rollup is the only full shuffle; the per-type median runs "
        "over ~days rows per type.")
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
         .agg(F.count("*").alias("cnt")))
    med = d.groupBy("event_type").agg(F.median("cnt").alias("med"))
    j = d.join(F.broadcast(med), "event_type")
    mad = (j.groupBy("event_type")
           .agg(F.median(F.abs(F.col("cnt") - F.col("med"))).alias("mad")))
    return (j.join(F.broadcast(mad), "event_type")
            .select("event_type", "day", "cnt", "med", "mad",
                    (F.abs(F.col("cnt") - F.col("med"))
                     > F.lit(MAD_SIGMA) * F.col("mad")).alias("is_anomaly")))


def _triangle_oracle() -> str:
    from . import REGISTRY

    er = REGISTRY["er_customer_blocking"].oracle
    return f"""
    WITH er AS ({er}),
    e AS (SELECT c_nationkey, id_a AS src, id_b AS dst FROM er)
    SELECT e1.c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.dst = e2.src AND e1.c_nationkey = e2.c_nationkey
    JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
            AND e3.c_nationkey = e1.c_nationkey
    GROUP BY e1.c_nationkey
    """


@register(
    "graph_triangle_count",
    _triangle_oracle(),
    doc="Per-nation triangle count over the record-linkage match graph — "
        "the cohesion signal that separates dense duplicate clusters from "
        "chains of borderline matches. Edges come from the GATED "
        "er_customer_blocking definition (oracle composed verbatim via "
        "nested WITH). Oriented enumeration (a<b<c): two self-joins — "
        "wedge build + left-semi closure probe; at scale degree "
        "orientation bounds wedge fan-out (operators/graph.py).")
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import REGISTRY
    from ..operators.graph import triangle_count

    er = REGISTRY["er_customer_blocking"].spark_fn(spark, sf_dir)
    edges = er.select("c_nationkey",
                      F.col("id_a").alias("src"),
                      F.col("id_b").alias("dst"))
    return triangle_count(edges, "c_nationkey")


HIST_BUCKETS = 20


def _hist_oracle() -> str:
    return f"""
    WITH s AS (SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
               FROM lineitem)
    SELECT LEAST(CAST(FLOOR((l_extendedprice - lo) * {HIST_BUCKETS}
                            / (hi - lo)) AS BIGINT),
                 {HIST_BUCKETS - 1}) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(l_extendedprice), 2) AS bucket_sum
    FROM lineitem CROSS JOIN s
    GROUP BY 1
    """


@register(
    "stats_equiwidth_histogram",
    _hist_oracle(),
    doc=f"Equi-width {HIST_BUCKETS}-bucket histogram of l_extendedprice — "
        "the table-statistics build a cost-based optimizer and the "
        "zone-map sidecars feed on. Two passes: a min/max scalar "
        "(broadcast) then one partial-aggregable bucket rollup. Bucket "
        "boundaries use only correctly-rounded IEEE ops, so bucket "
        "assignment is bit-identical across engines; max value clamps "
        "into the last bucket.")
def stats_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.agg(F.min("l_extendedprice").alias("lo"),
               F.max("l_extendedprice").alias("hi"))
    x = F.col("l_extendedprice")
    bucket = F.least(
        F.floor((x - F.col("lo")) * HIST_BUCKETS / (F.col("hi") - F.col("lo")))
        .cast("long"),
        F.lit(HIST_BUCKETS - 1))
    return (li.join(F.broadcast(s))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("l_extendedprice"), 2).alias("bucket_sum")))


# parent(k) = floor((k-1)/4): a deterministic 4-ary forest over part keys
_RC_BODY = """
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS node, p_partkey AS anc FROM {part}
      UNION ALL
      SELECT node, CAST(FLOOR((anc - 1) / 4.0) AS BIGINT) AS anc
      FROM anc WHERE anc > 0
    )
    SELECT a.anc AS ancestor,
           CAST(COUNT(*) AS BIGINT) AS n_desc,
           CAST(SUM(CAST(ROUND(p.p_retailprice * 100) AS BIGINT)) AS BIGINT)
             AS subtree_value_cents
    FROM anc a JOIN {part} p ON p.p_partkey = a.node
    GROUP BY a.anc
"""


@register(
    "sql_recursive_cte_rollup",
    _RC_BODY.format(part="part"),
    doc="Spark 4 WITH RECURSIVE executed by the engine itself (not an "
        "iterative-DataFrame emulation): BOM-style subtree rollup over a "
        "deterministic 4-ary forest on part keys — each ancestor's "
        "descendant count and subtree value. Depth is log4(n) (~8 at "
        "sf0.1), so the recursion is bounded and linear per level; money "
        "summed on the exact integer cents grid. The oracle is the "
        "IDENTICAL SQL text run by DuckDB.")
def sql_recursive_cte_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_rc")
    return spark.sql(_RC_BODY.format(part="part_rc"))


_DQ_BODY = """
    SELECT 'orders_null_custkey' AS check_name,
           CAST(COUNT_IF(o_custkey IS NULL) AS BIGINT) AS violations,
           CAST(COUNT(*) AS BIGINT) AS checked
    FROM {orders}
    UNION ALL
    SELECT 'orders_duplicate_pk',
           CAST(COALESCE(SUM(c - 1), 0) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT o_orderkey, COUNT(*) AS c FROM {orders} GROUP BY o_orderkey)
    UNION ALL
    SELECT 'orders_nonpositive_total',
           CAST(COUNT_IF(o_totalprice <= 0) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM {orders}
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           CAST(COUNT_IF(o.o_orderkey IS NULL) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM {lineitem} l LEFT JOIN {orders} o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST(COUNT_IF(c.c_custkey IS NULL) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM {orders} o LEFT JOIN {customer} c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_bad_quantity_or_discount',
           CAST(COUNT_IF(l_quantity <= 0 OR l_discount < 0 OR l_discount > 0.5)
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM {lineitem}
"""


@register(
    "dq_constraint_audit",
    _DQ_BODY.format(orders="orders", lineitem="lineitem", customer="customer"),
    doc="Data-quality constraint audit as one report: PK-null and "
        "PK-duplicate counts, value-range violations, referential-"
        "integrity orphans (left-join COUNT_IF — at scale the dimension "
        "side broadcasts), and date-ordering violations. The shape every "
        "ingest pipeline runs before promoting a batch; each check is a "
        "single partial-agg pass or broadcast-join count. Identical SQL "
        "text on both engines.")
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_dq")
    return spark.sql(_DQ_BODY.format(
        orders="orders_dq", lineitem="lineitem_dq", customer="customer_dq"))


KCORE_K = 2
KCORE_ROUNDS = 4


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    from . import REGISTRY

    er = REGISTRY["er_customer_blocking"].oracle
    stages = []
    for i in range(1, rounds + 1):
        p = f"s{i - 1}"
        stages.append(f"""
    d{i} AS (
      SELECT node FROM {p} GROUP BY node HAVING COUNT(*) >= {k}),
    s{i} AS (
      SELECT s.node, s.nbr FROM {p} s
      JOIN d{i} x ON s.node = x.node
      JOIN d{i} y ON s.nbr = y.node)""")
    return f"""
    WITH er AS ({er}),
    s0 AS (
      SELECT DISTINCT node, nbr FROM (
        SELECT id_a AS node, id_b AS nbr FROM er
        UNION ALL
        SELECT id_b AS node, id_a AS nbr FROM er)
      WHERE node <> nbr),{",".join(stages)}
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM s{rounds} GROUP BY node
    """


@register(
    "graph_kcore",
    _kcore_oracle(),
    doc=f"k-core decomposition (k={KCORE_K}, {KCORE_ROUNDS} peel rounds) of "
        "the record-linkage match graph: iteratively removing sub-k-degree "
        "nodes strips chains of borderline matches and leaves the densely "
        "interlinked duplicate cores. Edges compose the GATED "
        "er_customer_blocking definition verbatim. Per round: one node-id "
        "aggregate + two left-semi joins vs the shrinking survivor set "
        "(AQE-broadcast); checkpoints truncate the lineage; the loop "
        "early-exits at the fixpoint, which equals the fixed-round result "
        "the oracle unrolls (no-op tail rounds).")
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import REGISTRY
    from ..operators.graph import kcore_peel

    er = REGISTRY["er_customer_blocking"].spark_fn(spark, sf_dir)
    edges = er.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return kcore_peel(edges, KCORE_K, KCORE_ROUNDS)


_NOTIN_BODY = """
    SELECT 'not_in_with_null' AS variant,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM {customer}
    WHERE c_custkey NOT IN (
        SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                    ELSE o_custkey END
        FROM {orders} WHERE o_totalprice > 100000)
    UNION ALL
    SELECT 'not_in_null_free',
           CAST(COUNT(*) AS BIGINT)
    FROM {customer}
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM {orders}
        WHERE o_totalprice > 100000 AND o_custkey IS NOT NULL)
    UNION ALL
    SELECT 'anti_join_form',
           CAST(COUNT(*) AS BIGINT)
    FROM {customer} c
    WHERE NOT EXISTS (SELECT 1 FROM {orders} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
    """


@register(
    "sql_not_in_null_trap",
    _NOTIN_BODY.format(customer="customer", orders="orders"),
    doc="The NOT IN null trap, preserved exactly: a NULL in the subquery "
        "list makes every NOT IN comparison UNKNOWN, so the first variant "
        "returns ZERO rows — while the null-filtered NOT IN and the "
        "NOT EXISTS anti-join (null-immune, what a migration should use) "
        "agree with each other. ANSI three-valued logic is the kind of "
        "semantics a 'just rewrite it as a join' port silently breaks; "
        "the IDENTICAL SQL text runs on both engines.")
def sql_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ni")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ni")
    return spark.sql(_NOTIN_BODY.format(customer="customer_ni",
                                        orders="orders_ni"))


_SCALAR_SUB_BODY = """
    SELECT c_custkey, c_name,
           (SELECT ROUND(MAX(o_totalprice), 2) FROM {orders} o
            WHERE o.o_custkey = c.c_custkey) AS max_order,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {orders} o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderstatus = 'O') AS open_orders
    FROM {customer} c
    WHERE c_custkey % 10 = 0
    """


@register(
    "sql_correlated_scalar_select",
    _SCALAR_SUB_BODY.format(customer="customer", orders="orders"),
    doc="Correlated SCALAR subqueries in the SELECT list (two per row, one "
        "aggregating, one counting with an extra predicate): customers "
        "with no orders surface NULL max and 0 count — the outer-join-"
        "with-default semantics Catalyst de-correlates into aggregate + "
        "left join automatically. The IDENTICAL SQL text runs on both "
        "engines.")
def sql_correlated_scalar_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ss")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ss")
    return spark.sql(_SCALAR_SUB_BODY.format(customer="customer_ss",
                                             orders="orders_ss"))
