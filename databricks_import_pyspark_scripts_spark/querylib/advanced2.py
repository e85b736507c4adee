"""Second advanced batch: bucketized range join, Python UDTF, share-of-total
and NOT-IN shapes (TPC-H Q11/Q16 style), full sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.registry import load_table, register_views
from . import register

RANGE_WINDOW_S = 300  # +/- 5 minutes


@register(
    "range_join_close_events",
    f"""
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND b.ts >= a.ts - INTERVAL {RANGE_WINDOW_S} SECOND
     AND b.ts <= a.ts + INTERVAL {RANGE_WINDOW_S} SECOND
    """,
    doc="Range join (same-user event pairs within +/-5 min) decomposed "
        "Spark-first: equi-join on (user, time-bucket) with the probe side "
        "exploded to its 3 adjacent buckets, then the exact range filter. "
        "Turns an unbounded theta-join into an equi-join whose shuffle "
        "volume is O(rows x 3) — the standard interval-join strategy at "
        "scale. Oracle states the naive inequality join.")
def range_join_close_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    bucket = F.floor(ts_us / (RANGE_WINDOW_S * 1_000_000))
    a = (e.select(F.col("event_id").alias("id_a"), "user_id",
                  ts_us.alias("ts_a"), bucket.alias("bkt"))
         .withColumn("probe_bkt", F.explode(F.array(
             F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)))
         .drop("bkt"))
    b = e.select(F.col("event_id").alias("id_b"),
                 F.col("user_id").alias("user_b"),
                 ts_us.alias("ts_b"), bucket.alias("probe_bkt"))
    win_us = RANGE_WINDOW_S * 1_000_000
    return (
        a.join(b, ["probe_bkt"])
        .filter((F.col("user_id") == F.col("user_b"))
                & (F.col("id_a") < F.col("id_b"))
                & (F.col("ts_b") >= F.col("ts_a") - win_us)
                & (F.col("ts_b") <= F.col("ts_a") + win_us))
        .select("id_a", "id_b", (F.col("ts_b") - F.col("ts_a")).alias("gap_us"))
    )


@register(
    "udtf_document_tokens",
    """
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents WHERE doc_id < 50
    """,
    doc="Python UDTF (table function) exemplar: one row per token per "
        "document — the lateral-view/flatMap API surface. (In production "
        "explode() does this JVM-side; the UDTF path is for logic builtins "
        "can't express, e.g. real tokenizers.) useArrow=True swaps the "
        "default row-at-a-time pickle transport (BatchEvalPython in the "
        "plan) for Arrow batches (ArrowEvalPython) — eval is still called "
        "per row, but rows cross the JVM/Python boundary columnar.")
def udtf_document_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string", useArrow=True)
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for tok in re.findall(r"[a-z0-9]+", text.lower()):
                yield doc_id, tok

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    # UDTF invoked per input row via lateral join
    d.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql("""
        SELECT t.doc_id, t.token
        FROM udtf_docs_in, LATERAL tokenize_udtf(doc_id, text) t
    """)


@register(
    "q11_important_stock_share",
    """
    SELECT s_nationkey,
           ROUND(SUM(s_acctbal), 2) AS nation_bal
    FROM supplier
    GROUP BY s_nationkey
    HAVING SUM(s_acctbal) > (SELECT SUM(s_acctbal) * 0.15 FROM supplier)
    """,
    doc="TPC-H Q11 shape: group sums filtered against a share of the global "
        "total (uncorrelated scalar subquery in HAVING; the single global "
        "row broadcasts).")
def q11_important_stock_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("supplier",))
    return spark.sql("""
        SELECT s_nationkey,
               ROUND(SUM(s_acctbal), 2) AS nation_bal
        FROM supplier
        GROUP BY s_nationkey
        HAVING SUM(s_acctbal) > (SELECT SUM(s_acctbal) * 0.15 FROM supplier)
    """)


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_type, p_size
    """,
    doc="TPC-H Q16 shape: NOT IN subquery (null-aware anti join) + distinct "
        "count over a join, with IN-list and inequality predicates pushed.")
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part", "lineitem", "supplier"))
    return spark.sql("""
        SELECT p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_type, p_size
    """)


@register(
    "window_sessionization_ids",
    """
    SELECT user_id, event_id,
           CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events)
    """,
    doc="Full sessionization: gap marker (30-min rule) -> running sum = "
        "per-user session id. The batch twin of session_window(); one "
        "shuffle on user_id, two window passes over the same sort order "
        "(Catalyst collapses them into one Window exec).")
def window_sessionization_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    lag_us = F.lag(ts_us).over(w)
    marked = e.select(
        "user_id", "event_id", "ts",
        F.when(lag_us.isNull() | (ts_us - lag_us > 1800 * 1_000_000), 1)
         .otherwise(0).alias("is_start"))
    return marked.select(
        "user_id", "event_id",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"))


@register(
    "scalar_try_functions",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 25 THEN NULL
                ELSE ROUND(l_extendedprice / NULLIF(l_quantity - 25, 0), 4)
           END AS price_per_extra_unit,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           CAST(CASE WHEN l_linenumber = 1 THEN l_linenumber ELSE NULL END AS BIGINT) AS first_elem
    FROM lineitem
    WHERE l_orderkey % 1000 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Error-safe scalar surface: try_divide (NULL on /0 instead of "
        "error/inf), try_cast (NULL on bad parse), try_element_at (NULL "
        "out of bounds) — ANSI-mode-safe expressions a pipeline uses so "
        "one malformed row can't kill a 100 TB job. Oracle restates them "
        "with CASE/NULLIF/TRY_CAST (DuckDB's equivalents).")
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 1000 == 0)
    return (li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.try_divide(F.col("l_extendedprice"),
                             F.col("l_quantity") - 25), 4)
         .alias("price_per_extra_unit"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.try_element_at(F.array(F.col("l_linenumber")),
                         F.col("l_linenumber").cast("int"))
         .cast("long").alias("first_elem"))
        .orderBy("l_orderkey", "l_linenumber"))


@register(
    "lateral_top_suppliers",
    """
    SELECT n_name, s.s_name, s.acctbal
    FROM nation, LATERAL (
      SELECT s_name, ROUND(s_acctbal, 2) AS acctbal
      FROM supplier
      WHERE s_nationkey = n_nationkey
      ORDER BY s_acctbal DESC, s_name
      LIMIT 2) s
    ORDER BY n_name, acctbal DESC, s_name
    """,
    doc="Correlated LATERAL subquery (SQL-standard lateral join): per-nation "
        "top-2 suppliers. Catalyst rewrites the correlated limit into a "
        "DomainJoin + window-rank — same physical shape as the window-topk "
        "formulation, no per-row re-execution.")
def lateral_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import register_views

    register_views(spark, sf_dir, ("nation", "supplier"))
    return spark.sql("""
        SELECT n_name, s.s_name, s.acctbal
        FROM nation, LATERAL (
          SELECT s_name, ROUND(s_acctbal, 2) AS acctbal
          FROM supplier
          WHERE s_nationkey = n_nationkey
          ORDER BY s_acctbal DESC, s_name
          LIMIT 2) s
        ORDER BY n_name, acctbal DESC, s_name
    """)


@register(
    "window_range_interval_frame",
    """
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           ROUND(SUM(value) OVER w, 4) AS value_last_hour
    FROM (SELECT *, epoch_us(ts) // 1000000 AS ts_s
          FROM events WHERE user_id % 10 = 0)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc="RANGE frame over time with an interval bound — the sliding "
        "time-window aggregate (trailing 1h per user). Both engines "
        "order on TRUNCATED epoch seconds (Spark ts.cast(long), DuckDB "
        "epoch_us//1e6): the data has sub-second timestamps, and a true "
        "microsecond INTERVAL bound vs truncated seconds disagree "
        "whenever a pair straddles the boundary inside one second — "
        "probed, then pinned to the same grid on both sides. RANGE "
        "includes ts-peer rows (unlike ROWS), so duplicates stay "
        "well-defined. One shuffle on user_id.")
def window_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    w = (Window.partitionBy("user_id").orderBy(F.col("ts").cast("long"))
         .rangeBetween(-3600, Window.currentRow))
    return (e.select(
        "user_id", "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("value_last_hour"))
        .orderBy("user_id", "event_id"))


@register(
    "scalar_variant_shredding",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS missing_path,
           json_valid(CASE WHEN event_id % 2 = 1
                           THEN substr(props, 1, length(props) - 1)
                           ELSE props END) AS parse_ok
    FROM events
    """,
    doc="Spark 4 VARIANT family over the JSON property blobs: parse_json "
        "-> try_variant_get typed path extraction (long and string casts "
        "of the same path, a missing path as NULL), plus try_parse_json's "
        "NULL-not-throw contract probed with deliberately corrupted JSON "
        "on odd event ids. VARIANT is the modern semi-structured scan "
        "path: the binary encoding pushes typed path access down without "
        "per-row string re-parsing.")
def scalar_variant_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    # corruption = drop the closing brace: rejected by BOTH engines'
    # parsers (a dropped OPENING brace leaves '"k": 69}', which Spark's
    # lenient Jackson front-end accepts while DuckDB does not)
    corrupt = F.when(F.col("event_id") % 2 == 1,
                     F.expr("substring(props, 1, length(props) - 1)")) \
               .otherwise(F.col("props"))
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "long").alias("missing_path"),
        F.try_parse_json(corrupt).isNotNull().alias("parse_ok"))
