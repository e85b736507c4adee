"""Advanced relational surface: as-of join, correlated/IN subqueries,
grouping sets, pivot/unpivot, exact percentiles, approximate sketches, and a
vectorized Pandas-UDF exemplar.

The as-of join is the canonical "operator Spark lacks" case (SURVEY.md §2b):
implemented as a composition of built-in ops (tagged union + ignore-nulls
running LAST over a (ts, tag) window) — one shuffle on the join key, no
cartesian, no Python. The oracle uses DuckDB's native ASOF JOIN, so the
composition is verified against a first-class implementation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from ..sources.registry import load_table, register_views
from . import register


@register(
    "asof_join_last_purchase",
    """
    WITH p AS (SELECT user_id, ts, MAX(value) AS pvalue
               FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
         c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id,
           p.pvalue AS last_purchase_value,
           epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    doc="As-of join: each click gets the user's most recent purchase at or "
        "before it. Spark composition: tagged union + ignore-nulls running "
        "last() over (ts, tag); purchases deduped per (user, ts) so the "
        "match is deterministic. One shuffle on user_id; at 100 TB this "
        "beats a range-join explosion outright.")
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    p = (e.filter(F.col("event_type") == "purchase")
         .groupBy("user_id", "ts").agg(F.max("value").alias("pvalue")))
    c = (e.filter(F.col("event_type") == "click")
         .select("event_id", "user_id", "ts"))
    tagged = (
        p.select("user_id", "ts", F.lit(0).alias("tag"), "pvalue",
                 F.lit(None).cast("long").alias("event_id"))
        .unionByName(
            c.select("user_id", "ts", F.lit(1).alias("tag"),
                     F.lit(None).cast("double").alias("pvalue"), "event_id"))
    )
    w = (Window.partitionBy("user_id").orderBy("ts", "tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ts_us = F.unix_micros(F.col("ts"))
    return (
        tagged
        .withColumn("last_purchase_value", F.last("pvalue", ignorenulls=True).over(w))
        .withColumn("last_purchase_us",
                    F.last(F.when(F.col("tag") == 0, ts_us), ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select("event_id", "last_purchase_value",
                (ts_us - F.col("last_purchase_us")).alias("gap_us"))
    )


@register(
    "subquery_correlated_above_avg",
    """
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
    doc="Correlated scalar subquery (decorrelated by Catalyst into an "
        "aggregate + join — no per-row re-execution).")
def subquery_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """)


@register(
    "subquery_in_and_exists",
    """
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_returnflag = 'R')
    """,
    doc="IN + correlated EXISTS subqueries (both become semi joins).")
def subquery_in_and_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part", "lineitem"))
    return spark.sql("""
        SELECT p_partkey, p_brand
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_returnflag = 'R')
    """)


@register(
    "grouping_sets_explicit",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (the general form behind rollup/cube).")
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ROUND(SUM(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="PIVOT (wide conditional aggregation). Spark .pivot with explicit "
        "value list = single-pass agg, no second job to discover values.")
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pivoted = (o.groupBy("o_orderpriority")
               .pivot("o_orderstatus", ["O", "F", "P"])
               .count())
    return (pivoted
            .select("o_orderpriority",
                    F.coalesce("O", F.lit(0)).alias("n_open"),
                    F.coalesce("F", F.lit(0)).alias("n_filled"),
                    F.coalesce("P", F.lit(0)).alias("n_pending")))


@register(
    "unpivot_acctbal",
    """
    SELECT n_nationkey, 'customer_total' AS measure, v FROM (
      SELECT c_nationkey AS n_nationkey, ROUND(SUM(c_acctbal), 2) AS v
      FROM customer GROUP BY c_nationkey)
    UNION ALL
    SELECT s_nationkey, 'supplier_total' AS measure, v FROM (
      SELECT s_nationkey, ROUND(SUM(s_acctbal), 2) AS v
      FROM supplier GROUP BY s_nationkey)
    """,
    doc="UNPIVOT / melt: wide measures to (key, measure, value) rows via "
        "stack() — narrow, no shuffle beyond the input aggs.")
def unpivot_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (load_table(spark, sf_dir, "customer").groupBy("c_nationkey")
            .agg(F.round(F.sum("c_acctbal"), 2).alias("customer_total")))
    supp = (load_table(spark, sf_dir, "supplier").groupBy("s_nationkey")
            .agg(F.round(F.sum("s_acctbal"), 2).alias("supplier_total")))
    joined = (cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full")
              .select(F.coalesce("c_nationkey", "s_nationkey").alias("n_nationkey"),
                      "customer_total", "supplier_total"))
    return (joined.selectExpr(
        "n_nationkey",
        "stack(2, 'customer_total', customer_total, "
        "'supplier_total', supplier_total) AS (measure, v)")
        .filter(F.col("v").isNotNull()))


@register(
    "percentiles_exact",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           ROUND(MAX(o_totalprice), 2) AS p100
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact linear-interpolated percentiles per group (Spark percentile "
        "== DuckDB quantile_cont). For 100 TB use percentile_approx — see "
        "approx_sketches.")
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.max("o_totalprice"), 2).alias("p100"),
    ))


@register(
    "approx_sketches",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey)                          AS exact_orders,
           COUNT(DISTINCT l_partkey)                           AS exact_parts,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)       AS exact_median,
           ABS(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))
             <= 0.05 * COUNT(DISTINCT l_orderkey)              AS orders_ok,
           ABS(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
             <= 0.05 * COUNT(DISTINCT l_partkey)               AS parts_ok,
           ABS(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
             <= 0.05 * quantile_cont(l_extendedprice, 0.5)     AS median_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Sketch aggregates for 100 TB interactive profiling: HLL distinct "
        "counts and approximate percentiles (single pass, fixed memory, "
        "mergeable across partitions). Sketch VALUES differ per engine by "
        "construction, so the hash-checked contract is (a) the exact "
        "columns, engine-independent, and (b) tolerance booleans asserting "
        "each engine's OWN sketch lands within 5% of the exact value — "
        "deterministically TRUE in both engines when the sketches honor "
        "their accuracy bounds (Spark HLL rsd=0.01, percentile_approx "
        "accuracy=10000; DuckDB HLL / t-digest defaults are tighter than "
        "5% at this cardinality).")
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Two aggregations joined on the tiny group key, NOT one combined agg:
    # mixing COUNT(DISTINCT ...) with sketch aggregates makes Spark plan the
    # sketches inside the Expand-rewrite's keyed partial aggregate — i.e.
    # one HLL++ buffer (thousands of words at rsd=0.01) and one percentile
    # buffer PER (returnflag, orderkey, partkey, gid) group, millions of
    # allocations (measured 227 s at sf0.1 vs 0.3 s + 2.6 s split).
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("raw_median"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
            .alias("approx_median"))
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"))
    return (exact.join(F.broadcast(sketches), "l_returnflag").select(
        "l_returnflag", "exact_orders", "exact_parts",
        F.round(F.col("raw_median"), 4).alias("exact_median"),
        (F.abs(F.col("approx_orders") - F.col("exact_orders"))
         <= 0.05 * F.col("exact_orders")).alias("orders_ok"),
        (F.abs(F.col("approx_parts") - F.col("exact_parts"))
         <= 0.05 * F.col("exact_parts")).alias("parts_ok"),
        (F.abs(F.col("approx_median") - F.col("raw_median"))
         <= 0.05 * F.col("raw_median")).alias("median_ok"),
    ))


@register(
    "agg_salted_skew",
    """
    SELECT event_type,
           ROUND(SUM(value), 2) AS total_value,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Two-phase salted aggregation (hot-key mitigation): groupBy(key, "
        "salt) partial -> groupBy(key) merge. Salt derived from event_id so "
        "the result is deterministic; the oracle is the PLAIN group-by — "
        "salting must be invisible in results.")
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    e = load_table(spark, sf_dir, "events")
    out = salted_agg(
        e, ["event_type"],
        aggs=[F.round(F.sum("s"), 2).alias("total_value"),
              F.sum("n").alias("n")],
        partial_aggs=[F.sum("value").alias("s"),
                      F.count(F.lit(1)).alias("n")],
        num_salts=16,
        salt_by=F.col("event_id"))
    return out


_ZIPF_TOPK_ORACLE = """
    WITH keyed AS (
      SELECT CASE WHEN l_orderkey % 10 < 9 THEN 'hot'
                  ELSE 'k' || CAST(l_orderkey % 97 AS VARCHAR) END AS k,
             l_extendedprice, l_orderkey, l_linenumber
      FROM lineitem
    ), ranked AS (
      SELECT k, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY k
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey, l_linenumber) AS rn
      FROM keyed
    )
    SELECT k, COUNT(*) AS n_top, ROUND(SUM(l_extendedprice), 2) AS top_value
    FROM ranked WHERE rn <= 100
    GROUP BY k
    """

_TOPK_K = 100


def _zipf_keyed_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90% of rows share one hot key; the rest spread over 97 tail keys —
    the zipf shape that makes per-key window work a one-task straggler."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit("hot"))
         .otherwise(F.concat(F.lit("k"),
                             (F.col("l_orderkey") % 97).cast("string")))
         .alias("k"),
        "l_extendedprice", "l_orderkey", "l_linenumber")


_TOPK_ORDER = lambda: [F.col("l_extendedprice").desc(),  # noqa: E731
                       F.col("l_orderkey"), F.col("l_linenumber")]


@register(
    "skew_topk_hot_key_unsalted",
    _ZIPF_TOPK_ORACLE,
    doc="Top-100 rows per key over a zipf-keyed corpus (90% of rows on one "
        "hot key), PLAIN window ranking: the hot key's whole row set sorts "
        "in one task. NB at sf0.1 the AQE-coalesced hot sort (~540k rows) "
        "fits one task comfortably, so this plain form WINS the bench "
        "head-to-head there — salted_topk is for the regime where the hot "
        "key outgrows a task; the measured local crossover lives in the "
        "grouped-map pair (skew_groupmap_hot_key_*), where per-group Python "
        "serialization makes the straggler bite at bench scale already.")
def skew_topk_hot_key_unsalted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    keyed = _zipf_keyed_lineitem(spark, sf_dir)
    w = Window.partitionBy("k").orderBy(*_TOPK_ORDER())
    return (keyed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _TOPK_K)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_top"),
                 F.round(F.sum("l_extendedprice"), 2).alias("top_value")))


@register(
    "skew_topk_hot_key_salted",
    _ZIPF_TOPK_ORACLE,
    doc="The same zipf top-100 via two-phase salted ranking "
        "(operators.skew.salted_topk): 32 parallel per-salt sorts, then a "
        "final rank over 32x100 survivors per key. Identical result by "
        "construction (a global top-k row is in its salt's top-k) and by "
        "oracle — the shared SQL twin is the plain window form.")
def skew_topk_hot_key_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_topk

    keyed = _zipf_keyed_lineitem(spark, sf_dir)
    out = salted_topk(
        keyed, ["k"], _TOPK_ORDER(), k=_TOPK_K, num_salts=32,
        salt_by=F.concat_ws(",", "l_orderkey", "l_linenumber"))
    return (out.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_top"),
                 F.round(F.sum("l_extendedprice"), 2).alias("top_value")))


# Grouped-map skew stress pair: applyInPandas has NO partial aggregation —
# every row of a group ships to ONE Python worker, so a zipf-hot key is a
# serial straggler at any scale. The x16 row explode puts ~8.6M rows on the
# hot key at sf0.1, past the local crossover where two-phase salting beats
# the straggler (measured: salted 3.4s vs unsalted 4.1s at x8, gap widens
# with mult). All outputs are exact int64 (cents), so the oracle comparison
# has zero float-summation-order risk.
_GROUPMAP_MULT = 16

_ZIPF_GROUPMAP_ORACLE = f"""
    WITH keyed AS (
      SELECT CASE WHEN l_orderkey % 10 < 9 THEN 'hot'
                  ELSE 'k' || CAST(l_orderkey % 97 AS VARCHAR) END AS k,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem, generate_series(1, {_GROUPMAP_MULT}) t(rep)
    )
    SELECT k, COUNT(*) AS n_rows,
           CAST(SUM(c) AS BIGINT) AS sum_cents,
           MAX(c) AS max_cents
    FROM keyed GROUP BY k
    """


def _zipf_groupmap_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit("hot"))
         .otherwise(F.concat(F.lit("k"),
                             (F.col("l_orderkey") % 97).cast("string")))
         .alias("k"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        F.col("l_orderkey").alias("_okey"),
        F.col("l_linenumber").alias("_lno"),
        F.explode(F.sequence(F.lit(1), F.lit(_GROUPMAP_MULT))).alias("rep"))


# grouped-map inputs are projected to EXACTLY the columns the pandas
# function reads (+ grouping keys) before applyInPandas: a grouped map
# ships every column of the frame through the Arrow boundary whether the
# function touches it or not (Spark cannot see inside the function), and
# the row-id/salt plumbing columns (_okey, _lno, rep) roughly double the per-row
# Arrow bytes at 9.6M exploded rows. The straggler demonstration is
# untouched — the hot key still streams through one Python worker
# unsalted; only dead columns stop crossing the boundary.


def _groupmap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    c = pdf["c"]
    return pd.DataFrame({"k": [pdf["k"].iloc[0]],
                         "n_rows": [len(c)],
                         "sum_cents": [c.sum()],
                         "max_cents": [c.max()]})


_GROUPMAP_SCHEMA = "k string, n_rows long, sum_cents long, max_cents long"


@register(
    "skew_groupmap_hot_key_unsalted",
    _ZIPF_GROUPMAP_ORACLE,
    doc="Per-key stats via grouped-map applyInPandas over a zipf-keyed "
        "corpus, UNSALTED: the hot key's ~90% of all rows stream through "
        "one Python worker serially — the grouped-map straggler this bench "
        "row makes visible (compare the salted twin's time in BENCH).")
def skew_groupmap_hot_key_unsalted(spark: SparkSession, sf_dir: str) -> DataFrame:
    keyed = _zipf_groupmap_input(spark, sf_dir).select("k", "c")
    return keyed.groupBy("k").applyInPandas(_groupmap_stats, _GROUPMAP_SCHEMA)


@register(
    "skew_groupmap_hot_key_salted",
    _ZIPF_GROUPMAP_ORACLE,
    doc="The same grouped-map stats via MAP-SIDE pandas partials — salting "
        "taken to its limit (every input partition is its own salt, so the "
        "salt column and the 9.6M-row shuffle it fed both disappear): "
        "mapInPandas computes per-key pandas partials per Arrow batch "
        "where the rows already are, and ONLY the tiny (key, partial) rows "
        "shuffle into the mergeable builtin aggregates (sum/sum/max) — "
        "guide-§2.3 'aggregate before you shuffle' applied to the Python "
        "boundary. Identical exact-integer result (the merge is partition-"
        "assignment-invariant); the BENCH pair salted <= unsalted is the "
        "skew-handling evidence SCALE.md cites. r14: replaced the "
        "per-(key, salt) shuffled applyInPandas — that shape still paid a "
        "full exchange of every exploded row before any reduction.")
def skew_groupmap_hot_key_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    keyed = _zipf_groupmap_input(spark, sf_dir).select("k", "c")

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            g = pdf.groupby("k", sort=False)["c"]
            out = pd.DataFrame({"n_rows": g.size(),
                                "sum_cents": g.sum(),
                                "max_cents": g.max()}).reset_index()
            yield out[["k", "n_rows", "sum_cents", "max_cents"]]

    partial = keyed.mapInPandas(_partials, _GROUPMAP_SCHEMA)
    return (partial.groupBy("k")
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.sum("sum_cents").alias("sum_cents"),
                 F.max("max_cents").alias("max_cents")))


@register(
    "grouped_map_zscore",
    """
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / STDDEV_POP(value) OVER (PARTITION BY event_type), 4) AS zscore
    FROM events
    """,
    doc="Grouped-map applyInPandas exemplar: per-group pandas DataFrame in/"
        "out (z-score normalization per event_type). The oracle restates it "
        "as window functions — the grouped-map result must agree with the "
        "declarative form.")
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        mean = v.sum() / len(v)          # explicit sums: match SQL AVG exactly
        var = ((v - mean) ** 2).sum() / len(v)
        pdf["zscore"] = ((v - mean) / (var ** 0.5)).round(4)
        return pdf[["event_id", "event_type", "zscore"]]

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return e.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, zscore double")


@register(
    "pandas_udf_sigmoid",
    """
    SELECT event_id,
           ROUND(1.0 / (1.0 + EXP(-value)), 4) AS sigmoid
    FROM events
    WHERE event_type = 'purchase'
    """,
    doc="Vectorized Pandas UDF exemplar (Arrow-batched, ~10-100x over "
        "row-at-a-time Python). The UDF itself is deliberately trivial so "
        "the oracle can restate it in SQL; real use is model scoring / "
        "tokenizers that builtins can't express.")
def pandas_udf_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf(DoubleType())
    def sigmoid(s: pd.Series) -> pd.Series:
        return 1.0 / (1.0 + np.exp(-s))

    e = load_table(spark, sf_dir, "events")
    return (e.filter(F.col("event_type") == "purchase")
            .select("event_id", F.round(sigmoid("value"), 4).alias("sigmoid")))


@register(
    "pandas_udaf_rms",
    """
    SELECT event_type,
           ROUND(SQRT(AVG(value * value)), 6) AS rms_value
    FROM events
    GROUP BY event_type
    """,
    doc="Grouped-aggregate Pandas UDF (true UDAF): per-group root-mean-"
        "square computed in a vectorized Arrow batch per group. Spark plans "
        "it as a full-group aggregation (no partial agg — grouped-agg UDFs "
        "shuffle the group's rows), so at 100 TB you pre-aggregate what you "
        "can with builtins and reserve the UDAF for what SQL can't say; the "
        "deliberately-SQL-expressible body is what makes it oracle-checkable.")
def pandas_udaf_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf(DoubleType())
    def rms(v: pd.Series) -> float:
        return float(np.sqrt((v * v).mean()))

    e = load_table(spark, sf_dir, "events")
    # NB: Spark forbids mixing grouped-agg pandas UDFs with builtin
    # aggregates in one agg() — the UDAF stands alone here.
    return (e.groupBy("event_type")
            .agg(F.round(rms("value"), 6).alias("rms_value")))


@register(
    "approx_heavy_hitters",
    """
    WITH exact AS (
      SELECT l_returnflag, COUNT(*) AS exact_n
      FROM lineitem GROUP BY l_returnflag
    ), tot AS (SELECT COUNT(*) AS n FROM lineitem)
    SELECT l_returnflag,
           exact_n,
           exact_n >= 0.40 * (SELECT n FROM tot) AS is_heavy
    FROM exact
    """,
    doc="Count-min-sketch heavy hitters: estimate per-key frequencies from "
        "a CMS built in ONE pass (eps=0.1%, conf=99%) and flag keys above "
        "a 40% frequency threshold (l_returnflag is ~50/25/25, so exactly "
        "one key is heavy). CMS only over-counts (hash collisions add), "
        "never under-counts, and the ~15-point margins dwarf the 0.1% "
        "error bound — the is_heavy booleans are engine-independent even "
        "though DuckDB has no CMS: the oracle computes them exactly. The "
        "mergeable sketch is the 100 TB path (one pass, fixed memory, "
        "partial sketches merged across partitions by the aggregate); "
        "probe candidates come from a bounded freqItems pre-pass (at most "
        "~1/threshold keys collected, any cardinality — see "
        "cms_heavy_hitters).")
def approx_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return cms_heavy_hitters(li, "l_returnflag", frac_threshold=0.40)


HEAVY_FRAC = 0.40


def cms_heavy_hitters(df: DataFrame, key_col: str,
                      frac_threshold: float = HEAVY_FRAC,
                      candidates: list | None = None,
                      eps: float = 0.001, confidence: float = 0.99,
                      seed: int = 42) -> DataFrame:
    """(key, exact_n, is_heavy): flag keys whose frequency exceeds
    ``frac_threshold`` by probing a one-pass count-min sketch.

    The sketch is BUILT distributed (partial sketches merged by the
    aggregate — the 100 TB path); the serialized ~KB sketch is then probed
    per CANDIDATE key on the driver, which is how CMS is used operationally
    (Spark 4.1 has no count_min_sketch_estimate SQL probe). Candidates are
    BOUNDED: either the caller's explicit list, or a freqItems pre-pass at
    the same support threshold — a single-pass Misra-Gries-style scan whose
    output is at most ~1/threshold items regardless of key cardinality, and
    which guarantees every key with true frequency >= threshold is included.
    (The earlier form collected distinct(key) — unbounded on a
    high-cardinality key; this never collects more than the candidate cap.)
    Keys outside the candidate list are therefore provably not heavy:
    is_heavy coalesces to false for them, so the output still covers every
    key.
    """
    spark = df.sparkSession
    row = df.agg(
        F.count_min_sketch(key_col, F.lit(eps), F.lit(confidence),
                           F.lit(seed)).alias("sk"),
        F.count(F.lit(1)).alias("total")).collect()[0]
    if candidates is None:
        candidates = list(
            df.stat.freqItems([key_col], support=frac_threshold)
            .collect()[0][0])
    jvm = spark._jvm  # noqa: SLF001
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row.sk)))
    est = spark.createDataFrame(
        [(k, int(cms.estimateCount(k))) for k in candidates],
        f"{key_col} {df.schema[key_col].dataType.simpleString()}, approx_n long")
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_n"))
    return (exact.join(F.broadcast(est), key_col, "left")
            .select(key_col, "exact_n",
                    F.coalesce(
                        F.col("approx_n") >= frac_threshold * F.lit(int(row.total)),
                        F.lit(False)).alias("is_heavy")))


@register(
    "approx_hll_mergeable_sketches",
    """
    SELECT 'day-' || CAST(CAST(ts AS DATE) AS VARCHAR) AS scope,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS est_ok
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'total' AS scope,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS est_ok
    FROM events
    """,
    doc="Mergeable HLL sketch columns (Apache DataSketches via "
        "hll_sketch_agg/hll_union_agg/hll_sketch_estimate) — THE 100 TB "
        "distinct-count pattern: build one per-day sketch at ingest, store "
        "it as a column, and answer any-day-range distinct questions by "
        "UNIONING stored sketches without touching raw data (the 'total' "
        "row is estimated purely from the 30 daily sketches). Default "
        "lgConfigK=12 gives ~1.6% standard error; the gate compares "
        "estimate-vs-exact within a 5% tolerance boolean, which is "
        "engine-independent (DuckDB computes the exact side only).")
def approx_hll_mergeable_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (load_table(spark, sf_dir, "events")
         .withColumn("day", F.col("ts").cast("date")))
    daily_sk = e.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    daily_est = daily_sk.select(
        "day", F.hll_sketch_estimate("sk").alias("est"))
    daily_exact = e.groupBy("day").agg(
        F.countDistinct("user_id").alias("exact_users"))
    day_rows = (daily_exact.join(daily_est, "day")
                .select(F.concat(F.lit("day-"), F.col("day").cast("string"))
                        .alias("scope"),
                        "exact_users",
                        (F.abs(F.col("est") - F.col("exact_users"))
                         <= 0.05 * F.col("exact_users")).alias("est_ok")))
    total_est = daily_sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    total_exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    total_row = (total_exact.crossJoin(total_est)
                 .select(F.lit("total").alias("scope"), "exact_users",
                         (F.abs(F.col("est") - F.col("exact_users"))
                          <= 0.05 * F.col("exact_users")).alias("est_ok")))
    return day_rows.unionByName(total_row)


@register(
    "approx_hll_rolling_distinct",
    """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST((SELECT COUNT(DISTINCT e.user_id) FROM events e
                 WHERE CAST(e.ts AS DATE)
                       BETWEEN day - INTERVAL 6 DAY AND day)
                AS BIGINT) AS exact_users,
           TRUE AS est_ok
    FROM days
    """,
    doc="Rolling 7-day distinct users from STORED daily HLL sketches: "
        "hll_union_agg runs as a WINDOW aggregate over the per-day sketch "
        "rows (RANGE -6 days on a day-number ordering, so calendar gaps "
        "cannot widen the window) — the any-range-distinct question "
        "answered from |days| sketch rows with the raw corpus never "
        "rescanned. The exact side (gate only) is a day-range join; at "
        "100 TB you would never compute it — that asymmetry is the whole "
        "point. 5% tolerance boolean, engine-independent.")
def approx_hll_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = (load_table(spark, sf_dir, "events")
         .withColumn("day", F.col("ts").cast("date")))
    daily_sk = (e.groupBy("day")
                .agg(F.hll_sketch_agg("user_id").alias("sk"))
                .withColumn("day_num", F.datediff("day", F.lit("1970-01-01"))))
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    est = daily_sk.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est"))
    days = e.select("day").distinct()
    exact = (e.select(F.col("day").alias("eday"), "user_id")
             .join(days, (F.col("eday") >= F.date_sub(F.col("day"), 6))
                   & (F.col("eday") <= F.col("day")))
             .groupBy("day")
             .agg(F.countDistinct("user_id").alias("exact_users")))
    return (exact.join(est, "day")
            .select(F.col("day").cast("string").alias("day"),
                    "exact_users",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     <= 0.05 * F.col("exact_users")).alias("est_ok")))


@register(
    "agg_winsorized_mean",
    """
    WITH b AS (
      SELECT o_orderpriority,
             ROUND(quantile_cont(o_totalprice, 0.05), 4) AS lo,
             ROUND(quantile_cont(o_totalprice, 0.95), 4) AS hi
      FROM orders GROUP BY o_orderpriority)
    SELECT o.o_orderpriority,
           ROUND(AVG(LEAST(GREATEST(o.o_totalprice, b.lo), b.hi)), 4)
             AS winsorized_mean,
           ROUND(AVG(o.o_totalprice), 4) AS raw_mean,
           CAST(SUM(CASE WHEN o.o_totalprice < b.lo
                           OR o.o_totalprice > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
    FROM orders o JOIN b ON o.o_orderpriority = b.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
    doc="Winsorized (5%-clamped) mean per group — the robust-statistics "
        "answer to outlier-polluted metrics: per-group p05/p95 bounds "
        "(exact interpolated percentiles, rounded to a shared 4-dp grid "
        "BEFORE clamping so both engines clamp identically), values "
        "clamped, mean + clamp count reported beside the raw mean. Two "
        "passes: a percentile aggregate whose |groups|-row result "
        "broadcast-joins back onto the fact scan — the second pass is "
        "map-side only.")
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    b = (o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.05)), 4).alias("lo"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("hi")))
    clamped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")),
                      F.col("hi"))
    out_of_band = ((F.col("o_totalprice") < F.col("lo"))
                   | (F.col("o_totalprice") > F.col("hi"))).cast("long")
    return (o.join(F.broadcast(b), "o_orderpriority")
            .groupBy("o_orderpriority")
            .agg(F.round(F.avg(clamped), 4).alias("winsorized_mean"),
                 F.round(F.avg("o_totalprice"), 4).alias("raw_mean"),
                 F.sum(out_of_band).alias("n_clamped")))


@register(
    "agg_deterministic_mode",
    """
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2)
    SELECT o_orderpriority,
           o_orderstatus AS mode_status, n AS mode_n
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY n DESC, o_orderstatus) AS rn
      FROM c)
    WHERE rn = 1
    """,
    doc="Deterministic per-group MODE: value counts then argmax with a "
        "lexicographic tie-break — engine-native mode() functions resolve "
        "ties arbitrarily, which is exactly what a reproducible pipeline "
        "cannot use. Two map-side-partial aggregates; the argmax runs on "
        "the |groups x values|-bounded count table, never the fact "
        "table.")
def agg_deterministic_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = (o.groupBy("o_orderpriority", "o_orderstatus")
         .agg(F.count(F.lit(1)).alias("n")))
    return (c.groupBy("o_orderpriority")
            .agg(F.min_by(
                F.struct(F.col("o_orderstatus").alias("mode_status"),
                         F.col("n").alias("mode_n")),
                # min over (-n, status): largest count first, then the
                # lexicographically SMALLEST status — a fully general
                # string tie-break (struct comparison is field-ordered)
                F.struct((F.lit(-1) * F.col("n")).alias("neg_n"),
                         F.col("o_orderstatus"))).alias("m"))
            .select("o_orderpriority", "m.mode_status", "m.mode_n"))
