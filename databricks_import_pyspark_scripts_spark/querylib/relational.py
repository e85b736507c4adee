"""Core relational surface: scans, filters, joins (all strategies), hash
aggregation, rollup/cube, windows, sort/limit/top-k, set ops, scalar and
higher-order functions, JSON extraction.

This is SURVEY.md §2b made explicit: the reference delegates all of this to
``spark.sql`` (operator Q1, /root/reference/unload_databricks_data_to_s3.py:371);
here each family is a first-class, oracle-verified query.

Scale notes are attached per query: which side broadcasts, where the shuffles
are, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.registry import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- aggregation

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
                                                                            AS sum_disc_price,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) / 1000000.0
                                                                            AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style scan->filter->hash agg. Map-side partial agg + one "
        "shuffle on the tiny (flag,status) key space; AQE coalesces the "
        "post-shuffle partitions. Filter and 7-column pruning push to parquet.")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # exact-integer money math: terms live on a fixed decimal grid
            # (price 2dp x discount 2dp -> 4dp; x tax -> 6dp), so scale to
            # that grid, sum as BIGINT (exact at any data scale), divide
            # back. Rounding a double BELOW its grid is never cross-engine
            # safe: Spark rounds the shortest-decimal repr, DuckDB the
            # binary value, and grid points sit exactly on .5 boundaries.
            (F.sum(F.round(disc_price * 10000).cast("long")) / 10000.0)
            .alias("sum_disc_price"),
            (F.sum(F.round(disc_price * (1 + F.col("l_tax")) * 1000000).cast("long"))
             / 1000000.0).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct_counts",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*)                  AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="COUNT(DISTINCT) expands to a two-phase agg in Spark (partial "
        "distinct per partition, then final) — no driver involvement, scales "
        "linearly in distinct keys.")
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP = grouping-sets expansion inside one hash-agg pass; NULL "
        "markers distinguish subtotal rows (hash-compared as NULLs).")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over a 3x5 key space — grouping-set expansion is output-bounded "
        "regardless of input scale.")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
    )


# --------------------------------------------------------------------- joins

@register(
    "q3_unshipped_revenue",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style 3-way join + agg + deterministic top-10 (ties broken "
        "by l_orderkey). customer is the small filtered side -> broadcast; "
        "orders-lineitem is the big shuffle join on orderkey. TakeOrdered "
        "avoids a global sort.")
def q3_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
        .select("l_orderkey", "revenue",
                F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_supplier_volume",
    """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5-style 6-way join. region/nation/supplier/customer all "
        "broadcast (small dims); only orders-lineitem shuffles on orderkey. "
        "At 100 TB the dim broadcasts keep this to ONE big shuffle.")
def q5_region_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "join_broadcast_brand_volume",
    """
    SELECT p_brand,
           ROUND(SUM(l_quantity), 2) AS total_qty,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Fact-to-dim broadcast join: part ships to every executor, lineitem "
        "never shuffles for the join (only the final small agg shuffles).")
def join_broadcast_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"),
             F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "join_semi_active_customers",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    doc="Left-semi join = EXISTS. Semi joins short-circuit on first match and "
        "never duplicate the left side.")
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_anti_idle_customers",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Left-anti join = NOT EXISTS; null-safe by construction (unlike "
        "NOT IN with nullable keys).")
def join_anti_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "join_full_outer_nation_counts",
    """
    SELECT n_name,
           COALESCE(cust.n_cust, 0) AS n_cust,
           COALESCE(supp.n_supp, 0) AS n_supp
    FROM nation
    LEFT JOIN (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cust
           ON n_nationkey = cust.c_nationkey
    LEFT JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) supp
           ON n_nationkey = supp.s_nationkey
    """,
    doc="Outer joins with pre-aggregated (already-reduced) sides: aggregate "
        "BEFORE joining so the join input is |keys|, not |rows|.")
def join_full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    cust = (_t(spark, sf_dir, "customer").groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_cust")))
    supp = (_t(spark, sf_dir, "supplier").groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n_supp")))
    return (
        n.join(cust, n.n_nationkey == cust.c_nationkey, "left")
        .join(supp, n.n_nationkey == supp.s_nationkey, "left")
        .select("n_name",
                F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
                F.coalesce("n_supp", F.lit(0)).alias("n_supp"))
    )


# ------------------------------------------------------------------- windows

@register(
    "window_topk_per_group",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn <= 5
    """,
    doc="Top-K per group via ROW_NUMBER with full tiebreak. One shuffle on "
        "the partition key; Spark pushes a per-partition top-K (WindowGroupLimit) "
        "below the shuffle so 100 TB never fully sorts.")
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("l_returnflag")
         .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey"),
                  F.col("l_linenumber")))
    return (
        _t(spark, sf_dir, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "window_running_balance",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
    doc="Running aggregate with an explicit ROWS frame; deterministic via "
        "(o_orderdate, o_orderkey) ordering.")
def window_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey",
            F.round(F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .alias("running_spend"),
            F.row_number().over(w).alias("order_seq"),
        )
    )


@register(
    "window_lag_lead_sessions",
    """
    SELECT user_id, event_id,
           LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 THEN 1
                ELSE 0 END AS session_start
    FROM events
    """,
    doc="LAG/LEAD + sessionization marker (30-min gap rule) — the batch "
        "equivalent of session windows; one shuffle on user_id.")
def window_lag_lead_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    lag_us = F.lag(ts_us).over(w)
    return (
        _t(spark, sf_dir, "events")
        .select(
            "user_id", "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.when(lag_us.isNull(), 1)
             .when(ts_us - lag_us > 1800 * 1_000_000, 1)
             .otherwise(0).alias("session_start"),
        )
    )


# ------------------------------------------------------------------- set ops

@register(
    "setops_nation_coverage",
    """
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT 'both' AS side, nationkey FROM cust_nations INTERSECT
      SELECT 'both' AS side, nationkey FROM supp_nations
    UNION ALL
    (SELECT 'cust_only' AS side, nationkey FROM cust_nations
     EXCEPT
     SELECT 'cust_only' AS side, nationkey FROM supp_nations)
    """,
    doc="INTERSECT / EXCEPT / UNION ALL over distinct key sets; set ops "
        "reduce to aggregates+joins in Catalyst.")
def setops_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (_t(spark, sf_dir, "customer")
            .select(F.col("c_nationkey").alias("nationkey")).distinct())
    supp = (_t(spark, sf_dir, "supplier")
            .select(F.col("s_nationkey").alias("nationkey")).distinct())
    both = (cust.intersect(supp)
            .select(F.lit("both").alias("side"), "nationkey"))
    cust_only = (cust.exceptAll(supp)
                 .select(F.lit("cust_only").alias("side"), "nationkey"))
    return both.unionAll(cust_only)


@register(
    "window_value_functions",
    """
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
           COUNT(*) OVER (PARTITION BY o_custkey) AS cust_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Window value functions: first/last/nth value with explicit frames "
        "(last_value needs the full-partition frame — the classic trap) "
        "plus an unordered partition aggregate (count).")
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wfull = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
             .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    wagg = Window.partitionBy("o_custkey")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.count(F.lit(1)).over(wagg).alias("cust_orders"),
    )


@register(
    "map_functions",
    """
    SELECT event_id,
           array_to_string(map_keys(m), ',')   AS keys_joined,
           (m['etype'])[1]                     AS etype_val,
           len(map_keys(m))                    AS n_keys
    FROM (SELECT event_id,
                 MAP {'etype': event_type, 'uid': CAST(user_id AS VARCHAR)} AS m
          FROM events)
    """,
    doc="Map construction + access family: map_from_arrays/create_map, "
        "map_keys, element access — output flattened to scalars so the "
        "hash compare is engine-neutral.")
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("etype"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"))
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
        F.element_at(m, "etype").alias("etype_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "setops_bag_semantics",
    """
    SELECT o_orderpriority FROM orders WHERE YEAR(o_orderdate) = 1997
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE YEAR(o_orderdate) = 1998
    """,
    doc="Duplicate-preserving INTERSECT ALL (bag semantics): per priority, "
        "min(count_1997, count_1998) copies survive — compiles to counted "
        "aggregation, not row-pairing.")
def setops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_orderpriority")
    y98 = o.filter(F.year("o_orderdate") == 1998).select("o_orderpriority")
    return y97.intersectAll(y98)


# ------------------------------------------------------- scalar fn families

@register(
    "scalar_string_functions",
    """
    SELECT p_partkey,
           UPPER(p_brand)                                   AS brand_upper,
           SUBSTRING(p_name, 1, 8)                          AS name_prefix,
           LENGTH(p_name)                                   AS name_len,
           CONCAT(p_brand, ':', p_type)                     AS brand_type,
           REPLACE(p_type, ' ', '_')                        AS type_snake,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS is_green,
           SPLIT_PART(p_type, ' ', 1)                       AS type_head
    FROM part
    """,
    doc="String function family: case, substring, length, concat, replace, "
        "LIKE, split_part — all codegen'd JVM expressions.")
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("is_green"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
    )


@register(
    "scalar_regexp_functions",
    r"""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g')            AS name_devoweled,
           CASE WHEN regexp_matches(p_name, '^[a-z]+ ')
                THEN 1 ELSE 0 END                                 AS starts_lower_word
    FROM part
    """,
    doc="Regexp family: capture-group extraction, replacement, match test. "
        "(Spark regexp_replace is replace-all; DuckDB needs the 'g' flag.)")
def scalar_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.when(F.col("p_name").rlike(r"^[a-z]+ "), 1).otherwise(0)
        .alias("starts_lower_word"),
    )


@register(
    "hof_array_ops",
    """
    SELECT l_orderkey, l_linenumber,
           len(seq) AS n,
           seq[2] AS second_elem,
           list_position(seq, CAST(l_linenumber AS BIGINT)) AS self_pos,
           list_contains(seq, CAST(3 AS BIGINT)) AS has_three,
           list_reverse(seq)[1] AS last_elem,
           array_to_string(seq, ',') AS joined
    FROM (SELECT l_orderkey, l_linenumber,
                 generate_series(1, CAST(l_linenumber AS BIGINT)) AS seq
          FROM lineitem WHERE l_linenumber >= 5)
    """,
    doc="Array-construction/manipulation family: sequence, indexing, "
        "position, contains, reverse, join — all per-row JVM expressions.")
def hof_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") >= 5)
    seq = F.sequence(F.lit(1).cast("long"), F.col("l_linenumber").cast("long"))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.size(seq).alias("n"),
        F.element_at(seq, 2).alias("second_elem"),
        F.array_position(seq, F.col("l_linenumber").cast("long")).alias("self_pos"),
        F.array_contains(seq, F.lit(3).cast("long")).alias("has_three"),
        F.element_at(F.reverse(seq), 1).alias("last_elem"),
        F.array_join(seq, ",").alias("joined"),
    )


@register(
    "scalar_datetime_functions",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)             AS order_date,
           YEAR(o_orderdate)                     AS order_year,
           MONTH(o_orderdate)                    AS order_month,
           DAYOFWEEK(o_orderdate)                AS order_dow,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)    AS due_date
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
    doc="Date/time family: extract, trunc, interval arithmetic. Both sides "
        "emit 0-based-Sunday dow (Spark dayofweek is 1-based, DuckDB 0-based; "
        "Spark subtracts 1).")
def scalar_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


@register(
    "scalar_json_extraction",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           event_type
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    doc="JSON scalar extraction from the events.props string column "
        "(get_json_object — the pattern the reference's customers use on "
        "Amplitude property blobs).")
def scalar_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        e.filter(k.isNotNull())
        .select("event_id", k.cast("bigint").alias("prop_k"), "event_type")
    )


@register(
    "scalar_json_parse_struct",
    """
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k_val,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
    doc="Schema-directed JSON parsing: from_json into a typed struct (vs "
        "get_json_object string extraction in scalar_json_extraction) + "
        "validity probe.")
def scalar_json_parse_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_val"),
        F.when(F.try_parse_json(F.col("props")).isNotNull(), 1).otherwise(0)
        .alias("is_valid"),
    )


@register(
    "customer_360_kitchen_sink",
    """
    WITH spend AS (
      SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spend,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey),
    returns AS (
      SELECT o_custkey, COUNT(*) AS n_returned_lines
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'R'
      GROUP BY o_custkey)
    SELECT c_custkey, c_mktsegment, n_name,
           total_spend, n_orders,
           COALESCE(n_returned_lines, 0) AS n_returned_lines,
           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                              ORDER BY total_spend DESC, c_custkey) AS segment_rank
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN spend  ON c_custkey = spend.o_custkey
      LEFT JOIN returns ON c_custkey = returns.o_custkey
    """,
    doc="Composed multi-CTE 'customer 360': two pre-aggregations, inner + "
        "left joins, COALESCE, segment ranking window — the CTE-chained "
        "report shape; each CTE reduces before joining.")
def customer_360_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    spend = (o.groupBy("o_custkey")
             .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
                  F.count(F.lit(1)).alias("n_orders")))
    returns = (o.join(li.filter(F.col("l_returnflag") == "R"),
                      o.o_orderkey == li.l_orderkey)
               .groupBy("o_custkey")
               .agg(F.count(F.lit(1)).alias("n_returned_lines"))
               .withColumnRenamed("o_custkey", "r_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey"))
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(spend, c.c_custkey == spend.o_custkey)
            .join(returns, c.c_custkey == returns.r_custkey, "left")
            .select("c_custkey", "c_mktsegment", "n_name",
                    "total_spend", "n_orders",
                    F.coalesce("n_returned_lines", F.lit(0)).alias("n_returned_lines"),
                    F.row_number().over(w).alias("segment_rank")))


@register(
    "scalar_conditional_bucketing",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           IF(o_orderpriority IN ('1-URGENT', '2-HIGH'), 1, 0) AS is_urgent
    FROM orders
    """,
    doc="CASE/COALESCE/NULLIF/IF/IN conditional family.")
def scalar_conditional_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
         .when(F.col("o_totalprice") < 150000, "medium")
         .otherwise("large").alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING"))
         .alias("status_norm"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
         .otherwise(0).alias("is_urgent"),
    )


@register(
    "agg_ordered_collect",
    """
    SELECT n.n_name,
           array_to_string(list_sort(list(s.s_name)), '|') AS suppliers,
           COUNT(*) AS n_supp
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Ordered string aggregation: collect_list is order-nondeterministic "
        "in a distributed engine, so sort the array before joining — the "
        "portable deterministic form.")
def agg_ordered_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), "|")
            .alias("suppliers"),
            F.count(F.lit(1)).alias("n_supp"),
        )
    )


@register(
    "window_ntile_ranks",
    """
    SELECT c_custkey,
           NTILE(4)       OVER (ORDER BY c_acctbal DESC, c_custkey) AS wealth_quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER (ORDER BY c_acctbal, c_custkey), 6) AS cume
    FROM customer
    """,
    doc="Distribution window functions: ntile / percent_rank / cume_dist "
        "with unique-key tiebreaks for determinism.")
def window_ntile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    desc = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    asc = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.ntile(4).over(desc).alias("wealth_quartile"),
        F.round(F.percent_rank().over(asc), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(asc), 6).alias("cume"),
    )


@register(
    "scalar_math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), 4)                    AS disc_dev,
           ROUND(SQRT(l_extendedprice), 4)                     AS price_sqrt,
           ROUND(LN(l_extendedprice + 1.0), 4)                 AS price_ln,
           ROUND(POWER(l_quantity, 2), 2)                      AS qty_sq,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT)       AS price_kband,
           CAST(CEIL(l_quantity / 10.0) AS BIGINT)             AS qty_decile,
           MOD(CAST(l_orderkey AS BIGINT), 7)                  AS key_mod
    FROM lineitem
    WHERE l_linenumber = 1
    """,
    doc="Math scalar family: abs/sqrt/ln/power/floor/ceil/mod — codegen'd "
        "JVM expressions; rounded for cross-engine libm drift.")
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 4).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_kband"),
        F.ceil(F.col("l_quantity") / 10.0).cast("bigint").alias("qty_decile"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "hof_embedding_norms",
    """
    SELECT vec_id, label,
           LEN(embedding) AS dim,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
           ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4)  AS max_val
    FROM embeddings
    """,
    doc="Higher-order array functions (transform + aggregate/fold + max) over "
        "the FLOAT[64] embedding column — per-row, no shuffle; both engines "
        "fold the list in order so doubles match exactly.")
def hof_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id", "label",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(as_double, F.lit(0.0),
                        lambda acc, x: acc + x * x), 4).alias("sq_norm"),
        F.round(F.array_max(as_double), 4).alias("max_val"),
    )


@register(
    "agg_statistical_moments",
    """
    WITH mu AS (
      SELECT l_returnflag, AVG(CAST(l_quantity AS DOUBLE)) AS m
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6)            AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 6)               AS var_qty,
           ROUND(AVG(POWER(l_quantity - mu.m, 3))
                 / POWER(AVG(POWER(l_quantity - mu.m, 2)), 1.5), 4) AS skew_qty,
           ROUND(AVG(POWER(l_quantity - mu.m, 4))
                 / POWER(AVG(POWER(l_quantity - mu.m, 2)), 2) - 3, 4) AS kurt_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 6)  AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS covar_qty_disc
    FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
    GROUP BY l.l_returnflag
    """,
    doc="Statistical-moment aggregates (stddev/variance/skewness/kurtosis/"
        "corr/covar): single-pass distributed moment accumulation with "
        "map-side partials — the profiling pass a data pipeline runs before "
        "normalization. Spark's skewness()/kurtosis() are POPULATION "
        "statistics (g1 = m3/m2^1.5, excess g2 = m4/m2^2 - 3); DuckDB's "
        "builtins are bias-corrected SAMPLE statistics, so the oracle "
        "computes the population forms explicitly from two-pass central "
        "moments — exact agreement by construction, not hidden by a large "
        "per-group n under 4dp rounding (the ~3/n correction would flip "
        "the 4th decimal on small/sparse groups).")
def agg_statistical_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
                 F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
                 F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
                 F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
                 F.round(F.corr("l_quantity", "l_extendedprice"), 6)
                 .alias("corr_qty_price"),
                 F.round(F.covar_samp("l_quantity", "l_discount"), 6)
                 .alias("covar_qty_disc")))


@register(
    "agg_argmin_argmax",
    """
    SELECT o_orderpriority,
           ARG_MAX(o_orderkey, printf('%020.4f|%020d', o_totalprice, o_orderkey))
             AS biggest_order,
           ARG_MIN(o_orderkey, printf('%020.4f|%020d', o_totalprice, o_orderkey))
             AS smallest_order,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(MIN(o_totalprice), 2) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="argmin/argmax aggregates (min_by/max_by): the key of the extreme "
        "row without a join-back or window — one hash-agg pass carrying "
        "(value, key) partials. The ordering value is a fixed-width "
        "printf composite (price|orderkey), a total order, so duplicated "
        "prices (one exists in the data) can never make the argmax "
        "engine-dependent.")
def agg_argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    okey = F.format_string("%020.4f|%020d", F.col("o_totalprice"),
                           F.col("o_orderkey"))
    return (o.groupBy("o_orderpriority")
            .agg(F.max_by("o_orderkey", okey).alias("biggest_order"),
                 F.min_by("o_orderkey", okey).alias("smallest_order"),
                 F.round(F.max("o_totalprice"), 2).alias("max_price"),
                 F.round(F.min("o_totalprice"), 2).alias("min_price")))


@register(
    "null_semantics_battery",
    """
    WITH flagged AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS status,
             o_totalprice
      FROM orders WHERE o_orderkey % 100 < 3),
    ref AS (
      SELECT DISTINCT CASE WHEN o_orderkey % 14 = 0 THEN NULL
                           ELSE o_orderstatus END AS status
      FROM orders WHERE o_orderkey % 100 < 3)
    SELECT f.status, COUNT(*) AS n,
           CAST(SUM(CASE WHEN f.status IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
    FROM flagged f JOIN ref r ON f.status IS NOT DISTINCT FROM r.status
    GROUP BY f.status
    ORDER BY f.status NULLS FIRST
    """,
    doc="Null-semantics battery: null-injected keys, a null-safe equi-join "
        "(Spark <=> / eqNullSafe = SQL IS NOT DISTINCT FROM, so NULL keys "
        "MATCH each other — the F1 CDC filter's comparison semantics "
        "exercised as a join), aggregation over a nullable group key, and "
        "explicit NULLS FIRST ordering (Spark's default for ASC; stated "
        "explicitly so the oracle can't differ).")
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 < 3)
    flagged = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
         .otherwise(F.col("o_orderstatus")).alias("status"),
        "o_totalprice")
    ref = (o.select(
        F.when(F.col("o_orderkey") % 14 == 0, F.lit(None))
         .otherwise(F.col("o_orderstatus")).alias("status"))
        .distinct()
        .select(F.col("status").alias("r_status")))
    return (flagged.join(ref, flagged.status.eqNullSafe(F.col("r_status")))
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("status").isNull(), 1).otherwise(0))
                 .cast("long").alias("n_null"))
            .orderBy(F.col("status").asc_nulls_first()))


@register(
    "agg_rollup_grouping_markers",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, returnflag, linestatus
    """,
    doc="GROUPING() markers on a rollup: distinguishes a real NULL group "
        "key from a subtotal row (the marker is 1 on aggregated-away "
        "columns) — the standard way to label subtotal/grand-total rows "
        "without ambiguity. Same single hash-agg pass as plain rollup.")
def agg_rollup_grouping_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.grouping("l_returnflag").cast("long").alias("g_flag"),
                 F.grouping("l_linestatus").cast("long").alias("g_status"))
            .select(F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
                    "g_flag", "g_status", "n")
            .orderBy("g_flag", "g_status", "returnflag", "linestatus"))


@register(
    "crossjoin_coverage_grid",
    """
    SELECT r_name, status,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_orders
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    LEFT JOIN (
      SELECT n_regionkey, o_orderstatus, COUNT(*) AS n
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_regionkey, o_orderstatus) agg
      ON agg.n_regionkey = (SELECT r2.r_regionkey FROM region r2
                            WHERE r2.r_name = region.r_name)
     AND agg.o_orderstatus = s.status
    ORDER BY r_name, status
    """,
    doc="Explicit CROSS JOIN building the full (region x status) coverage "
        "grid, then a left join fills counts with 0 for empty cells — the "
        "dense-report shape where absent combinations must still appear. "
        "Both cross-join sides are tiny dims (BroadcastNestedLoopJoin); "
        "the count aggregation reduces the fact side before joining.")
def crossjoin_coverage_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    statuses = o.select(F.col("o_orderstatus").alias("status")).distinct()
    grid = r.select("r_name", "r_regionkey").crossJoin(statuses)
    agg = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
           .groupBy("n_regionkey", "o_orderstatus")
           .agg(F.count(F.lit(1)).alias("n")))
    return (grid.join(agg, (grid.r_regionkey == agg.n_regionkey)
                      & (grid.status == agg.o_orderstatus), "left_outer")
            .select("r_name", "status",
                    F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"))
            .orderBy("r_name", "status"))


@register(
    "agg_decimal_exact_money",
    """
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2)))
                     AS DECIMAL(38, 2)) AS VARCHAR) AS gross,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18, 2))
                              * (1 - CAST(l_discount AS DECIMAL(18, 4)))
                              AS DECIMAL(28, 6))) AS DECIMAL(38, 6))
                AS VARCHAR) AS net
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact DECIMAL money aggregation: prices fixed to DECIMAL(18,2), "
        "discounts to DECIMAL(18,4), products carried at DECIMAL(28,6) — "
        "no floating point anywhere, so the sums are exact by type system "
        "rather than by rounding-grid tricks (the q1 approach). Both "
        "engines promote to a shared output scale for the value hash. "
        "Map-side partial aggregation applies to decimal sums exactly as "
        "to longs. Outputs compare as scale-preserving strings because "
        "pandas conversion would degrade DECIMAL to float64 and destroy "
        "the exactness being demonstrated.")
def agg_decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (li.groupBy("l_returnflag")
            .agg(F.sum(price).cast("decimal(38,2)").cast("string")
                 .alias("gross"),
                 F.sum((price * (F.lit(1) - disc)).cast("decimal(28,6)"))
                 .cast("decimal(38,6)").cast("string").alias("net")))


@register(
    "setops_except_all",
    """
    SELECT o_orderpriority FROM orders WHERE YEAR(o_orderdate) = 1997
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE YEAR(o_orderdate) = 1998
    """,
    doc="Duplicate-preserving EXCEPT ALL (bag difference): per priority, "
        "max(0, count_1997 - count_1998) copies survive — the counted-"
        "aggregation compilation, completing the set-op family beside "
        "INTERSECT ALL.")
def setops_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_orderpriority")
    y98 = o.filter(F.year("o_orderdate") == 1998).select("o_orderpriority")
    return y97.exceptAll(y98)


# --- co-occurrence affinity mining ----------------------------------------

@register(
    "orders_brand_affinity",
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand AS brand
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    okb AS (SELECT l_orderkey FROM ob GROUP BY l_orderkey
            HAVING COUNT(*) <= 64),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_ab
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
      JOIN okb ON a.l_orderkey = okb.l_orderkey
      GROUP BY 1, 2),
    sizes AS (SELECT brand, COUNT(*) AS n FROM ob GROUP BY brand)
    SELECT brand_a, brand_b, n_ab, x.n AS n_a, y.n AS n_b,
           ROUND(n_ab * 1.0 / t.n_orders, 4) AS support,
           ROUND(n_ab * 1.0 * t.n_orders / (x.n * 1.0 * y.n), 4) AS lift
    FROM pairs JOIN sizes x ON brand_a = x.brand
               JOIN sizes y ON brand_b = y.brand
    CROSS JOIN tot t
    """,
    doc="Market-basket pair affinity: for every pair of part brands "
        "co-occurring in an order, co-occurrence count, support, and "
        "lift (observed co-rate over the independence expectation) — "
        "the classic frequent-pair mining report. Scale shape: the "
        "basket explode is bucket_pairs on the order key, so per-order "
        "fan-out is bounded by the basket's distinct-brand count "
        "(baskets are small by nature; a degenerate mega-basket is "
        "capped at 64, oracle-mirrored) and the pair aggregate collapses to at most "
        "|brands|^2 rows; brand marginals broadcast into the lift "
        "join. Counts exact; support/lift products are computed as "
        "DOUBLES (counts widened before multiplying — exact under "
        "2^53, no int64 wrap when n_a*n_b crosses 9.2e18 at 100 TB "
        "order counts), divided once, 4-dp rounded.")
def orders_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import bucket_pairs

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (li.join(F.broadcast(part),
                  li.l_partkey == part.p_partkey)
          .select("l_orderkey", F.col("p_brand").alias("brand"))
          .distinct())
    # basket cap: a TPC-H order holds <= 7 lineitems; 64 is pure backstop
    # against a degenerate mega-basket in foreign data (a basket with
    # thousands of distinct items yields quadratic pairs and no per-pair
    # signal — same contract as every bucket_pairs call site)
    pairs = (bucket_pairs(ob, ["l_orderkey"], F.col("brand"), max_bucket=64)
             .groupBy("a", "b").agg(F.count("*").alias("n_ab")))
    # identical aliased subplan on both marginal joins -> ReuseExchange
    # builds the brand-marginal table once instead of re-running the
    # basket pipeline per side; the n_orders scalar scans the single
    # pruned l_orderkey column
    sizes = ob.groupBy("brand").agg(F.count("*").alias("n"))
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    tot = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    return (pairs
            .join(F.broadcast(sa), F.col("a") == F.col("sa.brand"))
            .join(F.broadcast(sb), F.col("b") == F.col("sb.brand"))
            .crossJoin(F.broadcast(tot))
            .select(F.col("a").alias("brand_a"), F.col("b").alias("brand_b"),
                    "n_ab",
                    F.col("sa.n").alias("n_a"), F.col("sb.n").alias("n_b"),
                    F.round(F.col("n_ab") * F.lit(1.0) / F.col("n_orders"), 4)
                    .alias("support"),
                    F.round(F.col("n_ab") * F.lit(1.0)
                            * F.col("n_orders")
                            / (F.col("sa.n") * F.lit(1.0)
                               * F.col("sb.n")), 4)
                    .alias("lift")))
