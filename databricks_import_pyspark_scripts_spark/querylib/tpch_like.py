"""TPC-H-style battery adapted to the testdata schema (TESTDATA.md): the
classic analytic shapes a reference user would run through the delegated SQL
surface (Q1/Q3/Q5 live in relational.py). Each is plan-reviewed: predicates
pushed, dims broadcast, one wide shuffle per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-agg, every predicate pushed to "
        "parquet (range + between + comparison), no shuffle beyond the "
        "single-row final agg.")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_lines")))


@register(
    "q4_priority_with_late_lines",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (commit<receipt adapted to shipped-after-ordered): "
        "correlated EXISTS -> left-semi join, then tiny agg.")
def q4_priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(li, (o.o_orderkey == li.l_orderkey)
                  & (li.l_shipdate > o.o_orderdate), "left_semi")
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q14_promo_revenue_share",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    doc="TPC-H Q14 shape: conditional aggregation ratio over a broadcast "
        "dim join.")
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg(F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                              .otherwise(0.0)) / F.sum(rev), 4)
                .alias("promo_pct")))


@register(
    "q18_large_volume_orders",
    """
    SELECT c_name, o_orderkey, ROUND(o_totalprice, 2) AS totalprice,
           ROUND(total_qty, 2) AS total_qty
    FROM (SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 150.005) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: HAVING over a big agg (off-grid threshold so an "
        "exactly-150.00 sum can't flip across engines), join back to orders + "
        "customer, deterministic top-20. The agg reduces BEFORE the joins, "
        "so joins see |big orders|, not |lineitem|.")
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("total_qty"))
           .filter(F.col("total_qty") > 150.005))
    return (big.join(o, big.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select("c_name", "o_orderkey",
                    F.round("o_totalprice", 2).alias("totalprice"),
                    F.round("total_qty", 2).alias("total_qty"))
            .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
            .limit(20))


@register(
    "q19_disjunctive_predicates",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
       OR (p_type  = 'ECONOMY'  AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-column predicates across both "
        "join sides — Catalyst still pushes the common join key and prunes "
        "columns; the OR tree evaluates post-join in one codegen stage.")
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 30)
           & (F.col("l_quantity") >= 20))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(20, 50)
           & (F.col("l_quantity") >= 30)))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .filter(cond)
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "q22_idle_rich_customers",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: uncorrelated scalar subquery (broadcast single "
        "row) + anti join (no-urgent-orders customers) + agg.")
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql("""
        SELECT c_mktsegment,
               COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
    """)


@register(
    "q7_nation_trade_flows",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           YEAR(l_shipdate) AS ship_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name AND YEAR(l_shipdate) >= 2000
    GROUP BY cn.n_name, sn.n_name, YEAR(l_shipdate)
    """,
    doc="TPC-H Q7 shape: cross-nation trade flows — same dim table joined "
        "twice under different roles (alias discipline), year extraction in "
        "both grouping and predicate.")
def q7_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") >= 2000)
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == cn.cn_key)
        .join(F.broadcast(sn), s.s_nationkey == sn.sn_key)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation",
                 F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue")))


@register(
    "q10_returned_value_customers",
    """
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS lost_revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top customers by returned-item revenue — join + "
        "agg + deterministic top-20 via TakeOrdered.")
def q10_returned_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("lost_revenue"))
        .select("c_custkey", "c_name", "lost_revenue", "n_name")
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20))


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: max-of-aggregate via scalar subquery over a CTE "
        "(the view-based original); the single-row max broadcasts.")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import register_views

    register_views(spark, sf_dir, ("lineitem", "supplier"))
    return spark.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """)


@register(
    "q2_min_cost_supplier",
    """
    SELECT s_name, n_name, s_acctbal, s_suppkey
    FROM (SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                    ORDER BY s_acctbal DESC, s_suppkey) AS rn
          FROM supplier) ranked
    JOIN nation ON s_nationkey = n_nationkey
    WHERE rn = 1
    """,
    doc="TPC-H Q2 shape (min-per-group + join back): window rank instead of "
        "a correlated MIN subquery — one shuffle, no re-scan of the group.")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey"))
    ranked = (s.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1))
    return (ranked.join(F.broadcast(n), ranked.s_nationkey == n.n_nationkey)
            .select("s_name", "n_name", "s_acctbal", "s_suppkey"))


@register(
    "q8_national_market_share",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (SELECT YEAR(o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 sn.n_name AS supp_nation
          FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region   ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
          WHERE r_name = 'ASIA') all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — conditional-sum ratio over "
        "a 6-way join with the nation dim in two roles and a region filter "
        "that prunes the customer side before the fact join. All dims "
        "broadcast; the only wide shuffle is the final year agg.")
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0))
            / F.sum(vol), 6).alias("mkt_share")))


@register(
    "q9_product_type_profit",
    """
    SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - 0.4 * p_retailprice * l_quantity), 4) AS sum_profit
    FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, YEAR(o_orderdate)
    """,
    doc="TPC-H Q9 shape (profit by nation x year; the testdata has no "
        "partsupp, so supply cost is modeled as 0.4 x p_retailprice — same "
        "plan shape: LIKE-filtered part dim, 5-way join, two-key agg). The "
        "LIKE filter prunes part BEFORE the broadcast, so the fact join "
        "probes a small hash table.")
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.4 * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("sum_profit")))


@register(
    "q12_late_lines_by_priority",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape (shipmode -> linestatus; receipt/commit lag -> "
        "shipped >30 days after order): join with an inter-column date "
        "predicate + dual conditional counts. The shipdate range pushes to "
        "the lineitem scan; the +INTERVAL comparison evaluates post-join in "
        "the same codegen stage.")
def q12_late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count")))


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: order-count histogram — left outer join with an "
        "extra join-side predicate (customers with no qualifying orders "
        "count 0), two stacked aggregations. COUNT(o_orderkey) counts "
        "non-null keys only, preserving the outer-join zero bucket.")
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@register(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average "
        "quantity) gating a revenue sum. Catalyst de-correlates to an "
        "aggregate-then-join: one pass computes per-part averages, the "
        "broadcast-joined comparison filters the brand's lines — no "
        "per-row re-scan.")
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import register_views

    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql("""
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """)


@register(
    "q20_excess_shipment_suppliers",
    """
    SELECT s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 100)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape: nested IN subqueries (part-name prefix -> "
        "qualifying lines -> HAVING threshold on summed quantity -> "
        "supplier semi-join). Both INs become semi-joins; the inner part "
        "filter broadcasts, the grouped HAVING reduces before the outer "
        "semi-join.")
def q20_excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100))
    return (s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
            .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
            .orderBy("s_name"))


@register(
    "q21_waiting_suppliers",
    """
    WITH lines AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F')
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier JOIN lines l1 ON s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM lines l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lines l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (receipt>commit lateness adapted to shipped >90 "
        "days after order): the sole-blame-supplier pattern — a semi-join "
        "(other suppliers exist on the order) AND an anti-join (none of "
        "them were late) against the same derived line set, then top-20. "
        "Spark plans the EXISTS/NOT EXISTS pair as left-semi + left-anti "
        "on the orderkey with no correlated re-execution.")
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import register_views

    register_views(spark, sf_dir, ("lineitem", "orders", "supplier"))
    return spark.sql("""
        WITH lines AS (
          SELECT l_orderkey, l_suppkey,
                 CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F')
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier JOIN lines l1 ON s_suppkey = l1.l_suppkey
        WHERE l1.late = 1
          AND EXISTS (SELECT 1 FROM lines l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lines l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late = 1)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """)
