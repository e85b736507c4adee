"""CDC-semantics queries: the reference's F1 truth table exercised as
oracle-checked queries (SURVEY.md §2c).

A change feed is synthesized deterministically from the ``events`` table
(``event_id % 5`` picks the ``_change_type``, including NULL), then
``operators.cdc.filter_data`` — the real production operator — is applied.
The oracle re-states the truth table as plain SQL, so a semantic drift in the
operator (e.g. losing the null-safe comparison) breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import filter_data
from ..sources.registry import load_table
from . import register

# event_id % 5 -> change type; slot 4 stays NULL (snapshot row inside a CDF read)
_CHANGE_TYPE_SQL_CASE = """
    CASE event_id % 5
        WHEN 0 THEN 'insert'
        WHEN 1 THEN 'update_preimage'
        WHEN 2 THEN 'update_postimage'
        WHEN 3 THEN 'delete'
        ELSE NULL
    END"""


def _synthetic_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ct = (F.when(F.col("event_id") % 5 == 0, "insert")
          .when(F.col("event_id") % 5 == 1, "update_preimage")
          .when(F.col("event_id") % 5 == 2, "update_postimage")
          .when(F.col("event_id") % 5 == 3, "delete")
          .otherwise(F.lit(None).cast("string")))
    return (e.withColumn("_change_type", ct)
            .withColumn("_commit_version", (F.col("event_id") % 7).cast("long"))
            .withColumn("_commit_timestamp", F.col("ts")))


@register(
    "cdc_filter_event",
    f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ({_CHANGE_TYPE_SQL_CASE}) IS NULL
       OR ({_CHANGE_TYPE_SQL_CASE}) = 'insert'
    """,
    doc="EVENT data-type CDC filter: keep NULL + 'insert' only; CDC meta "
        "columns dropped afterwards.")
def cdc_filter_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = _synthetic_change_feed(spark, sf_dir)
    return filter_data(feed, "EVENT").select("event_id", "user_id", "event_type")


@register(
    "cdc_filter_property",
    f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ({_CHANGE_TYPE_SQL_CASE}) IS NULL
       OR ({_CHANGE_TYPE_SQL_CASE}) IN ('insert', 'update_postimage')
    """,
    doc="USER_PROPERTY CDC filter: NULL + insert + update_postimage pass "
        "(upsert semantics).")
def cdc_filter_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = _synthetic_change_feed(spark, sf_dir)
    return filter_data(feed, "USER_PROPERTY").select("event_id", "user_id", "event_type")


@register(
    "flagship_event_shaping",
    """
    SELECT epoch_ms(ts)                                   AS time,
           user_id,
           event_type,
           value                                          AS prop_value,
           CAST(props->>'$.k' AS BIGINT)                  AS prop_k,
           'group_B'                                      AS group_a_member
    FROM events
    """,
    doc="The reference's canary transformation (event shaping: epoch millis, "
        "property extraction, group-membership literals — "
        "/root/reference/unload_databricks_data_to_s3.py:411) flattened for "
        "the value gate; the struct-shaped original runs in entry().")
def flagship_event_shaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.unix_millis(F.col("ts")).alias("time"),
        "user_id",
        "event_type",
        F.col("value").alias("prop_value"),
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.lit("group_B").alias("group_a_member"),
    )


@register(
    "void_scrub_projection",
    """
    SELECT event_id, value AS v, event_type
    FROM events
    """,
    doc="VOID/NullType scrub (reference P1/P2) in the correctness gate: a "
        "VOID column and a struct with a VOID member are synthesized, "
        "drop_void_fields removes them, and the surviving nested value is "
        "projected out. A semantic drift in the scrub breaks schema or "
        "values here.")
def void_scrub_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.void_scrub import drop_void_fields

    e = load_table(spark, sf_dir, "events")
    dirty = (e.withColumn("ghost", F.lit(None))
             .withColumn("payload", F.struct(
                 F.col("value").alias("v"),
                 F.lit(None).alias("dead"),
             )))
    clean = drop_void_fields(dirty)
    assert "ghost" not in clean.columns
    return clean.select("event_id", F.col("payload.v").alias("v"), "event_type")


@register(
    "cdc_mutability_passthrough",
    """
    SELECT event_id, user_id, event_type
    FROM events
    """,
    doc="Mutability-mode bypass (reference --ingestion_in_mutability_mode): "
        "every change row flows through, meta columns still dropped.")
def cdc_mutability_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = _synthetic_change_feed(spark, sf_dir)
    return (filter_data(feed, "EVENT", mutability_mode=True)
            .select("event_id", "user_id", "event_type"))


@register(
    "cdc_merge_upsert",
    """
    WITH target AS (
      SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
      FROM orders WHERE o_orderkey % 3 <> 0
    ), source AS (
      SELECT o_orderkey, o_custkey, ROUND(o_totalprice * 2, 2) AS price
      FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT t.o_orderkey, t.o_custkey, t.price
    FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM source s
                      WHERE s.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT o_orderkey, o_custkey, price FROM source
    """,
    doc="MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT "
        "without Delta (operators.merge.merge_upsert): target rows whose "
        "key has a source row are replaced, the rest kept, new keys "
        "appended — one anti join + union. At 100 TB the source side is a "
        "version's delta and broadcasts; the target never shuffles more "
        "than its key column requires. Oracle restates the merge as "
        "NOT EXISTS + UNION ALL.")
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_upsert

    o = load_table(spark, sf_dir, "orders")
    target = (o.filter(F.col("o_orderkey") % 3 != 0)
              .select("o_orderkey", "o_custkey",
                      F.round("o_totalprice", 2).alias("price")))
    source = (o.filter(F.col("o_orderkey") % 5 == 0)
              .select("o_orderkey", "o_custkey",
                      F.round(F.col("o_totalprice") * 2, 2).alias("price")))
    return merge_upsert(target, source, ["o_orderkey"])


@register(
    "cdc_apply_changes",
    """
    WITH kept AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 11 = 0
                  THEN ROUND(o_totalprice + 1000, 2)
                  ELSE ROUND(o_totalprice, 2) END AS price
      FROM orders
      WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0)
    ), ins AS (
      SELECT o_orderkey + 10000000 AS k, 1.0 AS price
      FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT k, price FROM kept
    UNION ALL
    SELECT k, price FROM ins
    """,
    doc="CDF batch application (operators.merge.apply_changes — the inverse "
        "of derive_changes): deletes remove their key, postimages/inserts "
        "upsert, and a key carrying BOTH a delete and a postimage in the "
        "same commit (keys divisible by 77 here) resolves by change-type "
        "precedence to 'row exists' — the transaction's net effect, "
        "exercised deliberately so the tie branch is gate-checked, not just "
        "unit-tested. Oracle computes the net final snapshot directly.")
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import apply_changes

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price"))
    deletes = (o.filter(F.col("k") % 7 == 0)
               .withColumn("_change_type", F.lit("delete")))
    posts = (o.filter(F.col("k") % 11 == 0)
             .select("k", (F.col("price") + 1000).alias("price"))
             .withColumn("_change_type", F.lit("update_postimage")))
    ins = (o.filter(F.col("k") % 13 == 0)
           .select((F.col("k") + 10_000_000).alias("k"),
                   F.lit(1.0).alias("price"))
           .withColumn("_change_type", F.lit("insert")))
    changes = (deletes.unionByName(posts).unionByName(ins)
               .withColumn("_commit_version", F.lit(2).cast("long"))
               .withColumn("_commit_timestamp",
                           F.lit("2024-01-01 00:00:00").cast("timestamp")))
    out = apply_changes(o, changes, ["k"])
    return out.select("k", F.round("price", 2).alias("price"))


@register(
    "mv_incremental_maintenance",
    """
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS total
    FROM events WHERE event_id % 20 <> 5
    GROUP BY 1, 2
    """,
    doc="Incremental materialized-view maintenance: a (type, day) "
        "count/sum view built over the base partition (event_id % 10 <> 0) "
        "is updated by applying an insert delta (% 10 = 0) and a delete "
        "delta (% 20 = 5) through operators/merge.py:maintain_agg — one "
        "outer join on the view key, NO base rescan. The oracle states the "
        "equivalent full recompute (all events except the deleted slice), "
        "so the gate proves incremental == recompute. Values on the exact "
        "integer cents grid; zero-count groups drop per view semantics.")
def mv_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import maintain_agg

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("ts").cast("date").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("val"))
    base = ev.filter(F.col("event_id") % 10 != 0)
    mv_old = base.groupBy("event_type", "day").agg(
        F.count("*").alias("cnt"), F.sum("val").alias("total"))
    delta = (ev.filter(F.col("event_id") % 10 == 0)
             .withColumn("_op", F.lit("I"))
             .unionByName(base.filter(F.col("event_id") % 20 == 5)
                          .withColumn("_op", F.lit("D"))))
    return maintain_agg(mv_old, delta, ["event_type", "day"])


_COMPACT_FEED_SQL = """
      SELECT o_orderkey AS k, ROUND(o_totalprice, 2) AS price,
             'update_preimage' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, ROUND(o_totalprice, 2) + 1, 'update_postimage', 1
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, ROUND(o_totalprice, 2) + 1, 'delete', 2
      FROM orders WHERE o_orderkey % 6 = 0
      UNION ALL
      SELECT o_orderkey + 20000000, 1.0, 'insert', 2
      FROM orders WHERE o_orderkey % 5 = 1
      UNION ALL
      SELECT o_orderkey + 20000000, 1.0, 'delete', 3
      FROM orders WHERE o_orderkey % 10 = 1
      UNION ALL
      SELECT o_orderkey, ROUND(o_totalprice, 2) + 2, 'update_postimage', 3
      FROM orders WHERE o_orderkey % 9 = 0 AND o_orderkey % 6 <> 0
                    AND o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey, ROUND(o_totalprice, 2), 'delete', 3
      FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 6 <> 0
      UNION ALL
      SELECT o_orderkey, ROUND(o_totalprice, 2) + 3, 'update_postimage', 3
      FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 6 <> 0
"""


@register(
    "cdc_compact_changelog",
    f"""
    WITH feed AS ({_COMPACT_FEED_SQL}),
    r AS (
      SELECT *, _commit_version * 4 + CASE _change_type
               WHEN 'update_preimage' THEN 0
               WHEN 'delete' THEN 1
               WHEN 'update_postimage' THEN 2
               ELSE 3 END AS rk
      FROM feed),
    f AS (SELECT k, _change_type AS first_type FROM (
            SELECT k, _change_type,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY rk) AS rn
            FROM r) WHERE rn = 1),
    u AS (SELECT k, price AS up_price, rk AS up_rk FROM (
            SELECT k, price, rk,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY rk DESC) AS rn
            FROM r WHERE _change_type IN ('insert', 'update_postimage'))
          WHERE rn = 1),
    d AS (SELECT k, price AS del_price, rk AS del_rk FROM (
            SELECT k, price, rk,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY rk DESC) AS rn
            FROM r WHERE _change_type = 'delete') WHERE rn = 1),
    m AS (SELECT k, MAX(_commit_version) AS _commit_version FROM r GROUP BY k)
    SELECT f.k,
           CASE WHEN COALESCE(u.up_rk, -1) > COALESCE(d.del_rk, -1)
                THEN (CASE WHEN f.first_type = 'insert'
                           THEN 'insert' ELSE 'update_postimage' END)
                ELSE 'delete' END AS _change_type,
           ROUND(CASE WHEN COALESCE(u.up_rk, -1) > COALESCE(d.del_rk, -1)
                      THEN u.up_price ELSE d.del_price END, 2) AS price,
           m._commit_version
    FROM f JOIN m ON f.k = m.k
    LEFT JOIN u ON f.k = u.k LEFT JOIN d ON f.k = d.k
    WHERE COALESCE(u.up_rk, -1) > COALESCE(d.del_rk, -1)
       OR (f.first_type <> 'insert'
           AND COALESCE(d.del_rk, -1) > COALESCE(u.up_rk, -1))
    """,
    doc="CDC changelog compaction (operators.merge.compact_changes): a "
        "3-commit churn feed over the orders keys — in-window "
        "insert+delete, insert+update, update chains, delete-only, and "
        "the same-commit delete+postimage tie — squashed to the net change "
        "per key. Contract (round-trip pytest): applying the compacted log "
        "equals applying the full log. One hash shuffle; min_by/max_by "
        "picks over an integer (commit, type-precedence) rank. Oracle "
        "restates the same picks as window functions over an identical "
        "feed CTE.")
def cdc_compact_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import compact_changes

    o = (load_table(spark, sf_dir, "orders")
         .select(F.col("o_orderkey").alias("k"),
                 F.round("o_totalprice", 2).alias("price")))
    t = F.lit("2024-01-01 00:00:00").cast("timestamp")

    def part(cond, price, ct, cv, shift=0):
        return (o.filter(cond)
                .select((F.col("k") + shift).alias("k"), price.alias("price"),
                        F.lit(ct).alias("_change_type"),
                        F.lit(cv).cast("long").alias("_commit_version"),
                        t.alias("_commit_timestamp")))

    k = F.col("k")
    p = F.col("price")
    feed = (
        part(k % 3 == 0, p, "update_preimage", 1)
        .unionByName(part(k % 3 == 0, p + 1, "update_postimage", 1))
        .unionByName(part(k % 6 == 0, p + 1, "delete", 2))
        .unionByName(part(k % 5 == 1, F.lit(1.0), "insert", 2,
                          shift=20_000_000))
        .unionByName(part(k % 10 == 1, F.lit(1.0), "delete", 3,
                          shift=20_000_000))
        .unionByName(part((k % 9 == 0) & (k % 6 != 0) & (k % 7 != 0),
                          p + 2, "update_postimage", 3))
        .unionByName(part((k % 7 == 0) & (k % 6 != 0), p, "delete", 3))
        .unionByName(part((k % 7 == 0) & (k % 6 != 0), p + 3,
                          "update_postimage", 3)))
    out = compact_changes(feed, ["k"])
    return out.select("k", "_change_type",
                      F.round("price", 2).alias("price"), "_commit_version")


@register(
    "cdc_derive_changes",
    """
    WITH old AS (
      SELECT o_orderkey AS k, ROUND(o_totalprice, 2) AS price
      FROM orders WHERE o_orderkey % 13 <> 0
    ), new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 11 = 0
                  THEN ROUND(o_totalprice + 500, 2)
                  ELSE ROUND(o_totalprice, 2) END AS price
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT n.k, n.price, 'insert' AS _change_type
    FROM new n LEFT JOIN old o ON n.k = o.k WHERE o.k IS NULL
    UNION ALL
    SELECT o.k, o.price, 'delete'
    FROM old o LEFT JOIN new n ON o.k = n.k WHERE n.k IS NULL
    UNION ALL
    SELECT o.k, o.price, 'update_preimage'
    FROM old o JOIN new n ON o.k = n.k WHERE o.price <> n.price
    UNION ALL
    SELECT n.k, n.price, 'update_postimage'
    FROM old o JOIN new n ON o.k = n.k WHERE o.price <> n.price
    """,
    doc="Relational snapshot diff (operators.cdc.derive_changes — what "
        "Delta computes from its transaction log, re-expressed as one "
        "full-outer join with null-safe struct value comparison): two "
        "deterministic orders-derived snapshots (keys dropped on each "
        "side, a third updated) diffed into insert/delete/update pre+post "
        "rows. One shuffle per side on the key; unchanged rows cost one "
        "codegen'd struct comparison and emit nothing. Oracle restates "
        "the diff as four join branches.")
def cdc_derive_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import derive_changes

    o = load_table(spark, sf_dir, "orders")
    old = (o.filter(F.col("o_orderkey") % 13 != 0)
           .select(F.col("o_orderkey").alias("k"),
                   F.round("o_totalprice", 2).alias("price")))
    new = (o.filter(F.col("o_orderkey") % 7 != 0)
           .select(F.col("o_orderkey").alias("k"),
                   F.when(F.col("o_orderkey") % 11 == 0,
                          F.round(F.col("o_totalprice") + 500, 2))
                   .otherwise(F.round("o_totalprice", 2)).alias("price")))
    return (derive_changes(old, new, ["k"], commit_version=2)
            .select("k", "price", "_change_type"))
