"""Product-analytics queries over ``events`` — the workload the reference's
exports actually feed (Amplitude-style event analytics): daily active users,
sequential funnels, cohort retention, per-user engagement.

All pure DataFrame compositions; shuffles only on user_id / date keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.registry import load_table
from . import register


@register(
    "events_daily_active_users",
    """
    SELECT CAST(ts AS DATE) AS day,
           COUNT(DISTINCT user_id) AS dau,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
    doc="DAU time series: distinct users + volume per day. Two-phase "
        "distinct agg; at scale pre-aggregate (day, user) first or use "
        "approx_count_distinct (see approx_sketches).")
def events_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.col("ts").cast("date").alias("day"))
            .agg(F.countDistinct("user_id").alias("dau"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value")))


@register(
    "events_funnel_signup_click_purchase",
    """
    WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts >= s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
           GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s1) AS step1_signup,
           (SELECT COUNT(*) FROM s2) AS step2_click,
           (SELECT COUNT(*) FROM s3) AS step3_purchase
    """,
    doc="Sequential funnel (signup -> click -> purchase, order-enforcing): "
        "each step is a conditional min-timestamp agg joined to the prior "
        "step — shuffles on user_id only, no window over full history.")
def events_funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    s1 = (e.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (e.filter(F.col("event_type") == "click").join(s1, "user_id")
          .filter(F.col("ts") >= F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (e.filter(F.col("event_type") == "purchase").join(s2, "user_id")
          .filter(F.col("ts") >= F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    counts = [df.agg(F.count(F.lit(1)).alias(name))
              for df, name in ((s1, "step1_signup"), (s2, "step2_click"),
                               (s3, "step3_purchase"))]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])


@register(
    "events_weekly_retention",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, week_offset
    """,
    doc="Cohort retention: users grouped by first-seen week, counted in each "
        "subsequent active week. Two aggregations + one join on user_id.")
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    first_seen = (e.groupBy("user_id")
                  .agg(F.min(week).alias("cohort_week")))
    activity = e.select("user_id", week.alias("active_week")).distinct()
    return (activity.join(first_seen, "user_id")
            .groupBy("cohort_week",
                     (F.datediff("active_week", "cohort_week") / 7)
                     .cast("bigint").alias("week_offset"))
            .agg(F.countDistinct("user_id").alias("active_users")))


@register(
    "events_user_engagement",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
             AS purchase_value,
           CAST(MIN(ts) AS DATE) AS first_day,
           CAST(MAX(ts) AS DATE) AS last_day
    FROM events
    GROUP BY user_id
    """,
    doc="Per-user engagement profile: the single-pass multi-aggregate shape "
        "(counts, distincts, conditional sums, extrema) every event "
        "warehouse runs; one shuffle on user_id.")
def events_user_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
        F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))
                      .otherwise(0.0)), 2).alias("purchase_value"),
        F.min("ts").cast("date").alias("first_day"),
        F.max("ts").cast("date").alias("last_day"),
    ))


@register(
    "events_tumbling_window_counts",
    """
    SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts))          AS window_start_ms,
           epoch_ms(time_bucket(INTERVAL '5 minutes', ts)) + 300000 AS window_end_ms,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Batch twin of streaming.pipeline.windowed_event_counts: the SAME "
        "tumbling-window aggregation (F.window + count/sum, watermark is a "
        "batch no-op) driven through the correctness gate against DuckDB "
        "time_bucket — attesting the window-boundary arithmetic the "
        "streaming tier relies on (both engines align 5-minute buckets "
        "identically: Spark's epoch origin and DuckDB's 2000-01-03 origin "
        "are both whole multiples of 300 s). Window bounds are emitted as "
        "epoch millis so the value hash is timezone-representation-proof.")
def events_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import windowed_event_counts

    e = load_table(spark, sf_dir, "events")
    w = windowed_event_counts(e)  # batch plan: watermark ignored, F.window real
    return w.select(
        F.unix_millis(F.col("window_start")).alias("window_start_ms"),
        F.unix_millis(F.col("window_end")).alias("window_end_ms"),
        "event_type", "n",
        F.round(F.col("total_value"), 4).alias("total_value"))


@register(
    "events_session_window_stats",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 300000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             -- same deterministic (ts, event_id) order as the marked window:
             -- ordering by ts alone leaves duplicate-(user_id, ts) tie order
             -- unspecified, so a session-start row could be framed AFTER its
             -- tied peers and misassign them to the previous session
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_seq
      FROM marked
    )
    SELECT user_id,
           epoch_ms(MIN(ts))          AS session_start_ms,
           epoch_ms(MAX(ts)) + 300000 AS session_end_ms,
           COUNT(*)                   AS n_events,
           ROUND(SUM(value), 4)       AS total_value
    FROM sess
    GROUP BY user_id, sess_seq
    """,
    doc="Batch twin of streaming.pipeline.sessionized_event_stats: the SAME "
        "F.session_window aggregation (watermark is a batch no-op) gated "
        "against a DuckDB gaps-and-islands oracle. Semantics pinned by the "
        "oracle: Spark merges per-event windows [ts, ts+gap) only when they "
        "OVERLAP, so a gap of exactly 300 s starts a NEW session — hence "
        "the oracle's >= (not >) on the lag difference; session_end is "
        "last-event ts + gap. Bounds emitted as epoch millis so the value "
        "hash is timezone-representation-proof.")
def events_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import sessionized_event_stats

    e = load_table(spark, sf_dir, "events")
    s = sessionized_event_stats(e)  # batch plan: watermark ignored
    return s.select(
        "user_id",
        F.unix_millis(F.col("session_start")).alias("session_start_ms"),
        F.unix_millis(F.col("session_end")).alias("session_end_ms"),
        "n_events",
        F.round(F.col("total_value"), 4).alias("total_value"))


@register(
    "events_sliding_window_counts",
    """
    SELECT epoch_ms(ws)          AS window_start_ms,
           epoch_ms(ws) + 600000 AS window_end_ms,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM (
      SELECT event_type, value,
             time_bucket(INTERVAL '5 minutes', ts)
               - k * INTERVAL '5 minutes' AS ws
      FROM events CROSS JOIN (VALUES (0), (1)) AS offs(k)
    )
    GROUP BY 1, 2, 3
    """,
    doc="Batch twin of the SLIDING window shape (F.window with width 10 min, "
        "slide 5 min — each event lands in exactly width/slide = 2 windows). "
        "The DuckDB oracle derives the same window set arithmetically: both "
        "engines align sliding starts to multiples of the slide from an "
        "origin that is itself a multiple of 5 min, so window k for an "
        "event is time_bucket(slide, ts) - k*slide. Completes the gated "
        "window-shape coverage: tumbling, session, sliding.")
def events_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import windowed_event_counts

    e = load_table(spark, sf_dir, "events")
    w = windowed_event_counts(e, window="10 minutes", slide="5 minutes")
    return w.select(
        F.unix_millis(F.col("window_start")).alias("window_start_ms"),
        F.unix_millis(F.col("window_end")).alias("window_end_ms"),
        "event_type", "n",
        F.round(F.col("total_value"), 4).alias("total_value"))


@register(
    "events_resample_forward_fill",
    """
    WITH obs AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), b AS (
      SELECT user_id, MIN(ts) AS lo, MAX(ts) AS hi FROM obs GROUP BY user_id
    ), g AS (
      SELECT user_id,
             unnest(generate_series(date_trunc('hour', lo), hi,
                                    INTERVAL 1 HOUR)) AS gts
      FROM b
    )
    SELECT g.user_id, epoch_ms(g.gts) AS grid_ms,
           ROUND(obs.value, 4) AS last_value
    FROM g ASOF LEFT JOIN obs
      ON g.user_id = obs.user_id AND g.gts >= obs.ts
    """,
    doc="Time-series resampling with forward fill: each user's purchase "
        "stream re-sampled onto an hourly grid (hour-truncated first event "
        "through last event), each grid point carrying the most recent "
        "observation at or before it — the gap-filling shape every metrics "
        "warehouse needs. Spark composition is the tagged-union as-of "
        "pattern (grid rows + observation rows, one user_id shuffle, "
        "ignore-nulls running last) — never a per-grid-point range join; "
        "grid points before the first observation stay NULL (ASOF LEFT). "
        "Ties at an exact grid==event timestamp take the event (>= "
        "semantics, observation sorts first). Oracle uses DuckDB's native "
        "generate_series + ASOF JOIN against the composition.")
def events_resample_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    obs = (e.filter(F.col("event_type") == "purchase")
           .select("user_id", "ts", "value"))
    bounds = obs.groupBy("user_id").agg(F.min("ts").alias("lo"),
                                        F.max("ts").alias("hi"))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence(F.date_trunc("hour", F.col("lo")),
                             F.col("hi"),
                             F.expr("INTERVAL 1 HOUR"))).alias("gts"))
    tagged = (obs.select("user_id", F.col("ts").alias("t"),
                         F.lit(0).alias("tag"), "value",
                         F.lit(None).cast("timestamp_ntz").alias("gts"))
              .unionByName(
                  grid.select("user_id", F.col("gts").alias("t"),
                              F.lit(1).alias("tag"),
                              F.lit(None).cast("double").alias("value"),
                              "gts")))
    w = (Window.partitionBy("user_id").orderBy("t", "tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (tagged
            .withColumn("last_value", F.last("value", ignorenulls=True).over(w))
            .filter(F.col("tag") == 1)
            .select("user_id", F.unix_millis(F.col("gts")).alias("grid_ms"),
                    F.round("last_value", 4).alias("last_value")))


@register(
    "events_scd2_user_value",
    """
    WITH changes AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           epoch_ms(ts) AS valid_from_ms,
           epoch_ms(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, value)) AS valid_to_ms,
           ROUND(value, 4) AS value,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, value) IS NULL AS is_current
    FROM changes
    """,
    doc="SCD2 (slowly-changing-dimension) interval build from a change "
        "stream: each user's purchase value becomes a versioned dimension "
        "row with [valid_from, valid_to) bounds and an is_current flag — "
        "the standard warehouse shape a CDC feed materializes into. One "
        "window over (user_id, ts); valid_to is the NEXT change's "
        "timestamp, open-ended (NULL) for the current row. Ties on ts "
        "break by value so both engines order identically.")
def events_scd2_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ch = (e.filter(F.col("event_type") == "purchase")
          .select("user_id", "ts", "value"))
    w = Window.partitionBy("user_id").orderBy("ts", "value")
    nxt = F.lead("ts").over(w)
    return ch.select(
        "user_id",
        F.unix_millis("ts").alias("valid_from_ms"),
        F.unix_millis(nxt).alias("valid_to_ms"),
        F.round("value", 4).alias("value"),
        nxt.isNull().alias("is_current"))


@register(
    "events_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2),
    t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM c
          GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.n,
           ROUND(c.n * 1.0 / t.n_from, 4) AS p
    FROM c JOIN t ON c.from_type = t.from_type
    """,
    doc="First-order Markov transition matrix over per-user event "
        "sequences: lead-window next-event per user (deterministic "
        "(ts, event_id) order), transition counts, and row-normalized "
        "probabilities — the user-path model behind next-action "
        "prediction and funnel discovery. One shuffle on user_id for the "
        "sequencing window, one aggregate on the (from, to) pair; the "
        "per-from totals join is a broadcast (|event types| rows).")
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type",
                    F.lead("event_type").over(w).alias("next_type"))
    c = (seq.filter(F.col("next_type").isNotNull())
         .groupBy(F.col("event_type").alias("from_type"),
                  F.col("next_type").alias("to_type"))
         .agg(F.count(F.lit(1)).alias("n")))
    t = c.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (c.join(F.broadcast(t), "from_type")
            .select("from_type", "to_type", "n",
                    F.round(F.col("n") * F.lit(1.0) / F.col("n_from"), 4)
                    .alias("p")))


@register(
    "events_trending_week_over_week",
    """
    WITH w AS (
      SELECT event_type,
             CAST(date_trunc('week', ts) AS DATE) AS week,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, week, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
      FROM w)
    SELECT CAST(week AS VARCHAR) AS week, event_type, n, prev_n,
           ROUND(n * 1.0 / prev_n, 4) AS wow_ratio
    FROM l
    WHERE prev_n IS NOT NULL
    """,
    doc="Week-over-week trend ratios per event type (ISO-Monday "
        "date_trunc in both engines): weekly counts, lag window, ratio — "
        "the movers report behind anomaly triage and launch monitoring. "
        "The aggregate collapses the corpus to |types| x |weeks| rows "
        "before any window runs; first weeks (no predecessor) are "
        "excluded rather than emitted with NULL ratios.")
def events_trending_week_over_week(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = (e.groupBy("event_type",
                   F.date_trunc("week", F.col("ts")).cast("date")
                   .alias("week"))
         .agg(F.count(F.lit(1)).alias("n")))
    lagw = Window.partitionBy("event_type").orderBy("week")
    return (w.withColumn("prev_n", F.lag("n").over(lagw))
            .filter(F.col("prev_n").isNotNull())
            .select(F.col("week").cast("string").alias("week"),
                    "event_type", "n", "prev_n",
                    F.round(F.col("n") * F.lit(1.0) / F.col("prev_n"), 4)
                    .alias("wow_ratio")))


@register(
    "events_conversion_latency",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id),
    lat AS (
      SELECT CAST(date_trunc('week', s.signup_ts) AS DATE) AS cohort_week,
             epoch_us(p.purchase_ts) - epoch_us(s.signup_ts) AS latency_us
      FROM s JOIN p ON s.user_id = p.user_id)
    SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(quantile_cont(latency_us, 0.50), 4) AS p50_us,
           ROUND(quantile_cont(latency_us, 0.90), 4) AS p90_us
    FROM lat GROUP BY cohort_week
    """,
    doc="Conversion-latency percentiles per signup cohort: first signup -> "
        "first SUBSEQUENT purchase per user, p50/p90 by ISO cohort week — "
        "the time-to-convert report behind funnel triage. Two per-user "
        "min-aggregates (map-side partial), one user-keyed join, then "
        "percentiles over the |users|-bounded latency set; the >= guard "
        "keeps pre-signup purchases (returning users) from producing "
        "negative latencies. Latencies are exact integer MICROseconds "
        "(unix_micros / epoch_us) — whole-second epoch functions truncate "
        "sub-second timestamps differently across engines, which the "
        "sf0.1 sweep caught.")
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    s = (e.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("signup_ts")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(s, "user_id")
         .filter(F.col("ts") >= F.col("signup_ts"))
         .groupBy("user_id").agg(F.min("ts").alias("purchase_ts")))
    lat = (s.join(p, "user_id")
           .select(F.date_trunc("week", "signup_ts").cast("date")
                   .alias("cohort_week"),
                   (F.unix_micros("purchase_ts")
                    - F.unix_micros("signup_ts")).alias("latency_us")))
    return (lat.groupBy("cohort_week")
            .agg(F.count(F.lit(1)).alias("n_converted"),
                 F.round(F.percentile("latency_us", F.lit(0.50)), 4)
                 .alias("p50_us"),
                 F.round(F.percentile("latency_us", F.lit(0.90)), 4)
                 .alias("p90_us"))
            .select(F.col("cohort_week").cast("string").alias("cohort_week"),
                    "n_converted", "p50_us", "p90_us"))


@register(
    "events_scd2_point_in_time_join",
    """
    WITH changes AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    dim AS (
      SELECT user_id,
             epoch_ms(ts) AS valid_from_ms,
             epoch_ms(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, value)) AS valid_to_ms,
             ROUND(value, 4) AS value
      FROM changes
    ),
    fact AS (
      SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
      FROM events WHERE event_type = 'click'
    )
    SELECT f.event_id, f.user_id, f.ts_ms,
           d.value AS dim_value_at_event
    FROM fact f JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts_ms >= d.valid_from_ms
     AND (d.valid_to_ms IS NULL OR f.ts_ms < d.valid_to_ms)
    """,
    doc="Point-in-time (SCD2) dimension lookup — the CONSUME half of the "
        "gated events_scd2_user_value build: each click event joins the "
        "dimension version that was valid at its timestamp "
        "([valid_from, valid_to) containment; intervals are disjoint by "
        "construction, so at most one row matches). The join is "
        "EQUI-keyed on user_id with the interval test as a residual "
        "filter — at 100 TB the shuffle is the user-key exchange, never "
        "an interval cross product; events before a user's first change "
        "drop out (inner), exactly the warehouse semantics.")
def events_scd2_point_in_time_join(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ch = (e.filter(F.col("event_type") == "purchase")
          .select("user_id", "ts", "value"))
    w = Window.partitionBy("user_id").orderBy("ts", "value")
    nxt = F.lead("ts").over(w)
    dim = ch.select(
        F.col("user_id").alias("d_user_id"),
        F.unix_millis("ts").alias("valid_from_ms"),
        F.unix_millis(nxt).alias("valid_to_ms"),
        F.round("value", 4).alias("value"))
    fact = (e.filter(F.col("event_type") == "click")
            .select("event_id", "user_id",
                    F.unix_millis("ts").alias("ts_ms")))
    cond = ((fact.user_id == dim.d_user_id)
            & (F.col("ts_ms") >= F.col("valid_from_ms"))
            & (F.col("valid_to_ms").isNull()
               | (F.col("ts_ms") < F.col("valid_to_ms"))))
    return (fact.join(dim, cond)
            .select("event_id", "user_id", "ts_ms",
                    F.col("value").alias("dim_value_at_event")))


# --- PSI distribution-drift monitor ---------------------------------------

# Population-stability-index report knobs. Fixed equi-width value grid
# (deterministic, engine-portable — no quantile estimation inside the
# monitored metric) and +1/+B Laplace smoothing so empty buckets keep
# ln() finite without epsilon magic numbers: p_i = (n_i + 1) / (N + B).
# Grid constants live in operators/drift.py (shared with the rollup
# primitives and the streaming monitor); re-exported here for the oracle
# f-strings and existing importers.
from ..operators.drift import PSI_BUCKETS, PSI_WIDTH  # noqa: E402

PSI_SPLIT_TS = "2024-01-16 00:00:00"  # reference period = events before


def _psi_oracle() -> str:
    return f"""
    WITH buckets AS (
      SELECT unnest(generate_series(0, {PSI_BUCKETS - 1})) AS bucket),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT event_type,
             LEAST(GREATEST(CAST(FLOOR(value / {PSI_WIDTH}) AS INT), 0),
                   {PSI_BUCKETS - 1}) AS bucket,
             SUM(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT_TS}'
                      THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN ts >= TIMESTAMP '{PSI_SPLIT_TS}'
                      THEN 1 ELSE 0 END) AS n_cur
      FROM events GROUP BY 1, 2),
    dense AS (
      SELECT t.event_type, b.bucket,
             COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
      FROM types t CROSS JOIN buckets b
      LEFT JOIN counts c ON c.event_type = t.event_type
                        AND c.bucket = b.bucket),
    tot AS (SELECT event_type, SUM(n_ref) AS tr, SUM(n_cur) AS tc
            FROM dense GROUP BY event_type)
    SELECT d.event_type,
           CAST(SUM(d.n_ref) AS BIGINT) AS n_ref_events,
           CAST(SUM(d.n_cur) AS BIGINT) AS n_cur_events,
           ROUND(SUM(
             ((d.n_ref + 1.0) / (t.tr + {PSI_BUCKETS})
              - (d.n_cur + 1.0) / (t.tc + {PSI_BUCKETS}))
             * LN(((d.n_ref + 1.0) / (t.tr + {PSI_BUCKETS}))
                  / ((d.n_cur + 1.0) / (t.tc + {PSI_BUCKETS})))), 4) AS psi
    FROM dense d JOIN tot t USING (event_type)
    GROUP BY d.event_type
    """


@register(
    "events_psi_drift",
    _psi_oracle(),
    doc="Population-stability-index drift monitor per event type: the "
        "value distribution of the current period vs the reference period "
        "over a fixed equi-width bucket grid, PSI = sum((p-q)*ln(p/q)) "
        "with +1 Laplace smoothing (finite on empty buckets, no epsilon). "
        "The standard pre-promotion drift gate for a continuously-"
        "ingested training corpus — PSI > 0.1/0.25 is the conventional "
        "investigate/block line. Scale shape: ONE corpus scan into a "
        "partial-aggregated (type, bucket) rollup (both periods counted "
        "conditionally in the same pass — never two scans); everything "
        "after runs on |types| x buckets rows. The bucket grid is FIXED, "
        "so the monitor needs no quantile pass over the corpus and two "
        "periods can be PSI-compared from their stored rollups alone.")
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import psi_from_biperiod_counts, value_bucket_col

    e = load_table(spark, sf_dir, "events")
    is_ref = F.col("ts") < F.lit(PSI_SPLIT_TS).cast("timestamp")
    bucket = value_bucket_col(F.col("value"), PSI_WIDTH, PSI_BUCKETS)
    counts = (e.groupBy(F.col("event_type"), bucket.alias("bucket"))
              .agg(F.sum(F.when(is_ref, 1).otherwise(0)).alias("n_ref"),
                   F.sum(F.when(~is_ref, 1).otherwise(0)).alias("n_cur")))
    # everything downstream of the (type, bucket) rollup runs INSIDE one
    # linear flow (operators/drift.psi_from_biperiod_counts: per-type
    # bucket->count maps + totals, dense 0..B-1 grid rebuilt by map
    # lookups) — so the corpus scan happens exactly once. (The
    # grid-DataFrame + totals-join form re-executed the rollup three
    # times; plan-pinned by test_psi_drift_single_corpus_scan.)
    return psi_from_biperiod_counts(counts, "event_type", PSI_BUCKETS)


def _ks_oracle() -> str:
    return f"""
    WITH g AS (
      SELECT event_type, value,
             SUM(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT_TS}'
                      THEN 1 ELSE 0 END) AS n_r,
             SUM(CASE WHEN ts >= TIMESTAMP '{PSI_SPLIT_TS}'
                      THEN 1 ELSE 0 END) AS n_c
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    c AS (
      SELECT event_type,
             SUM(n_r) OVER (PARTITION BY event_type ORDER BY value) AS cum_r,
             SUM(n_c) OVER (PARTITION BY event_type ORDER BY value) AS cum_c,
             SUM(n_r) OVER (PARTITION BY event_type) AS tot_r,
             SUM(n_c) OVER (PARTITION BY event_type) AS tot_c
      FROM g)
    SELECT event_type,
           CAST(MAX(tot_r) AS BIGINT) AS n_ref_events,
           CAST(MAX(tot_c) AS BIGINT) AS n_cur_events,
           ROUND(MAX(ABS(cum_r * 1.0 * tot_c - cum_c * 1.0 * tot_r))
                 / (MAX(tot_r) * 1.0 * MAX(tot_c)), 4) AS ks
    FROM c GROUP BY event_type
    """


@register(
    "events_ks_drift",
    _ks_oracle(),
    doc="Kolmogorov-Smirnov two-sample drift statistic per event type: the "
        "max gap between the reference and current periods' empirical "
        "CDFs of the value column — the BINLESS complement of "
        "events_psi_drift (PSI sees what a fixed grid sees; KS catches a "
        "shift smaller than a bucket). The gap is maximized over "
        "cross-products |cum_r*tot_c - cum_c*tot_r| computed as DOUBLES "
        "(counts widened before multiplying, no per-point division): exact "
        "to the last bit while each product stays under 2^53 — far beyond "
        "gate scale — and beyond that degrades to 1-ulp rounding instead "
        "of the silent int64 wrap the all-integer form risks in Spark's "
        "non-ANSI mode (DuckDB would promote to HUGEINT and diverge). "
        "NULL values are filtered before the rollup in BOTH engines — "
        "pinned convention, since Spark windows sort NULLS FIRST and "
        "DuckDB NULLS LAST, which would cumulate NULL rows at opposite "
        "ECDF ends. Scale shape: the corpus "
        "collapses to distinct (type, value) counts in ONE conditionally-"
        "aggregated pass; the ECDF window runs over that collapsed table "
        "(bounded by distinct values, not events). A per-type full value "
        "ordering is inherent to exact KS — at 100 TB either accept the "
        "per-type range sort on the collapsed table or use the binned "
        "monitor (PSI) whose rollups never need ordering.")
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    is_ref = F.col("ts") < F.lit(PSI_SPLIT_TS).cast("timestamp")
    g = (e.filter(F.col("value").isNotNull())
         .groupBy("event_type", "value")
         .agg(F.sum(F.when(is_ref, 1).otherwise(0)).alias("n_r"),
              F.sum(F.when(~is_ref, 1).otherwise(0)).alias("n_c")))
    w = Window.partitionBy("event_type").orderBy("value")
    wt = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        F.sum("n_r").over(w).alias("cum_r"),
        F.sum("n_c").over(w).alias("cum_c"),
        F.sum("n_r").over(wt).alias("tot_r"),
        F.sum("n_c").over(wt).alias("tot_c"))
    # widen-then-multiply: double products, never int64 (docstring)
    return (c.groupBy("event_type")
            .agg(F.max("tot_r").alias("n_ref_events"),
                 F.max("tot_c").alias("n_cur_events"),
                 F.round(F.max(F.abs(F.col("cum_r") * F.lit(1.0)
                                     * F.col("tot_c")
                                     - F.col("cum_c") * F.lit(1.0)
                                     * F.col("tot_r")))
                         / (F.max("tot_r") * F.lit(1.0)
                            * F.max("tot_c")), 4)
                 .alias("ks")))


def _psi_quantile_oracle() -> str:
    edge_cols = ",\n             ".join(
        f"ROUND(quantile_cont(value, 0.{i}), 4) AS e{i}"
        for i in range(1, 10))
    bucket = " + ".join(f"CAST(e.value > b.e{i} AS INT)"
                        for i in range(1, 10))
    return f"""
    WITH b AS (
      SELECT event_type,
             {edge_cols}
      FROM events WHERE ts < TIMESTAMP '{PSI_SPLIT_TS}'
      GROUP BY event_type),
    counts AS (
      SELECT e.event_type,
             {bucket} AS bucket,
             SUM(CASE WHEN e.ts < TIMESTAMP '{PSI_SPLIT_TS}'
                      THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN e.ts >= TIMESTAMP '{PSI_SPLIT_TS}'
                      THEN 1 ELSE 0 END) AS n_cur
      FROM events e JOIN b ON e.event_type = b.event_type
      GROUP BY 1, 2),
    dense AS (
      SELECT c0.event_type, g.bucket,
             COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
      FROM (SELECT DISTINCT event_type FROM counts) c0
      CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) g
      LEFT JOIN counts c ON c.event_type = c0.event_type
                        AND c.bucket = g.bucket),
    tot AS (SELECT event_type, SUM(n_ref) AS tr, SUM(n_cur) AS tc
            FROM dense GROUP BY event_type)
    SELECT d.event_type,
           CAST(SUM(d.n_ref) AS BIGINT) AS n_ref_events,
           CAST(SUM(d.n_cur) AS BIGINT) AS n_cur_events,
           ROUND(SUM(
             ((d.n_ref + 1.0) / (t.tr + 10)
              - (d.n_cur + 1.0) / (t.tc + 10))
             * LN(((d.n_ref + 1.0) / (t.tr + 10))
                  / ((d.n_cur + 1.0) / (t.tc + 10)))), 4) AS psi
    FROM dense d JOIN tot t USING (event_type)
    GROUP BY d.event_type
    """


@register(
    "events_psi_quantile_drift",
    _psi_quantile_oracle(),
    doc="PSI on a REFERENCE-QUANTILE grid — the standard monitoring "
        "formulation when value ranges are unknown a priori: bucket "
        "edges are the reference period's per-type deciles (exact "
        "interpolated percentiles rounded to a shared 4-dp grid BEFORE "
        "bucketing, the winsorized-mean parity trick, so both engines "
        "bucket identically), giving ~uniform reference mass per bucket "
        "and therefore equal sensitivity across the distribution — where "
        "the fixed-width grid (events_psi_drift) concentrates buckets "
        "wherever the range happens to be. Scale shape: the decile "
        "aggregate collapses to |types| rows and BROADCASTS back onto "
        "one conditional-aggregate corpus scan (edge comparisons as 9 "
        "codegen'd scalar predicates, no interpreted array lambdas); the "
        "dense-grid PSI fold is the shared operators/drift arithmetic. "
        "At 100 TB swap the exact percentile for percentile_approx — "
        "the grid only needs stability, not exactness. KNOWN-AND-CHOSEN "
        "blind spot: the inner join to the reference-decile table drops "
        "event types with NO reference-period rows, so a BRAND-NEW type "
        "is absent from this report (there is no reference distribution "
        "to grid against). Appear/vanish detection is the job of "
        "events_mix_drift (reports new types with max drift contribution) "
        "and events_psi_drift (fixed grid needs no reference pass); run "
        "the family together, as the monitor docs prescribe.")
def events_psi_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import psi_from_biperiod_counts

    e = load_table(spark, sf_dir, "events")
    split = F.lit(PSI_SPLIT_TS).cast("timestamp")
    b = (e.filter(F.col("ts") < split)
         .groupBy("event_type")
         .agg(*[F.round(F.percentile("value", F.lit(i / 10.0)), 4)
                .alias(f"e{i}") for i in range(1, 10)]))
    bucket = sum((F.col("value") > F.col(f"e{i}")).cast("int")
                 for i in range(1, 10))
    is_ref = F.col("ts") < split
    counts = (e.join(F.broadcast(b), "event_type")
              .groupBy("event_type", bucket.alias("bucket"))
              .agg(F.sum(F.when(is_ref, 1).otherwise(0)).alias("n_ref"),
                   F.sum(F.when(~is_ref, 1).otherwise(0)).alias("n_cur")))
    return psi_from_biperiod_counts(counts, "event_type", PSI_BUCKETS)


@register(
    "events_mix_drift",
    f"""
    WITH c AS (
      SELECT event_type,
             SUM(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT_TS}'
                      THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN ts >= TIMESTAMP '{PSI_SPLIT_TS}'
                      THEN 1 ELSE 0 END) AS n_cur
      FROM events GROUP BY event_type),
    w AS (
      SELECT event_type, n_ref, n_cur,
             SUM(n_ref) OVER () AS tr, SUM(n_cur) OVER () AS tc,
             COUNT(*) OVER () AS nt
      FROM c)
    SELECT event_type,
           CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           ROUND(n_ref * 1.0 / tr, 4) AS share_ref,
           ROUND(n_cur * 1.0 / tc, 4) AS share_cur,
           ROUND(((n_ref + 1.0) / (tr + nt) - (n_cur + 1.0) / (tc + nt))
                 * LN(((n_ref + 1.0) / (tr + nt))
                      / ((n_cur + 1.0) / (tc + nt))), 4) AS psi_contrib
    FROM w
    """,
    doc="Categorical mix drift: each event type's share of traffic in the "
        "current vs reference period, with its per-category PSI "
        "contribution (+1/|categories| Laplace smoothing — a category "
        "that appeared or vanished reports a finite, maximal "
        "contribution). Completes the drift family: fixed-grid and "
        "quantile-grid PSI + binless KS for numeric columns, this for "
        "categorical ones (event mix, language mix, source mix). Scale "
        "shape: ONE conditional-aggregate corpus scan collapses to "
        "|categories| rows; the share/total windows run over that tiny "
        "table. Exact integer counts; one ln per category, 4-dp rounded.")
def events_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    is_ref = F.col("ts") < F.lit(PSI_SPLIT_TS).cast("timestamp")
    c = (e.groupBy("event_type")
         .agg(F.sum(F.when(is_ref, 1).otherwise(0)).alias("n_ref"),
              F.sum(F.when(~is_ref, 1).otherwise(0)).alias("n_cur")))
    w = Window.partitionBy()
    tr, tc = F.sum("n_ref").over(w), F.sum("n_cur").over(w)
    nt = F.count(F.lit(1)).over(w)
    p = (F.col("n_ref") + F.lit(1.0)) / (tr + nt)
    q = (F.col("n_cur") + F.lit(1.0)) / (tc + nt)
    return c.select(
        "event_type", "n_ref", "n_cur",
        F.round(F.col("n_ref") * F.lit(1.0) / tr, 4).alias("share_ref"),
        F.round(F.col("n_cur") * F.lit(1.0) / tc, 4).alias("share_cur"),
        F.round((p - q) * F.log(p / q), 4).alias("psi_contrib"))


# --- z-order layout index ----------------------------------------------------

def _zorder_oracle() -> str:
    from ..operators.layout import ZORDER_BITS

    nb = 1 << ZORDER_BITS
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"(((be >> {i}) & 1) << {i * 2 + 1})")
        terms.append(f"(((bu >> {i}) & 1) << {i * 2})")
    z = " | ".join(terms)
    return f"""
    WITH mm AS (SELECT MIN(event_id) AS mn_e, MAX(event_id) AS mx_e,
                       MIN(user_id)  AS mn_u, MAX(user_id)  AS mx_u
                FROM events),
    b AS (
      SELECT event_id, user_id,
             (event_id - mn_e) // (((mx_e - mn_e) // {nb}) + 1) AS be,
             (user_id  - mn_u) // (((mx_u - mn_u) // {nb}) + 1) AS bu
      FROM events CROSS JOIN mm)
    SELECT event_id, user_id, CAST({z} AS BIGINT) AS z
    FROM b
    ORDER BY z, event_id
    LIMIT 100
    """


@register(
    "events_zorder_index",
    _zorder_oracle(),
    doc="Z-order (Morton) clustering index over (event_id, user_id) — the "
        "value OPTIMIZE-ZORDER-style reclustering sorts files by so that "
        "stats-based data skipping prunes MULTI-column predicate boxes "
        "(operators/layout.py; pairs with delta_data_skipping_agg's "
        "file pruning). Integer-exact throughout: per-column rank buckets "
        "are integral division against in-query min/max (ONE broadcast "
        "1-row aggregate — no driver collect, no literals), and the bit "
        "interleave is a codegen'd shift/and/or tree, so both engines "
        "agree bit-for-bit. The gate returns the 100 lowest z-values "
        "(tie-broken by event_id): a wrong bucket edge, shift position, "
        "or min/max source reorders the curve and breaks the hash.")
def events_zorder_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import with_zorder_value

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    z = with_zorder_value(e, ["event_id", "user_id"])
    return (z.select("event_id", "user_id", F.col("__z").alias("z"))
            .orderBy("z", "event_id").limit(100))
