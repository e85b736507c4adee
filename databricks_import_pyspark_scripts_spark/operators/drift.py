"""Distribution-drift monitoring primitives: fixed-grid value rollups and
PSI computed FROM rollups.

The operational contract (gate ``events_psi_drift``, SCALE.md "telemetry
wave"): because the bucket grid is fixed equi-width with +1/B Laplace
smoothing, a period's entire drift state is its ``(group, bucket, n)``
rollup — a few dozen rows per group — and any two periods are
PSI-comparable from their stored rollups alone, with no raw-data access.
``psi_from_rollups`` is that comparison; ``streaming.pipeline.
stream_psi_monitor`` runs it continuously against a pinned reference
rollup.

PSI (population stability index) = sum over buckets of
``(p_i - q_i) * ln(p_i / q_i)`` with ``p_i = (n_i + 1) / (N + B)`` — the
conventional investigate/block lines are 0.1 / 0.25.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default grid (shared with the events_psi_drift gate)
PSI_BUCKETS = 10
PSI_WIDTH = 50.0


def value_bucket_col(value: Column, width: float = PSI_WIDTH,
                     n_buckets: int = PSI_BUCKETS) -> Column:
    """Fixed equi-width bucket id in [0, n_buckets): floor(value/width),
    clamped at both ends so out-of-range values land in the edge buckets
    instead of inventing new grid cells (rollups stay unionable)."""
    return F.least(
        F.greatest(F.floor(value / width).cast("int"), F.lit(0)),
        F.lit(n_buckets - 1))


def value_rollup(df: DataFrame, group_col: str, value_col: str,
                 width: float = PSI_WIDTH,
                 n_buckets: int = PSI_BUCKETS) -> DataFrame:
    """The stored drift state for one period: ``(group, bucket, n)``.
    One conditional-free aggregate pass; rollups for adjacent periods (or
    micro-batches) merge by unioning and re-summing — the monoid the
    streaming monitor relies on."""
    return (df.groupBy(F.col(group_col),
                       value_bucket_col(F.col(value_col), width, n_buckets)
                       .alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n")))


def _rollup_maps(roll: DataFrame, group_col: str, tag: str) -> DataFrame:
    return roll.groupBy(group_col).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "n")))
        .alias(f"m_{tag}"),
        F.sum("n").alias(f"t_{tag}"))


def psi_from_rollups(ref: DataFrame, cur: DataFrame, group_col: str,
                     n_buckets: int = PSI_BUCKETS) -> DataFrame:
    """PSI per group from two stored ``(group, bucket, n)`` rollups —
    no raw-data access. Groups present in only one rollup still report
    (the other side is all-zero; Laplace smoothing keeps ln finite, and
    such rows surface as maximal drift, which is the right alarm for a
    group that appeared or vanished).

    Returns ``(group, n_ref_events, n_cur_events, psi)`` with psi 4-dp
    rounded — the same shape and arithmetic as the ``events_psi_drift``
    gate (equality pinned by test_psi_composes_from_stored_rollups and
    the stream-monitor test).

    Scale shape: everything runs on rollup-sized data (|groups| x
    n_buckets rows); the dense grid is rebuilt per group by map lookups
    over an exploded 0..B-1 sequence — the same single-flow trick as the
    gate, no grid DataFrame, no totals self-join.
    """
    r = _rollup_maps(ref, group_col, "r")
    c = _rollup_maps(cur, group_col, "c")
    j = r.join(c, group_col, "full_outer")
    dense = j.select(
        group_col,
        F.coalesce(F.col("t_r"), F.lit(0)).alias("tr"),
        F.coalesce(F.col("t_c"), F.lit(0)).alias("tc"),
        "m_r", "m_c",
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"))
    nr = F.coalesce(F.col("m_r")[F.col("bucket")], F.lit(0))
    nc = F.coalesce(F.col("m_c")[F.col("bucket")], F.lit(0))
    p = (nr + F.lit(1.0)) / (F.col("tr") + F.lit(n_buckets))
    q = (nc + F.lit(1.0)) / (F.col("tc") + F.lit(n_buckets))
    return (dense.groupBy(group_col)
            .agg(F.sum(nr).alias("n_ref_events"),
                 F.sum(nc).alias("n_cur_events"),
                 F.round(F.sum((p - q) * F.log(p / q)), 4).alias("psi")))


def merge_rollups(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Union two period rollups into one (the rollup monoid): counts sum
    per (group, bucket). Used by the streaming monitor to fold each
    micro-batch into the cumulative current-period state."""
    return (a.unionByName(b)
            .groupBy(group_col, "bucket")
            .agg(F.sum("n").alias("n")))


def psi_from_biperiod_counts(counts: DataFrame, group_col: str,
                             n_buckets: int = PSI_BUCKETS) -> DataFrame:
    """PSI per group from a single-table biperiod rollup ``(group, bucket,
    n_ref, n_cur)`` — the shape a ONE-scan conditional aggregate produces
    when both periods are counted in the same pass (the gate queries'
    plan). Same dense-grid map trick and Laplace arithmetic as
    ``psi_from_rollups``; sharing it keeps every PSI variant's math
    literally one implementation.

    Returns ``(group, n_ref_events, n_cur_events, psi)``, psi 4-dp.
    """
    per_group = counts.groupBy(group_col).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "n_ref")))
        .alias("mr"),
        F.map_from_entries(F.collect_list(F.struct("bucket", "n_cur")))
        .alias("mc"),
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"))
    dense = per_group.select(
        group_col, "tr", "tc", "mr", "mc",
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"))
    nr = F.coalesce(F.col("mr")[F.col("bucket")], F.lit(0))
    nc = F.coalesce(F.col("mc")[F.col("bucket")], F.lit(0))
    p = (nr + F.lit(1.0)) / (F.col("tr") + F.lit(n_buckets))
    q = (nc + F.lit(1.0)) / (F.col("tc") + F.lit(n_buckets))
    return (dense.groupBy(group_col)
            .agg(F.sum(nr).alias("n_ref_events"),
                 F.sum(nc).alias("n_cur_events"),
                 F.round(F.sum((p - q) * F.log(p / q)), 4).alias("psi")))
