"""Skew-handling utilities: key salting for aggregations and joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit tool for
the cases AQE can't fix:

* a single aggregation key so hot that even a split partition's final merge
  chokes -> two-phase salted aggregation;
* a broadcast-ineligible join where one key dominates -> salt the skewed
  side, replicate the other side per salt.

Both are pure DataFrame compositions (deterministic given the salt count) —
no sampling, no driver statistics; at 100 TB pick ``num_salts`` ~ executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, salt_col: str = "_salt", num_salts: int = 32,
           by: Column | None = None) -> DataFrame:
    """Add a deterministic salt in [0, num_salts): hash of ``by`` (a unique
    row expression) when given, else a stable per-row pseudo-random value via
    monotonically_increasing_id (deterministic within a plan)."""
    basis = by if by is not None else F.monotonically_increasing_id()
    return df.withColumn(salt_col, F.pmod(F.hash(basis), F.lit(num_salts)))


def salted_agg(df: DataFrame, keys: list[str], aggs: list[Column],
               partial_aggs: list[Column], num_salts: int = 32,
               salt_by: Column | None = None) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partial agg, then
    groupBy(keys) final merge. ``partial_aggs`` produce the per-salt partial
    columns; ``aggs`` merge them (column names must line up, e.g. partial
    ``F.sum(x).alias("s")`` merged by ``F.sum("s").alias("s")``).

    The first shuffle spreads a hot key over ``num_salts`` reducers; the
    second shuffle moves only |keys| x num_salts rows.
    """
    step1 = (salted(df, "_salt", num_salts, by=salt_by)
             .groupBy(*keys, "_salt").agg(*partial_aggs))
    return step1.groupBy(*keys).agg(*aggs)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                num_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key, explode the small
    side across all salts, join on (key, salt). Shuffle partitions for a hot
    key drop from 1 to ``num_salts``; the small side is replicated
    ``num_salts``x (keep it genuinely small — this is the non-broadcastable
    middle ground between broadcast and plain SMJ).

    Only inner and big-side-outer (``left``) joins are sound: the small side
    is replicated per salt, so in a right/full outer join an UNMATCHED
    small-side row would survive once per salt — ``num_salts`` duplicate
    outputs. Rejected explicitly rather than silently corrupting."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only (got {how!r}): the "
            f"salt-replicated small side emits unmatched rows once PER SALT "
            f"under right/full outer semantics")
    b = salted(big, "_salt", num_salts)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_topk(df: DataFrame, keys: list[str], order: list[Column],
                k: int, num_salts: int = 32,
                salt_by: Column | None = None,
                rank_col: str = "rank") -> DataFrame:
    """Two-phase top-k per key for skewed keys: rank within (keys, salt) and
    keep k per salt, then rank the surviving num_salts*k rows per key.

    Window ranking is the aggregation shape with NO map-side reduction — a
    plain row_number over a zipf-hot key sorts that key's entire row set in
    ONE task (the canonical straggler). Salting splits it into num_salts
    parallel sorts; the final pass ranks only num_salts*k rows per key.
    Correct for any deterministic total order: every global top-k row is by
    definition in its own salt's top-k, so phase 1 never discards a winner.
    ``order`` must break ties (include a unique column) for cross-engine
    determinism, like every top-k in the query library.
    """
    from pyspark.sql.window import Window

    s = salted(df, "_salt", num_salts, by=salt_by)
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
    survivors = (s.withColumn("_rn1", F.row_number().over(w1))
                 .filter(F.col("_rn1") <= k)
                 .drop("_rn1", "_salt"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (survivors.withColumn(rank_col, F.row_number().over(w2))
            .filter(F.col(rank_col) <= k))
