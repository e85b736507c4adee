"""MERGE / CDC-apply without Delta: set-based emulation of ``MERGE INTO``
(anti-join + union) and application of a CDF batch to a snapshot — the
inverse of ``cdc.derive_changes`` (guide: "CDC/SCD2 -> MERGE INTO needs
Delta; emulate with anti-join + union + window").

Scale shape: both operators are one shuffle per side on the key columns;
the changes/source side is usually small (a version's delta) and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.versioned import CDC_COLUMNS


def _key_cond(left: str, right: str, keys: list[str]) -> Column:
    cond = None
    for k in keys:
        c = F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}"))
        cond = c if cond is None else (cond & c)
    return cond


def merge_upsert(target: DataFrame, source: DataFrame,
                 keys: list[str]) -> DataFrame:
    """``MERGE INTO target USING source ON keys WHEN MATCHED THEN UPDATE
    WHEN NOT MATCHED THEN INSERT`` as a set operation: keep target rows whose
    key has no source row (anti join), then union all source rows."""
    kept = target.alias("t").join(source.alias("s"),
                                  _key_cond("t", "s", keys), "left_anti")
    return kept.unionByName(source)


def apply_changes(snapshot: DataFrame, changes: DataFrame,
                  keys: list[str]) -> DataFrame:
    """Apply one CDF batch to a snapshot, producing the next snapshot
    (inverse of ``cdc.derive_changes``; round-trip asserted in tests):

    * 'delete' rows remove their key;
    * 'insert' / 'update_postimage' rows upsert their key ('update_preimage'
      rows are informational and ignored);
    * when one key has several change rows in the batch, the one with the
      highest (_commit_version, _commit_timestamp) wins — resolved with a
      window rank, exactly how a mutable consumer of the reference's export
      applies its rows. Ties WITHIN one commit (legal in Delta CDF when a
      row is deleted and re-inserted in the same transaction: delete +
      insert share version AND timestamp) resolve by change-type precedence
      insert/update_postimage over delete — the transaction's NET effect is
      that the row exists — instead of a nondeterministic row_number pick.
    """
    eff = changes.filter(
        F.col("_change_type").isin("insert", "update_postimage", "delete"))
    type_rank = (F.when(F.col("_change_type") == "delete", 0)
                 .otherwise(1))
    w = Window.partitionBy(*keys).orderBy(
        F.col("_commit_version").desc(), F.col("_commit_timestamp").desc(),
        type_rank.desc())
    latest = (eff.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))
    upserts = (latest.filter(F.col("_change_type") != "delete")
               .drop(*CDC_COLUMNS))
    touched = latest.select(*keys)
    untouched = snapshot.alias("t").join(
        touched.alias("s"), _key_cond("t", "s", keys), "left_anti")
    return untouched.unionByName(upserts)


def maintain_agg(mv_old: DataFrame, delta: DataFrame, keys: list[str],
                 op_col: str = "_op") -> DataFrame:
    """Incremental materialized-view maintenance for count/sum aggregates:
    apply an insert/delete changelog to a maintained (keys, cnt, total)
    aggregate WITHOUT rescanning base history.

    ``mv_old`` has columns (keys..., cnt, total); ``delta`` has
    (keys..., total-contribution column ``val``, op_col in {'I','D'}).
    Deletes subtract, inserts add; groups whose maintained count reaches 0
    disappear (the relational-view semantics — a group exists iff it has
    rows). Returns the updated (keys..., cnt, total).

    Scale shape: the delta aggregate is partial-agg friendly and usually
    tiny vs the view; the merge is one outer join on the view's key — the
    view never re-derives from base data, which is the entire point at
    100 TB (the base scan is the cost being amortized away).
    """
    sign = F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
    d = (delta.groupBy(*keys)
         .agg(F.sum(sign).alias("_dcnt"),
              F.sum(sign * F.col("val")).alias("_dtotal")))
    merged = mv_old.join(d, keys, "full_outer")
    new_cnt = F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("_dcnt"),
                                                              F.lit(0))
    new_total = (F.coalesce(F.col("total"), F.lit(0))
                 + F.coalesce(F.col("_dtotal"), F.lit(0)))
    return (merged
            .select(*keys, new_cnt.alias("cnt"), new_total.alias("total"))
            .filter(F.col("cnt") > 0))
