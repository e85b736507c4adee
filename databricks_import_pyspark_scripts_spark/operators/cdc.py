"""CDC-semantics row filter (reference operator F1 + the C6 bypass).

Truth table (reference /root/reference/unload_databricks_data_to_s3.py:203-213,
SURVEY.md §2c):

    _change_type          EVENT   USER/GROUP/WAREHOUSE_PROPERTY
    NULL                  keep    keep        (snapshot rows inside a CDF read)
    'insert'              keep    keep
    'update_postimage'    drop    keep
    'update_preimage'     drop    drop
    'delete'              drop    drop

* Comparison is null-safe (SQL ``<=>`` / ``eqNullSafe``) — load-bearing,
  because ``_change_type IS NULL`` rows must pass.
* The filter applies only when ``_change_type`` is present in the schema; a
  plain snapshot DataFrame passes through untouched.
* After filtering, the three CDC metadata columns are dropped.
* ``mutability_mode=True`` (reference ``--ingestion_in_mutability_mode``)
  bypasses the filter entirely — deletes and preimages flow through so a
  mutable downstream can apply them.

Scale note: this is a narrow per-row predicate + projection — no shuffle, and
Catalyst pushes the ``_change_type IN (...)`` predicate into the changelog
parquet scan (visible as PushedFilters in the formatted plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.versioned import CDC_COLUMNS

DATA_TYPES = ("EVENT", "USER_PROPERTY", "GROUP_PROPERTY", "WAREHOUSE_PROPERTY")


def cdc_keep_predicate(data_type: str,
                       change_col: str = "_change_type") -> Column:
    """The keep-row predicate as a composable Column expression."""
    c = F.col(change_col)
    keep = c.isNull() | c.eqNullSafe(F.lit("insert"))
    if data_type != "EVENT":
        keep = keep | c.eqNullSafe(F.lit("update_postimage"))
    return keep


def filter_data(df: DataFrame, data_type: str,
                mutability_mode: bool = False) -> DataFrame:
    """Apply CDC keep-semantics for ``data_type`` and drop CDC meta columns."""
    if data_type not in DATA_TYPES:
        raise ValueError(f"unknown data_type {data_type!r}; expected one of {DATA_TYPES}")
    if "_change_type" not in df.columns:
        return df
    if not mutability_mode:
        df = df.filter(cdc_keep_predicate(data_type))
    return df.drop(*CDC_COLUMNS)


def derive_changes(old: DataFrame, new: DataFrame, keys: list[str],
                   commit_version: int) -> DataFrame:
    """Derive CDF-shaped change rows from two snapshots (what Delta computes
    from its transaction log, re-expressed as a relational diff):

    * key only in ``new``              -> 'insert' (new values)
    * key only in ``old``              -> 'delete' (old values)
    * key in both, any column differs  -> 'update_preimage' (old) +
                                          'update_postimage' (new)

    One shuffle per side on the key columns; the value comparison is a
    null-safe struct equality (codegen'd), so unchanged rows cost one
    comparison and produce nothing. Output carries the three CDC metadata
    columns the reference consumes (`_commit_timestamp` is the wall-clock of
    derivation, matching Delta's commit-time semantics).

    Additive schema evolution (Delta behavior): a column present in only
    one snapshot is NULL-padded on the other side before the diff, so
    adding a column does not reject the commit — an old row whose only
    difference is the new column being non-NULL in ``new`` becomes a
    regular update pair. A column whose TYPE differs between snapshots is
    still rejected (Delta requires an explicit overwriteSchema for that).
    """
    for c in set(old.columns) & set(new.columns):
        ot, nt = old.schema[c].dataType, new.schema[c].dataType
        if ot != nt:
            raise ValueError(
                f"column {c!r} changed type {ot} -> {nt}; additive "
                f"evolution only (NULL-padding cannot relabel types)")
    # NULL-padding is for VALUE columns only. A key column missing from one
    # side must stay a hard error: the join is eqNullSafe (NULL == NULL is
    # TRUE), so a padded all-NULL key conjunct would match every old row to
    # every new row — a silent cross join emitted as bogus update pairs.
    for k in keys:
        missing = [s for s, d in (("old", old), ("new", new))
                   if k not in d.columns]
        if missing:
            raise ValueError(
                f"key column {k!r} missing from {' and '.join(missing)} "
                f"snapshot; keys cannot be NULL-padded (eqNullSafe would "
                f"cross-join)")
    for c in new.columns:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
    for c in old.columns:
        if c not in new.columns:
            new = new.withColumn(c, F.lit(None).cast(old.schema[c].dataType))
    new = new.select(*old.columns)  # one canonical column order
    value_cols = [c for c in new.columns if c not in keys]

    def tagged(df: DataFrame, side: str) -> DataFrame:
        # presence marker, NOT key-isNotNull: the join matches NULL keys via
        # eqNullSafe, so a NULL-key row IS present — detecting presence from
        # the key column would classify it as absent on both sides and
        # silently drop it from the changelog
        return df.select(
            *[F.col(k).alias(f"{side}_{k}") for k in keys],
            F.struct(*[F.col(c).alias(c) for c in value_cols]).alias(f"{side}_v"),
            F.lit(True).alias(f"{side}_present"))

    o, n = tagged(old, "o"), tagged(new, "n")
    cond = None
    for k in keys:
        c = F.col(f"o_{k}").eqNullSafe(F.col(f"n_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")

    in_old = F.col("o_present").isNotNull()
    in_new = F.col("n_present").isNotNull()
    changed = in_old & in_new & ~F.col("o_v").eqNullSafe(F.col("n_v"))

    def emit(side: str, change_type) -> DataFrame:
        src = j.filter(change_type[1])
        return src.select(
            *[F.col(f"{side}_{k}").alias(k) for k in keys],
            *[F.col(f"{side}_v.{c}").alias(c) for c in value_cols],
            F.lit(change_type[0]).alias("_change_type"))

    inserts = emit("n", ("insert", in_new & ~in_old))
    deletes = emit("o", ("delete", in_old & ~in_new))
    pre = emit("o", ("update_preimage", changed))
    post = emit("n", ("update_postimage", changed))
    out = inserts.unionByName(deletes).unionByName(pre).unionByName(post)
    return (out.withColumn("_commit_version", F.lit(commit_version).cast("long"))
            .withColumn("_commit_timestamp", F.current_timestamp()))
