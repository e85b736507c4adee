"""Z-order (Morton-curve) layout clustering: the file-clustering step that
makes stats-based data skipping effective on MULTI-column predicates.

A table range-partitioned on one column prunes that column's predicates
only; interleaving the bits of several columns' rank buckets gives every
participating column locality in the file layout, so a selective predicate
box on ANY of them maps to a small set of files — the same reason Delta's
OPTIMIZE ZORDER BY exists (public docs/DELTA OSS `OptimizeTableCommand`),
re-expressed as plain DataFrame arithmetic:

* per column, an integer-exact bucket id ``((x - min) * 2^bits) div
  (max - min + 1)`` — min/max come from one aggregate joined back by
  broadcast (no driver collect, no literals baked into the plan);
* the z-value interleaves the bucket bits (codegen'd shift/and/or — no
  UDF anywhere);
* ``repartitionByRange(n_files, z)`` + ``sortWithinPartitions(z)`` turns
  the z-value into the physical file layout, so each file's footer
  min/max covers a small hyper-rectangle of the clustered columns.

Scale: one extra scan for the min/max aggregate (broadcast, scalar-sized),
one range shuffle for the rewrite — the standard cost of any OPTIMIZE-
style recluster; everything else is expression arithmetic inside the scan.

Integer-exactness matters for the oracle gate: the bucket math is integral
division (never doubles), so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8  # 256 rank buckets per column; z fits a long for <= 4 cols


def bucket_col(col: str, mn: str, mx: str, bits: int = ZORDER_BITS) -> Column:
    """Integer-exact rank bucket in [0, 2^bits): ((x - min) * 2^bits) div
    (max - min + 1). ``mn``/``mx`` are column NAMES (joined-in aggregates),
    keeping the whole computation inside the plan."""
    return F.expr(f"(({col} - {mn}) * {1 << bits}) div ({mx} - {mn} + 1)")


def interleave_bits(bucket_cols: list[Column],
                    bits: int = ZORDER_BITS) -> Column:
    """Morton interleave: bit i of column j lands at position
    i * n_cols + (n_cols - 1 - j) — column 0 owns the most significant
    bit of each group, matching the textbook z-curve. Pure shift/and/or
    expression tree, whole-stage codegen."""
    n = len(bucket_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            z = z.bitwiseOR(F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)),
                i * n + (n - 1 - j)))
    return z


def with_zorder_value(df: DataFrame, cols: list[str],
                      bits: int = ZORDER_BITS,
                      out: str = "__z") -> DataFrame:
    """Attach the z-value column: min/max per clustered column from ONE
    aggregate, broadcast back (1 row), then the interleave expression."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    mm = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(mm))
    buckets = [bucket_col(c, f"__mn_{c}", f"__mx_{c}", bits) for c in cols]
    drop = [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols]
    return joined.withColumn(out, interleave_bits(buckets, bits)).drop(*drop)


def zorder_layout(df: DataFrame, cols: list[str], n_files: int,
                  bits: int = ZORDER_BITS) -> DataFrame:
    """The OPTIMIZE-ZORDER rewrite shape: z-value -> range partition ->
    in-file sort -> drop the helper column. Write the result and every
    file's footer min/max covers a compact box of ``cols``."""
    z = with_zorder_value(df, cols, bits)
    return (z.repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z"))
