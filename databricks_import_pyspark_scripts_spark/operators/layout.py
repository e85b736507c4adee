"""Multi-dimension data-layout keys: Z-order (Morton) interleaving.

``cluster_by`` (sinks.writers) range-clusters on ONE dimension: footer
min/max stats then skip files for predicates on that column, but a second
column's values spread across every file and its predicates skip nothing.
Z-ordering interleaves the bits of several quantized columns into one sort
key, so file-level min/max bounds tighten on EVERY participating dimension
at once (each file covers a small hyper-rectangle instead of a thin slab) —
the standard lakehouse answer for two-to-four filter columns.

Pure integer column expressions (quantize -> bit-interleave), so the key is
deterministic, codegen'd, and costs one projection at write time. Column
min/max bounds are ARGUMENTS: at 100 TB they come from table statistics or
the previous write's footers, not a fresh scan (the writer hook computes
them with one cheap agg when not supplied — fine at export sizes, wasteful
at lake sizes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS_PER_DIM = 8  # 256 buckets/dim; 2 dims -> 16-bit key, <= 7 dims in int63


def quantize_col(col: Column, lo: float, hi: float,
                 bits: int = ZORDER_BITS_PER_DIM) -> Column:
    """Linear quantization of ``col`` into [0, 2^bits): floor-scaled by the
    [lo, hi] bounds, clamped so out-of-bounds values (stale stats) still
    land in the edge buckets rather than corrupting the interleave."""
    buckets = (1 << bits) - 1
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    q = F.floor((col.cast("double") - F.lit(float(lo)))
                / F.lit(float(span)) * buckets)
    return F.greatest(F.lit(0), F.least(F.lit(buckets), q)).cast("long")


def zorder_key_col(quantized: list[Column],
                   bits_per_dim: int = ZORDER_BITS_PER_DIM) -> Column:
    """Morton key: bit i of dimension d lands at position
    ``i * ndims + d`` — adjacent key values differ in low-order bits of all
    dimensions together, so a range of keys bounds every dimension."""
    ndims = len(quantized)
    if ndims * bits_per_dim > 62:
        raise ValueError(
            f"{ndims} dims x {bits_per_dim} bits = {ndims * bits_per_dim} "
            f"key bits; must fit a non-negative int64 (<= 62)")
    key = F.lit(0).cast("long")
    for d, q in enumerate(quantized):
        for i in range(bits_per_dim):
            key = key + F.shiftleft(F.shiftright(q, i) % 2,
                                    i * ndims + d).cast("long")
    return key


def with_zorder_key(df: DataFrame, cols: list[str],
                    bounds: dict[str, tuple[float, float]] | None = None,
                    bits_per_dim: int = ZORDER_BITS_PER_DIM,
                    key_col: str = "_zorder") -> DataFrame:
    """Attach the Morton key column for ``cols``.

    ``bounds`` maps column -> (min, max); when omitted they are computed
    with ONE min/max aggregate over the input (a full scan — fine for an
    export write, but at lake scale pass stored statistics instead).
    """
    if bounds is None:
        row = df.agg(*[f for c in cols
                       for f in (F.min(c).alias(f"_lo_{c}"),
                                 F.max(c).alias(f"_hi_{c}"))]).collect()[0]
        bounds = {c: (float(row[f"_lo_{c}"]), float(row[f"_hi_{c}"]))
                  for c in cols}
    qs = [quantize_col(F.col(c), *bounds[c], bits=bits_per_dim) for c in cols]
    return df.withColumn(key_col, zorder_key_col(qs, bits_per_dim))


# --- integer-exact, in-plan variant (r8) -------------------------------------
#
# ``quantize_col``/``with_zorder_key`` above quantize through DOUBLES with
# clamping (tolerates stale externally-supplied bounds — the lake-scale
# calling convention) and collect bounds driver-side when omitted. The
# functions below are the ORACLE-EXACT twin used by the events_zorder_index
# gate and the OPTIMIZE-shape rewrite: integral-division buckets (both
# engines agree bit-for-bit at any magnitude) and min/max bounds computed
# IN-PLAN via one broadcast 1-row aggregate — no driver collect, no literals
# baked into the plan, so the same DataFrame works under cached/streaming
# reuse.

ZORDER_BITS = ZORDER_BITS_PER_DIM


def int_bucket_col(col: str, mn: str, mx: str,
                   bits: int = ZORDER_BITS) -> Column:
    """Integer-exact rank bucket in [0, 2^bits): (x - min) div step with
    step = ((max - min) div 2^bits) + 1. ``mn``/``mx`` are column NAMES
    (joined-in aggregates), keeping the whole computation inside the plan.

    Division-only on purpose: the multiply-first form ((x-min) * 2^bits)
    wraps int64 silently in Spark's non-ANSI mode once the column span
    crosses 2^(63-bits) — snowflake-style epoch-derived ids DO — while
    DuckDB promotes to HUGEINT and diverges. step > span/2^bits guarantees
    the quotient stays under 2^bits, with no intermediate ever exceeding
    the span itself."""
    return F.expr(f"({col} - {mn}) div ((({mx} - {mn}) div {1 << bits}) + 1)")


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
    buckets = [int_bucket_col(c, f"__mn_{c}", f"__mx_{c}", bits)
               for c in cols]
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
