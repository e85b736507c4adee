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
