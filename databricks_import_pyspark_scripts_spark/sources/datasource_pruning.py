"""File-level stats pruning for the jarless Python Data Sources
(Spark 4.1's ``DataSourceReader.pushFilters``, SPARK-48921 family).

The pruning contract is INEXACT and superset-safe: ``pushFilters``
returns EVERY filter back to Spark (the engine re-evaluates all of them
on the scanned rows), and the reader uses the pushed comparisons only
to DROP files whose column bounds *prove* no row can match — the same
split ``read_delta_snapshot(stats_filter=...)`` /
``read_iceberg_snapshot(stats_filter=...)`` use, now wired into the
``spark.read.format(...)`` planning path so a plain ``.filter(...)``
on the loaded frame prunes the scan with NO explicit API. Files with
missing/undecodable bounds are always kept; comparisons that raise
(type mismatches) keep the file. At 100 TB this is the difference
between scanning every file and scanning the bucket the predicate
touches.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    LessThan,
    LessThanOrEqual,
)

# (op name, needs-iterable-value)
_SUPPORTED = (EqualTo, GreaterThan, GreaterThanOrEqual,
              LessThan, LessThanOrEqual, In)


def usable_predicates(filters) -> list[tuple[str, str, object]]:
    """The pushed filters a bounds check can exploit, as
    ``(column, op_name, value)`` triples — top-level attributes only.
    Callers still return ALL filters from pushFilters (inexact)."""
    preds = []
    for f in filters:
        if isinstance(f, _SUPPORTED) and len(f.attribute) == 1:
            preds.append((f.attribute[0], type(f).__name__, f.value))
    return preds


def bounds_may_match(bounds: dict[str, tuple],
                     preds: list[tuple[str, str, object]]) -> bool:
    """False only when some predicate PROVABLY excludes every row of a
    file given its ``{column: (lo, hi)}`` bounds. Strict comparisons are
    relaxed to inclusive (boundary-equal files are kept — superset-safe);
    unknown columns, None endpoints, and type-mismatched comparisons
    keep the file."""
    for col, op, val in preds:
        b = bounds.get(col)
        if not b:
            continue
        lo, hi = b
        if lo is None or hi is None:
            continue
        try:
            if op == "EqualTo" and (val < lo or val > hi):
                return False
            if op in ("GreaterThan", "GreaterThanOrEqual") and hi < val:
                return False
            if op in ("LessThan", "LessThanOrEqual") and lo > val:
                return False
            if op == "In" and all(v < lo or v > hi for v in val):
                return False
        except TypeError:
            continue
    return True
