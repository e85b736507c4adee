"""Property-based tests (hypothesis): invariants that must hold for ANY
input, driver-side logic only (fast, no Spark jobs per example)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from databricks_import_pyspark_scripts_spark.operators.partitioning import (
    get_partition_count,
)
from databricks_import_pyspark_scripts_spark.sources.versioned import (
    parse_table_versions_map,
)

table_names = st.from_regex(r"[a-z][a-z0-9_]{0,10}(\.[a-z][a-z0-9_]{0,10}){0,2}",
                            fullmatch=True)


@given(st.dictionaries(table_names, st.tuples(
    st.integers(0, 10**9), st.integers(0, 10**9)), min_size=0, max_size=8))
@settings(max_examples=200, deadline=None)
def test_versions_map_roundtrip(d):
    s = ",".join(f"{t}={a}-{b}" for t, (a, b) in d.items())
    assert parse_table_versions_map(s) == {t: [a, b] for t, (a, b) in d.items()}


@given(st.integers(0, 10**12), st.integers(1, 10**9))
@settings(max_examples=500, deadline=None)
def test_partition_count_invariants(n, m):
    p = get_partition_count(n, m)
    assert p >= 1                        # never zero partitions
    assert p == max(1, math.ceil(n / m))
    assert (p - 1) * m < max(n, 1)       # no overshoot: p-1 files can't hold n
    assert p * m >= n                    # p files always suffice


@given(st.integers(0, 9999),            # md5 bucket
       st.integers(1, 10 ** 13),        # per-source token total
       st.integers(1, 10 ** 13),        # corpus token budget
       st.integers(1, 100))             # integer weight percent
@settings(max_examples=300, deadline=None)
def test_mixture_predicate_equals_rational_rate(bucket, src_tok, budget, w):
    """The cross-multiplied int64 keep predicate must agree EXACTLY with
    the rational keep rate bucket/10000 < budget*w/(100*src_tok) — and
    never overflow int64 — for petabyte-scale token counts."""
    from fractions import Fraction

    lhs = bucket * src_tok
    rhs = budget * w * 100  # buckets // 100 with MIX_BUCKETS = 10000
    assert lhs < 2 ** 63 and rhs < 2 ** 63
    exact = Fraction(bucket, 10000) < Fraction(budget * w, 100 * src_tok)
    assert (lhs < rhs) == exact


@given(st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)),
                min_size=0, max_size=20))
@settings(max_examples=12, deadline=None)
def test_pagerank_exact_mass_bounds_random_graphs(edge_list):
    """On ANY graph: every vertex's fixed-point PR stays within
    [teleport base, n*scale], and the total never exceeds the initial
    mass plus teleport top-up (floors only ever REMOVE mass)."""
    from databricks_import_pyspark_scripts_spark.operators.graph import (
        PR_SCALE,
        pagerank_exact,
    )
    from databricks_import_pyspark_scripts_spark.session import get_spark

    spark = get_spark("spark_graft_tests", master="local[4]")
    n = 12
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edge_list or [(0, 0)], "src long, dst long")
    prs = [r.pr for r in pagerank_exact(v, e, iters=2).collect()]
    base = (15 * PR_SCALE) // 100
    assert len(prs) == n
    assert all(base <= p <= n * PR_SCALE for p in prs)
    assert sum(prs) <= n * PR_SCALE + n  # floors only remove mass
