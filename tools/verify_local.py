#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at the
given sf dir, then compare row count, column names, and order-insensitive
values (exact where possible).

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
       python tools/verify_local.py [sf_dir] --sample N [--seed R]

``--sample N`` runs a deterministic (seeded-shuffle) N-query random sample
of the full registry — in-repo sweep-cadence insurance between driver
windows, so queries outside the current attestation window still get
periodic evidence on current code (VERDICT r6 #7). Same seed + same
registry => same sample; vary the seed per round.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from databricks_import_pyspark_scripts_spark.session import get_spark
from databricks_import_pyspark_scripts_spark.sources.registry import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if not a[c].equals(b[c]):
                neq = (a[c].astype(str) != b[c].astype(str))
                n = int(neq.sum())
                if n:
                    i = neq.idxmax()
                    problems.append(
                        f"col {c}: {n} mismatched values, first at row {i}: "
                        f"spark={a[c][i]!r} duck={b[c][i]!r}")
    return problems


def sample_names(names: list[str], n: int, seed: int) -> list[str]:
    """Deterministic n-query sample: seeded shuffle of the sorted registry
    (sorted first so the sample is stable under _PRIORITY rotation)."""
    pool = sorted(names)
    random.Random(seed).shuffle(pool)
    return pool[:n]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sample_n = seed = None
    if "--sample" in args:
        i = args.index("--sample")
        sample_n = int(args[i + 1])
        del args[i:i + 2]
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    import __spark_entry__ as ent

    spark = get_spark("verify_local")
    con = duck_con(sf_dir)
    qs = ent.queries()
    oracles = ent.oracle_sql()
    if sample_n is not None:
        picked = sample_names(list(qs), sample_n, seed if seed is not None else 0)
        print(f"sample of {len(picked)} (seed {seed or 0}): {sorted(picked)}")
        only = set(picked) | only
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(spark_pdf)} rows  [{t1-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        t2 = time.time()
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok {name}: {len(spark_pdf)} rows  [spark {t1-t0:.1f}s, duck {t2-t1:.1f}s]")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
