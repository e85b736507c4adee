"""Query library: every operator capability exposed as a named, oracle-checked
query over the driver testdata (TESTDATA.md tables).

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI/DuckDB SQL oracle string (or None for genuinely
non-SQL-expressible operators, which the driver checks rows-only).

Registration is decorator-based; importing the submodules populates the
registry. ``__spark_entry__.py`` is a thin adapter over this package.

Determinism rules every query follows (SURVEY.md §7 risk register):
* every computed column is aliased identically in Spark and oracle SQL;
* double aggregates are ROUND()ed so cross-engine last-ulp drift can't flip
  the driver's value hash;
* ties in any top-k / limit are broken by a unique key so both engines pick
  the same rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn
    return deco


def all_queries() -> dict[str, SparkQuery]:
    _load()
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import relational  # noqa: F401
    from . import tpch_like  # noqa: F401
    from . import advanced  # noqa: F401
    from . import advanced2  # noqa: F401
    from . import cdc_queries  # noqa: F401
    from . import product_analytics  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import multimodal_queries  # noqa: F401
    _LOADED = True
