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
