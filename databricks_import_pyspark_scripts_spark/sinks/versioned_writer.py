"""Write side of the versioned-table convention (the reader lives in
sources/versioned.py):

    <root>/<table>/v=<version>/        snapshots
    <root>/<table>_changes/            changelog, partitioned by _commit_version

``commit_snapshot`` writes the new version AND appends the derived change
rows in one call — the Databricks-free equivalent of a Delta commit with
Change Data Feed enabled. Changelog partitioning by ``_commit_version`` is
what makes incremental reads partition-pruned at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdc import derive_changes
from ..sources.versioned import _path_exists, _snapshot_dir, read_snapshot


def write_snapshot(df: DataFrame, root: str, table: str, version: int) -> None:
    df.write.mode("overwrite").parquet(_snapshot_dir(root, table, version))


def append_changes(changes: DataFrame, root: str, table: str) -> None:
    """Append CDF-shaped rows (must carry the three CDC meta columns)."""
    (changes.write.mode("append").partitionBy("_commit_version")
     .parquet(f"{root}/{table}_changes"))


def commit_snapshot(spark: SparkSession, df: DataFrame, root: str, table: str,
                    version: int, keys: list[str],
                    base_version: int | None = None) -> None:
    """Write ``df`` as version ``version``; if a base snapshot exists, derive
    and append its change rows (insert/delete/update pre+post)."""
    if base_version is not None and _path_exists(
            spark, _snapshot_dir(root, table, base_version)):
        old = read_snapshot(spark, root, table, base_version)
        changes = derive_changes(old, df, keys, commit_version=version)
        append_changes(changes, root, table)
    write_snapshot(df, root, table, version)
