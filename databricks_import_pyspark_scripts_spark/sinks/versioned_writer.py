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
    """Write CDF-shaped rows (must carry the three CDC meta columns),
    overwriting ONLY the version partitions present in ``changes`` (dynamic
    partition overwrite). Re-running a commit therefore replaces that
    version's change rows instead of appending duplicates — the same
    redelivery-idempotence requirement the streaming sink has."""
    (changes.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("_commit_version")
     .parquet(f"{root}/{table}_changes"))


def commit_snapshot(spark: SparkSession, df: DataFrame, root: str, table: str,
                    version: int, keys: list[str],
                    base_version: int | None = None) -> None:
    """Write ``df`` as version ``version``; if a base snapshot exists, derive
    and write its change rows (insert/delete/update pre+post).

    Ordering: snapshot FIRST, then changes. A crash between the two leaves a
    snapshot without change rows — a re-run regenerates them idempotently
    (dynamic partition overwrite). The old order left changelog rows for a
    version whose snapshot never landed, which read_changes would happily
    serve; retrying then appended the same rows twice."""
    if base_version is not None and _path_exists(
            spark, _snapshot_dir(root, table, base_version)):
        old = read_snapshot(spark, root, table, base_version)
        changes = derive_changes(old, df, keys, commit_version=version)
        # derive_changes reads the base snapshot lazily; materialize the diff
        # BEFORE write_snapshot can touch any files it scans
        write_snapshot(df, root, table, version)
        append_changes(changes, root, table)
    else:
        write_snapshot(df, root, table, version)
