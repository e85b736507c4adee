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
from pyspark.sql import functions as F

from ..operators.cdc import derive_changes
from ..sources.versioned import (
    _path_exists,
    _snapshot_dir,
    list_versions as _list_versions,
    read_snapshot,
)


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


def _ensure_version_marker(spark: SparkSession, root: str, table: str,
                           version: int) -> None:
    """Create the ``_commit_version=<v>`` partition directory even when the
    commit produced zero change rows. Without the marker, an empty leading
    diff is indistinguishable from a VACUUMed prefix in
    ``read_changes``'s eager check, and a fully servable range would
    spuriously error and silently downgrade an incremental export to a
    latest-only snapshot. An empty dir contributes no files to the scan."""
    sc = spark.sparkContext
    path = sc._jvm.org.apache.hadoop.fs.Path(  # noqa: SLF001
        f"{root}/{table}_changes/_commit_version={version}")
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
    fs.mkdirs(path)


def commit_snapshot(spark: SparkSession, df: DataFrame, root: str, table: str,
                    version: int, keys: list[str],
                    base_version: int | None = None) -> None:
    """Write ``df`` as version ``version``; if a base snapshot exists, derive
    and write its change rows (insert/delete/update pre+post).

    Ordering: snapshot FIRST, then changes. A crash between the two leaves a
    snapshot without change rows — a re-run regenerates them idempotently
    (dynamic partition overwrite). The old order left changelog rows for a
    version whose snapshot never landed, which read_changes would happily
    serve; retrying then appended the same rows twice.

    NOTE the diff stays LAZY across write_snapshot: it executes inside
    append_changes, and by then write_snapshot has already overwritten the
    ``version`` directory. That is safe precisely because the diff only
    scans the ``base_version`` directory — hence the guard below:
    ``version == base_version`` would have the lazy diff read files the
    snapshot write just replaced."""
    if version == base_version:
        raise ValueError(
            f"commit_snapshot: version == base_version ({version}); the "
            "change diff would read the same snapshot directory the commit "
            "overwrites")
    if base_version is not None and _path_exists(
            spark, _snapshot_dir(root, table, base_version)):
        old = read_snapshot(spark, root, table, base_version)
        changes = derive_changes(old, df, keys, commit_version=version)
        write_snapshot(df, root, table, version)
        append_changes(changes, root, table)
        _ensure_version_marker(spark, root, table, version)
    else:
        write_snapshot(df, root, table, version)


def vacuum_table(spark: SparkSession, root: str, table: str,
                 keep_from_version: int) -> dict[str, list[int]]:
    """Retention enforcement for the versioned convention — the operation
    whose AFTERMATH the reference's two-level retry exists to survive
    (`unload_databricks_data_to_s3.py:256-340`: missing CDF files after
    Delta VACUUM). Removes snapshot dirs and changelog partitions for
    versions strictly below ``keep_from_version``; an incremental read
    whose range needs a removed version then raises the classified
    missing-CDF error (sources/versioned.py E1) and the pipeline downgrades
    per-table to latest-only (E2) — the exact reference semantics, now
    exercised end-to-end by a first-class vacuum instead of hand-deleted
    dirs in tests.

    Hadoop-FS based (works on any scheme the session can reach). Returns
    {"snapshots": [...], "changes": [...]} — the versions removed.
    """
    sc = spark.sparkContext
    jvm = sc._jvm  # noqa: SLF001
    conf = sc._jsc.hadoopConfiguration()  # noqa: SLF001

    def _rm(path_str: str) -> bool:
        p = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = p.getFileSystem(conf)
        return bool(fs.exists(p) and fs.delete(p, True))

    removed_snaps = []
    for v in _list_versions(spark, f"{root}/{table}", "v="):
        if v < keep_from_version and _rm(f"{root}/{table}/v={v}"):
            removed_snaps.append(v)
    removed_changes = []
    for v in _list_versions(spark, f"{root}/{table}_changes",
                            "_commit_version="):
        if v < keep_from_version and _rm(
                f"{root}/{table}_changes/_commit_version={v}"):
            removed_changes.append(v)
    return {"snapshots": removed_snaps, "changes": removed_changes}


def optimize_table(spark: SparkSession, root: str, table: str,
                   target_partitions: int | None = None,
                   zorder_by: list[str] | None = None) -> dict:
    """OPTIMIZE for the versioned convention — Delta's small-file
    compaction (and optional Z-ORDER BY re-clustering), re-expressed for
    the parquet version layout: read the latest snapshot, rewrite it as
    sized (optionally Morton-clustered) files, and COMMIT THE REWRITE AS A
    NEW VERSION with an empty changelog marker.

    Why a new version instead of an in-place rewrite: the rewrite reads
    the very directory it would replace (the commit_snapshot guard's
    trap), and an in-place overwrite that crashes mid-write destroys the
    only copy. A new version is crash-safe (the old snapshot stays
    readable until ``vacuum_table`` retires it — exactly Delta's
    OPTIMIZE-then-VACUUM lifecycle), and the empty ``_commit_version``
    marker tells incremental readers this commit changed LAYOUT, not data
    (a zero-row diff, not a vacuumed hole).

    Sizing: ``target_partitions`` -> coalesce/repartition count (defaults
    to the session's sized-output math via a plain repartition to the
    cluster parallelism); ``zorder_by`` -> range-partition by the Morton
    key (operators/layout.py) so footer min/max prune on every clustered
    dimension. Returns versions and file counts.
    """
    versions = _list_versions(spark, f"{root}/{table}", "v=")
    if not versions:
        raise ValueError(f"optimize_table: no snapshots under {root}/{table}")
    latest = versions[-1]
    df = read_snapshot(spark, root, table, latest)
    files_before = len(df.inputFiles())
    if zorder_by:
        from ..operators.layout import with_zorder_key

        keyed = with_zorder_key(df, zorder_by, key_col="_zorder")
        n = target_partitions or spark.sparkContext.defaultParallelism
        out = (keyed.repartitionByRange(n, F.col("_zorder"))
               .sortWithinPartitions("_zorder")
               .drop("_zorder"))
    elif target_partitions is not None:
        out = df.coalesce(target_partitions)
    else:
        out = df.repartition(spark.sparkContext.defaultParallelism)
    new_version = latest + 1
    write_snapshot(out, root, table, new_version)
    _ensure_version_marker(spark, root, table, new_version)
    files_after = len(
        read_snapshot(spark, root, table, new_version).inputFiles())
    return {"from_version": latest, "to_version": new_version,
            "files_before": files_before, "files_after": files_after}


def schema_drift_report(spark: SparkSession, root: str, table: str,
                        from_version: int, to_version: int) -> list[dict]:
    """Column-level drift between two snapshot versions: one record per
    added / removed / type-changed column — the pre-flight check an
    incremental consumer runs before trusting ``read_changes`` across a
    schema boundary (additive columns read as NULL for older rows via
    mergeSchema; a TYPE change is the case derive_changes rejects and a
    consumer must handle by re-baselining).

    Driver-side footer reads only (two parquet schema loads, no data
    scan). Returns [{column, change, from_type, to_type}, ...] sorted by
    column name; empty list = no drift.
    """
    old = spark.read.parquet(_snapshot_dir(root, table, from_version)).schema
    new = spark.read.parquet(_snapshot_dir(root, table, to_version)).schema
    o = {f.name: f.dataType.simpleString() for f in old.fields}
    n = {f.name: f.dataType.simpleString() for f in new.fields}
    out = []
    for c in sorted(o.keys() | n.keys()):
        if c not in n:
            out.append({"column": c, "change": "removed",
                        "from_type": o[c], "to_type": None})
        elif c not in o:
            out.append({"column": c, "change": "added",
                        "from_type": None, "to_type": n[c]})
        elif o[c] != n[c]:
            out.append({"column": c, "change": "type_changed",
                        "from_type": o[c], "to_type": n[c]})
    return out
