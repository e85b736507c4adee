"""CLI entry point mirroring the reference's argparse surface (operator C1,
/root/reference/unload_databricks_data_to_s3.py:412-459) without the
Databricks-isms: SQL comes from ``--sql`` or ``--sql-file`` instead of a
secrets service; credentials come from the environment / Hadoop conf.

Usage:
    python -m databricks_import_pyspark_scripts_spark.cli \
        --source-root /data/tables \
        --table-versions-map "events=0-3" \
        --sql "SELECT * FROM events" \
        --output-path /tmp/export --format parquet
"""

from __future__ import annotations

import argparse
import json
import sys

from .operators.cdc import DATA_TYPES
from .operators.partitioning import MAX_RECORDS_PER_OUTPUT_FILE, STRATEGIES
from .plans.pipeline import UnloadJob, run_unload
from .session import configure_s3a_credentials, get_spark
from .sinks.writers import FORMATS
from .sources.versioned import parse_table_versions_map


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="spark-graft unload/export job")
    p.add_argument("--source-root", required=True,
                   help="root dir of versioned tables (<root>/<table>/v=N, <root>/<table>_changes)")
    p.add_argument("--table-versions-map",
                   help='e.g. "events=0-3,users=2-5"; start==0 means '
                        'snapshot-of-end (required unless --maintenance)')
    p.add_argument("--maintenance",
                   choices=("optimize", "vacuum", "drift", "neardup-index",
                            "delta-ingest", "iceberg-ingest",
                            "iceberg-append", "iceberg-compact",
                            "iceberg-expire", "iceberg-set-ref",
                            "iceberg-drop-ref", "iceberg-rewrite-manifests",
                            "iceberg-delete-where", "iceberg-update-where",
                            "iceberg-merge", "iceberg-merge-catalog",
                            "iceberg-enable-row-lineage", "uniform-sync",
                            "delta-clone",
                            "delta-optimize", "delta-vacuum",
                            "delta-checkpoint", "delta-restore"),
                   help="run a table-maintenance operation instead of an "
                        "unload: optimize = compact the latest snapshot "
                        "into a new version; vacuum = drop versions below "
                        "--keep-from-version; drift = schema-drift report "
                        "between --drift-from and --drift-to; "
                        "neardup-index = build the MinHash band index of "
                        "the latest snapshot and write it to --output-path "
                        "partitioned by band_idx (the stored table "
                        "incremental near-dup probes); delta-ingest = one "
                        "scheduler tick of the incremental CDF pull from a "
                        "REAL Delta table dir (<source-root>/<table> with "
                        "_delta_log, no jars needed): resumes from "
                        "--state-path, writes the new change rows under "
                        "--output-path/range=<a>-<b> (idempotent overwrite), "
                        "advances the mark atomically; delta-optimize / "
                        "delta-vacuum / delta-checkpoint = the transactional "
                        "maintenance verbs on a REAL Delta table dir "
                        "(<source-root>/<table>): bin-packing compaction "
                        "(optionally --zorder-by), retention vacuum "
                        "(--retention-hours), classic checkpoint; "
                        "iceberg-append = TRANSACTIONAL append of the "
                        "parquet/json rows at --append-input to a REAL "
                        "Iceberg table dir (<source-root>/<table>): "
                        "CAS-committed v<N+1> metadata, concurrent "
                        "appends race safely; iceberg-compact = "
                        "RewriteFiles bin-packing on a REAL Iceberg "
                        "table dir: small files merge per partition "
                        "into a 'replace' snapshot whose entries keep "
                        "their data sequence numbers explicitly; "
                        "iceberg-expire = expireSnapshots: drop history "
                        "below --keep-last-snapshots and delete files "
                        "only the expired snapshots referenced (ref-pinned "
                        "snapshots are retained); iceberg-set-ref / "
                        "iceberg-drop-ref = create/re-point or remove a "
                        "branch/tag (--ref-name, --ref-type, optional "
                        "--ref-snapshot-id, default head)")
    p.add_argument("--clone-target", default=None,
                   help="delta-clone: destination table dir (shallow)")
    p.add_argument("--ref-name", default=None,
                   help="iceberg-set-ref/drop-ref: branch or tag name")
    p.add_argument("--ref-type", default="tag", choices=("tag", "branch"),
                   help="iceberg-set-ref: ref type (default tag)")
    p.add_argument("--ref-snapshot-id", type=int, default=None,
                   help="iceberg-set-ref: snapshot to pin (default: head)")
    p.add_argument("--state-path", default=None,
                   help="delta-ingest: high-water-mark file (created on "
                        "first tick)")
    p.add_argument("--restore-version", type=int, default=None,
                   help="delta-restore: target version")
    p.add_argument("--keep-last-snapshots", type=int, default=2,
                   help="iceberg-expire: newest snapshots to keep")
    p.add_argument("--small-file-mb", type=int, default=None,
                   help="iceberg-compact: files under this size merge "
                        "(default 128)")
    p.add_argument("--append-input", default=None,
                   help="iceberg-append: parquet dir/file (or .json) of "
                        "rows to append")
    p.add_argument("--delete-predicate", default=None,
                   help="iceberg-delete-where / iceberg-update-where: "
                        "SQL predicate selecting the rows (one atomic "
                        "merge-on-read commit; nothing matched -> no "
                        "commit)")
    p.add_argument("--merge-on", default=None,
                   help="iceberg-merge / iceberg-merge-catalog: "
                        "comma-separated merge key columns "
                        "(MERGE INTO ... ON)")
    p.add_argument("--warehouse", default=None,
                   help="iceberg-merge-catalog: FileRestCatalog "
                        "warehouse directory; --table takes the form "
                        "namespace.table")
    p.add_argument("--set-exprs", default=None,
                   help='iceberg-update-where / iceberg-merge (matched-'
                        'update clause, t./s. qualified): JSON '
                        '{column: SQL expr}')
    p.add_argument("--delete-mode", default="position",
                   choices=("position", "dv", "equality"),
                   help="iceberg-delete-where: physical delete layout "
                        "(position auto-upgrades to deletion vectors on "
                        "a format-version-3 table)")
    p.add_argument("--equality-cols", default=None,
                   help="iceberg-delete-where --delete-mode equality: "
                        "comma-separated key columns; the predicate may "
                        "reference only these")
    p.add_argument("--id-col", default="doc_id",
                   help="neardup-index: document id column")
    p.add_argument("--text-col", default="text",
                   help="neardup-index: document text column")
    p.add_argument("--table", help="table name for --maintenance")
    p.add_argument("--keep-from-version", type=int,
                   help="vacuum: retain versions >= this")
    p.add_argument("--optimize-partitions", type=int, default=None,
                   help="optimize: target file count (default: cluster "
                        "parallelism)")
    p.add_argument("--retention-hours", type=float, default=168.0,
                   help="delta-vacuum: delete unreferenced files older than "
                        "this (default 168 = 7 days)")
    p.add_argument("--drift-from", type=int, help="drift: base version")
    p.add_argument("--drift-to", type=int, help="drift: target version")
    p.add_argument("--sql", help="transformation SQL over the table views")
    p.add_argument("--sql-file", help="file containing the transformation SQL")
    p.add_argument("--output-path",
                   help="export destination (required unless --maintenance)")
    p.add_argument("--data-type", default="EVENT", choices=DATA_TYPES)
    p.add_argument("--format", default="parquet", choices=FORMATS)
    p.add_argument("--partitioning-strategy", default="none", choices=STRATEGIES)
    p.add_argument("--max-records-per-file", type=int,
                   default=MAX_RECORDS_PER_OUTPUT_FILE)
    p.add_argument("--target-partitions", type=int, default=None)
    p.add_argument("--ingestion-in-mutability-mode", action="store_true")
    p.add_argument("--cluster-by", default=None,
                   help="comma-separated columns to range-cluster output "
                        "files on (file-level data skipping for downstream "
                        "scans; supersedes the partitioning strategy's layout)")
    p.add_argument("--partition-by", default=None,
                   help="comma-separated columns for hive-style output "
                        "directory partitioning (col=value/...; coarse "
                        "partition pruning for downstream scans — keep these "
                        "low-cardinality)")
    p.add_argument("--zorder-by", default=None,
                   help="comma-separated columns to Z-order output files on "
                        "(multi-dimension file skipping; mutually exclusive "
                        "with --cluster-by)")
    p.add_argument("--zorder-bounds", default=None,
                   help='quantization bounds per z-order column, e.g. '
                        '"x=0:1000,y=-5:5" — supply from table statistics; '
                        'omitted bounds cost one extra pipeline execution '
                        'to compute min/max')
    return p


def _parse_zorder_bounds(arg: str | None) -> dict[str, tuple[float, float]] | None:
    """``"x=0:1000,y=-5:5"`` -> ``{"x": (0.0, 1000.0), "y": (-5.0, 5.0)}``."""
    if not arg:
        return None
    out: dict[str, tuple[float, float]] = {}
    for entry in arg.split(","):
        entry = entry.strip()
        if not entry:
            continue
        try:
            col, span = entry.split("=", 1)
            lo, hi = span.split(":", 1)
            out[col.strip()] = (float(lo), float(hi))
        except ValueError:
            raise SystemExit(
                f"bad --zorder-bounds entry {entry!r}; expected col=lo:hi")
    return out


def _run_maintenance(args) -> int:
    from .sinks.versioned_writer import (
        optimize_table,
        schema_drift_report,
        vacuum_table,
    )

    if args.maintenance == "vacuum" and args.keep_from_version is None:
        print("--keep-from-version is required for vacuum", file=sys.stderr)
        return 2
    if args.maintenance == "neardup-index" and not args.output_path:
        print("--output-path is required for neardup-index", file=sys.stderr)
        return 2
    if args.maintenance in ("delta-ingest", "iceberg-ingest") and (
            not args.output_path or not args.state_path):
        print("--output-path and --state-path are required for "
              f"{args.maintenance}", file=sys.stderr)
        return 2
    if args.maintenance == "iceberg-append" and not args.append_input:
        print("--append-input is required for iceberg-append",
              file=sys.stderr)
        return 2
    if args.maintenance == "drift" and (args.drift_from is None
                                        or args.drift_to is None):
        print("--drift-from/--drift-to are required for drift",
              file=sys.stderr)
        return 2
    spark = get_spark("spark_graft_maintenance")
    configure_s3a_credentials(spark)
    if args.maintenance == "optimize":
        zorder = ([c.strip() for c in args.zorder_by.split(",") if c.strip()]
                  if args.zorder_by else None)
        report = optimize_table(spark, args.source_root, args.table,
                                target_partitions=args.optimize_partitions,
                                zorder_by=zorder)
    elif args.maintenance == "vacuum":
        report = vacuum_table(spark, args.source_root, args.table,
                              args.keep_from_version)
    elif args.maintenance == "neardup-index":
        from .operators.dedup import build_neardup_index
        from .sources.versioned import list_versions, read_snapshot

        versions = list_versions(
            spark, f"{args.source_root}/{args.table}", "v=")
        if not versions:
            print(f"no snapshots for {args.table} under {args.source_root}",
                  file=sys.stderr)
            return 2
        latest = versions[-1]
        docs = read_snapshot(spark, args.source_root, args.table, latest)
        idx = build_neardup_index(docs, args.id_col, args.text_col)
        (idx.write.mode("overwrite").partitionBy("band_idx")
            .parquet(args.output_path))
        n = spark.read.parquet(args.output_path).count()
        report = {"table": args.table, "snapshot_version": latest,
                  "index_path": args.output_path, "band_rows": n}
    elif args.maintenance in ("delta-ingest", "iceberg-ingest"):
        from .sources.delta_log import delta_incremental_ingest
        from .sources.iceberg import iceberg_incremental_ingest

        ingest = (delta_incremental_ingest
                  if args.maintenance == "delta-ingest"
                  else iceberg_incremental_ingest)
        table_path = f"{args.source_root}/{args.table}"
        written: dict = {}

        def apply_fn(df, last, current):
            # per-range overwrite dir, PLUS removal of any stale dir that
            # starts at the same version: a crash-before-mark followed by a
            # new table commit makes the retry pull a LONGER range
            # (range=3-5 crash -> retry writes range=3-6), and leaving the
            # shorter overlapping dir behind would double-count versions
            # 3-5 for any consumer reading output_path/*
            import glob
            import shutil

            start = last + 1
            # local-path cleanup (glob is a no-op on remote schemes, where
            # the consumer-side dedup key is the range dir name itself)
            for stale in glob.glob(f"{args.output_path}/range={start}-*"):
                shutil.rmtree(stale, ignore_errors=True)
            dest = f"{args.output_path}/range={start}-{current}"
            df.write.mode("overwrite").parquet(dest)
            written.update({"range": [start, current],
                            "rows": spark.read.parquet(dest).count(),
                            "dest": dest})

        hwm = ingest(spark, table_path, args.state_path, apply_fn)
        report = {"table": args.table, "high_water_mark": hwm,
                  "new_data": bool(written), **written}
    elif args.maintenance == "iceberg-append":
        from .sources.iceberg import append_iceberg, iceberg_snapshot_ids

        table_path = f"{args.source_root}/{args.table}"
        reader = (spark.read.json if args.append_input.endswith(".json")
                  else spark.read.parquet)
        df = reader(args.append_input)
        snap = append_iceberg(spark, df, table_path)
        report = {"table": args.table, "snapshot_id": snap,
                  "rows_appended": df.count(),
                  "snapshots": len(iceberg_snapshot_ids(spark,
                                                        table_path))}
    elif args.maintenance == "iceberg-compact":
        from .sources.iceberg import (
            compact_iceberg_table,
            iceberg_snapshot_ids,
            live_data_files,
            read_table_metadata,
        )

        table_path = f"{args.source_root}/{args.table}"
        snap = compact_iceberg_table(
            spark, table_path,
            small_file_bytes=(args.small_file_mb or 128) * 1024 * 1024)
        meta = read_table_metadata(spark, table_path)
        report = {"table": args.table, "snapshot_id": snap,
                  "compacted": snap is not None,
                  "live_files": len(live_data_files(spark, table_path,
                                                    meta)),
                  "snapshots": len(iceberg_snapshot_ids(spark,
                                                        table_path))}
    elif args.maintenance == "iceberg-expire":
        from .sources.iceberg import (
            expire_iceberg_snapshots,
            iceberg_snapshot_ids,
        )

        table_path = f"{args.source_root}/{args.table}"
        rep = expire_iceberg_snapshots(
            spark, table_path, keep_last=args.keep_last_snapshots)
        report = {"table": args.table, "expired": rep["expired"],
                  "deleted_files": len(rep["deleted_files"]),
                  "snapshots": len(iceberg_snapshot_ids(spark,
                                                        table_path))}
    elif args.maintenance == "iceberg-rewrite-manifests":
        from .sources.iceberg import (
            iceberg_metadata_table,
            rewrite_iceberg_manifests,
        )

        table_path = f"{args.source_root}/{args.table}"
        sid = rewrite_iceberg_manifests(spark, table_path)
        mans = iceberg_metadata_table(spark, table_path,
                                      "manifests").collect()
        report = {"table": args.table, "snapshot_id": sid,
                  "rewritten": sid is not None,
                  "data_manifests": sum(m.content == 0 for m in mans)}
    elif args.maintenance == "iceberg-delete-where":
        from .sources.iceberg import (
            iceberg_delete_where,
            iceberg_snapshot_ids,
            read_iceberg_snapshot,
        )

        if not args.delete_predicate:
            print("--delete-predicate is required for "
                  "iceberg-delete-where", file=sys.stderr)
            return 2
        table_path = f"{args.source_root}/{args.table}"
        before = iceberg_snapshot_ids(spark, table_path)[-1]["snapshot_id"]
        sid = iceberg_delete_where(
            spark, table_path, args.delete_predicate,
            mode=args.delete_mode,
            equality_cols=(args.equality_cols.split(",")
                           if args.equality_cols else None))
        report = {"table": args.table, "snapshot_id": sid,
                  "deleted_any": sid != before,
                  "mode": args.delete_mode,
                  "live_rows": read_iceberg_snapshot(spark,
                                                     table_path).count()}
    elif args.maintenance == "iceberg-merge":
        import json as _json

        from .sources.iceberg import (
            iceberg_merge_into,
            iceberg_snapshot_ids,
            read_iceberg_snapshot,
        )

        if not args.append_input or not args.merge_on:
            print("--append-input (source rows) and --merge-on are "
                  "required for iceberg-merge", file=sys.stderr)
            return 2
        table_path = f"{args.source_root}/{args.table}"
        reader = (spark.read.json if args.append_input.endswith(".json")
                  else spark.read.parquet)
        before = iceberg_snapshot_ids(spark, table_path)[-1]["snapshot_id"]
        sid = iceberg_merge_into(
            spark, table_path, reader(args.append_input),
            args.merge_on.split(","),
            when_matched_update=(_json.loads(args.set_exprs)
                                 if args.set_exprs else None),
            when_matched_delete=args.delete_predicate,
            when_not_matched_insert=True)
        report = {"table": args.table, "snapshot_id": sid,
                  "merged_any": sid != before,
                  "live_rows": read_iceberg_snapshot(spark,
                                                     table_path).count()}
    elif args.maintenance == "iceberg-merge-catalog":
        import json as _json

        from .sources.rest_catalog import (
            FileRestCatalog,
            merge_into_via_catalog,
        )

        if not (args.append_input and args.merge_on and args.warehouse
                and args.table and "." in args.table):
            print("--append-input, --merge-on, --warehouse, and "
                  "--table namespace.table are required for "
                  "iceberg-merge-catalog", file=sys.stderr)
            return 2
        ns, _, name = args.table.partition(".")
        cat = FileRestCatalog(args.warehouse)
        reader = (spark.read.json if args.append_input.endswith(".json")
                  else spark.read.parquet)
        before = cat.load_table(ns, name)["metadata"][
            "current-snapshot-id"]
        sid = merge_into_via_catalog(
            spark, cat, ns, name, reader(args.append_input),
            args.merge_on.split(","),
            when_matched_update=(_json.loads(args.set_exprs)
                                 if args.set_exprs else None),
            when_matched_delete=args.delete_predicate,
            when_not_matched_insert=True)
        report = {"table": args.table, "snapshot_id": sid,
                  "merged_any": sid != before}
    elif args.maintenance == "iceberg-update-where":
        import json as _json

        from .sources.iceberg import (
            iceberg_snapshot_ids,
            iceberg_update_where,
            read_iceberg_snapshot,
        )

        if not args.delete_predicate or not args.set_exprs:
            print("--delete-predicate and --set-exprs are required for "
                  "iceberg-update-where", file=sys.stderr)
            return 2
        table_path = f"{args.source_root}/{args.table}"
        before = iceberg_snapshot_ids(spark, table_path)[-1]["snapshot_id"]
        sid = iceberg_update_where(
            spark, table_path, args.delete_predicate,
            _json.loads(args.set_exprs),
            mode=args.delete_mode if args.delete_mode != "equality"
            else "position")
        report = {"table": args.table, "snapshot_id": sid,
                  "updated_any": sid != before,
                  "live_rows": read_iceberg_snapshot(spark,
                                                     table_path).count()}
    elif args.maintenance == "iceberg-enable-row-lineage":
        from .sources.iceberg import (
            enable_iceberg_row_lineage,
            read_table_metadata,
        )

        table_path = f"{args.source_root}/{args.table}"
        sid = enable_iceberg_row_lineage(spark, table_path)
        meta = read_table_metadata(spark, table_path)
        report = {"table": args.table, "snapshot_id": sid,
                  "format_version": int(meta["format-version"]),
                  "next_row_id": int(meta["next-row-id"])}
    elif args.maintenance == "uniform-sync":
        from .sources.iceberg import read_iceberg_snapshot
        from .sources.uniform import uniform_sync_iceberg

        table_path = f"{args.source_root}/{args.table}"
        sid = uniform_sync_iceberg(spark, table_path)
        report = {"table": args.table, "snapshot_id": sid,
                  "rows": read_iceberg_snapshot(spark, table_path).count()}
    elif args.maintenance == "delta-clone":
        from .sinks.delta_writer import clone_delta
        from .sources.delta_log import read_delta_snapshot

        table_path = f"{args.source_root}/{args.table}"
        if not args.clone_target:
            print("--clone-target is required for delta-clone",
                  file=sys.stderr)
            return 2
        clone_delta(spark, table_path, args.clone_target)
        report = {"table": args.table, "target": args.clone_target,
                  "rows": read_delta_snapshot(
                      spark, args.clone_target).count()}
    elif args.maintenance in ("iceberg-set-ref", "iceberg-drop-ref"):
        from .sources.iceberg import drop_iceberg_ref, set_iceberg_ref

        table_path = f"{args.source_root}/{args.table}"
        if not args.ref_name:
            print("--ref-name is required for iceberg-set-ref/drop-ref",
                  file=sys.stderr)
            return 2
        if args.maintenance == "iceberg-set-ref":
            v = set_iceberg_ref(spark, table_path, args.ref_name,
                                ref_type=args.ref_type,
                                snapshot_id=args.ref_snapshot_id)
        else:
            v = drop_iceberg_ref(spark, table_path, args.ref_name)
        report = {"table": args.table, "ref": args.ref_name,
                  "metadata_version": v}
    elif args.maintenance == "delta-restore":
        from .sinks.delta_writer import restore_delta

        table_path = f"{args.source_root}/{args.table}"
        if args.restore_version is None:
            print("--restore-version is required for delta-restore",
                  file=sys.stderr)
            return 2
        from .sources.delta_log import read_delta_snapshot

        v = restore_delta(spark, table_path, args.restore_version)
        report = {"table": args.table,
                  "restored_to": args.restore_version,
                  "new_version": v,
                  "rows": read_delta_snapshot(spark, table_path).count()}
    elif args.maintenance == "delta-optimize":
        from .sinks.delta_writer import optimize_delta
        from .sources.delta_log import replay_log

        table_path = f"{args.source_root}/{args.table}"
        zorder = ([c.strip() for c in args.zorder_by.split(",") if c.strip()]
                  if args.zorder_by else None)
        before = len(replay_log(spark, table_path).files)
        v = optimize_delta(spark, table_path, zorder_by=zorder)
        report = {"table": args.table, "version": v,
                  "files_before": before,
                  "files_after": len(replay_log(spark, table_path).files),
                  "zorder_by": zorder or []}
    elif args.maintenance == "delta-vacuum":
        from .sinks.delta_writer import vacuum_delta

        table_path = f"{args.source_root}/{args.table}"
        doomed = vacuum_delta(
            spark, table_path,
            retention_ms=int(args.retention_hours * 3600 * 1000))
        report = {"table": args.table, "deleted_files": len(doomed)}
    elif args.maintenance == "delta-checkpoint":
        from .sinks.delta_writer import write_classic_checkpoint

        table_path = f"{args.source_root}/{args.table}"
        v = write_classic_checkpoint(spark, table_path)
        report = {"table": args.table, "checkpoint_version": v}
    else:
        report = schema_drift_report(spark, args.source_root, args.table,
                                     args.drift_from, args.drift_to)
    print(json.dumps(report, default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    # pin executor Python workers to the DRIVER's interpreter: in a bare
    # subprocess environment Spark otherwise resolves `python3` from
    # PATH, which may be a different install missing pyarrow/pandas —
    # and every DML verb now runs Arrow-batched executor-side staging
    import os as _os
    _os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    args = build_parser().parse_args(argv)
    if args.maintenance:
        if not args.table:
            print("--table is required with --maintenance", file=sys.stderr)
            return 2
        return _run_maintenance(args)
    if not args.table_versions_map or not args.output_path:
        print("--table-versions-map and --output-path are required "
              "(unless --maintenance)", file=sys.stderr)
        return 2
    if not args.sql and not args.sql_file:
        print("one of --sql / --sql-file is required", file=sys.stderr)
        return 2
    if args.sql:
        sql = args.sql
    else:
        try:
            with open(args.sql_file, encoding="utf-8") as f:
                sql = f.read()
        except OSError as err:
            print(f"cannot read --sql-file {args.sql_file}: {err}", file=sys.stderr)
            return 2
    spark = get_spark("spark_graft_unload")
    # reference C3 parity: AWS env credentials -> fs.s3a.* Hadoop conf so
    # s3a:// output paths work without cluster-level configuration
    configure_s3a_credentials(spark)
    job = UnloadJob(
        source_root=args.source_root,
        table_versions=parse_table_versions_map(args.table_versions_map),
        sql=sql,
        output_path=args.output_path,
        data_type=args.data_type,
        fmt=args.format,
        partitioning_strategy=args.partitioning_strategy,
        max_records_per_file=args.max_records_per_file,
        target_partitions=args.target_partitions,
        mutability_mode=args.ingestion_in_mutability_mode,
        cluster_by=([c.strip() for c in args.cluster_by.split(",") if c.strip()]
                    if args.cluster_by else None),
        partition_by=([c.strip() for c in args.partition_by.split(",") if c.strip()]
                      if args.partition_by else None),
        zorder_by=([c.strip() for c in args.zorder_by.split(",") if c.strip()]
                   if args.zorder_by else None),
        zorder_bounds=_parse_zorder_bounds(args.zorder_bounds),
    )
    report = run_unload(spark, job)
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
