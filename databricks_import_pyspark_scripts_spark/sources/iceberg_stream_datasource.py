"""REAL ``spark.readStream.format("iceberg_jarless")`` over a jar-less
Iceberg snapshot history, via PySpark 4's Python Data Source API — the
``delta_jarless`` source's Iceberg twin (VERDICT r12 #6 follow-through:
the availableNow loop in ``streaming/iceberg_source.py`` covers the
full-semantics change feed; THIS source is the native readStream UX).

Semantics mirror Iceberg's own Spark streaming source: the stream
serves APPEND snapshots' added data files, one file per
``InputPartition`` (pyarrow, field-id-resolved and column-pruned);
offsets are snapshot ORDINALS persisted in the streaming checkpoint.
Row-visibility-changing snapshots fail the stream loudly unless
skipped — ``replace`` (compaction) snapshots are always skipped
(content unchanged, Iceberg's streaming source does the same),
``delete`` snapshots need ``ignoreDeletes=true``, ``overwrite``
(UPDATE/MERGE post-image) snapshots need ``ignoreChanges=true`` with
the standard caveat: skipped rewrites are NOT re-served as change rows;
consume ``streaming/iceberg_source.py`` for the real change feed.

The batch half serves the CURRENT snapshot's live data files with
MERGE-ON-READ for position deletes: v3 puffin DELETION VECTORS ship as
per-file compressed bitmaps resolved at plan time (KB each — the
delta_jarless ship-the-bitmap model), and v2 position-delete PARQUET
files ship as paths that each task scans filtered to its OWN data file
(the per-task applicable-delete scan Iceberg's own MoR readers do;
delete files are partition-scoped in real layouts, bounding the
re-read). EQUALITY deletes (content=2) reject loudly — applying value
matching inside this thin reader would duplicate
``sources/iceberg.read_iceberg_snapshot``, the full-semantics batch
surface.

Scale shape: planning is driver-side metadata (Avro manifest decode via
the from-scratch codec — KBs per snapshot); data bytes move only in
executors' Python workers. Iceberg data files materialize ALL columns
including identity-partition sources (spec), so no partition-value
re-attachment is needed — pruning is plain column selection.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructField, StructType

from .avro_codec import read_container
from .iceberg import (
    _VMETA_RE,
    STATUS_ADDED,
    IcebergProtocolError,
    _resolve_path,
    _spark_type,
    _strip_scheme,
)

if TYPE_CHECKING:
    import pyarrow as pa

FORMAT_NAME = "iceberg_jarless"


def _load_meta(table_path: str) -> dict:
    """Head metadata by local-FS version listing (the planner runs in
    Spark's Python planning process — no SparkSession, plain open())."""
    root = _strip_scheme(table_path)
    mdir = os.path.join(root, "metadata")
    if not os.path.isdir(mdir):
        raise FileNotFoundError(f"{table_path} has no Iceberg metadata/")
    versions = sorted(int(m.group(1)) for n in os.listdir(mdir)
                      if (m := _VMETA_RE.match(n)))
    if not versions:
        raise FileNotFoundError(f"no v*.metadata.json under {mdir}")
    return json.load(open(os.path.join(
        mdir, f"v{versions[-1]}.metadata.json")))


def _current_fields(meta: dict) -> list[dict]:
    sid = meta.get("current-schema-id", 0)
    for s in meta.get("schemas") or []:
        if s.get("schema-id", 0) == sid:
            return s["fields"]
    if meta.get("schema"):
        return meta["schema"]["fields"]
    raise IcebergProtocolError("no current schema in table metadata")


def _snapshot_manifests(table_path: str, sn: dict) -> list[dict]:
    ml = _resolve_path(_strip_scheme(table_path), sn["manifest-list"])
    _, manifests = read_container(open(ml, "rb").read())
    return manifests


def _added_data_files(table_path: str, sn: dict) -> list[str]:
    """Data files ADDED by snapshot ``sn`` (manifests it contributed,
    ADDED-status entries)."""
    root = _strip_scheme(table_path)
    sid = int(sn["snapshot-id"])
    out = []
    for m in _snapshot_manifests(table_path, sn):
        if int(m.get("content") or 0) != 0:
            continue
        if int(m.get("added_snapshot_id") or -1) != sid:
            continue
        _, entries = read_container(open(
            _resolve_path(root, m["manifest_path"]), "rb").read())
        for e in entries:
            if int(e.get("status") or 0) != STATUS_ADDED:
                continue
            out.append(_resolve_path(root, e["data_file"]["file_path"]))
    return sorted(out)


def _op_of(sn: dict) -> str:
    return ((sn.get("summary") or {}).get("operation") or "append").lower()


class _IceFilePartition(InputPartition):
    def __init__(self, path: str, cols: list[tuple],
                 dv_blob: bytes | None = None,
                 delete_paths: tuple = ()):
        self.path = path
        self.cols = cols        # (name, field_id)
        self.dv_blob = dv_blob              # v3 DV bitmap, plan-resolved
        self.delete_paths = delete_paths    # v2 position-delete parquet


def _file_suffix_key(path: str) -> str:
    """Last two path components — the join key the full reader uses
    (``iceberg._file_key``); file names embed UUIDs, so the suffix is
    collision-free across layouts/schemes."""
    return "/".join(path.rstrip("/").split("/")[-2:])


def _read_ice_partition(partition: _IceFilePartition
                        ) -> Iterator["pa.RecordBatch"]:
    """Executor-side read: resolve requested columns by parquet FIELD ID
    first (the Iceberg way — rename-safe), name as fallback for
    id-less foreign files; loudly absent otherwise. Row-level position
    deletes apply here: the plan-shipped DV bitmap and/or a scan of the
    snapshot's position-delete parquet files filtered to THIS data
    file's (file_path, pos) rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(partition.path)
    in_file = pf.schema_arrow
    by_fid = {}
    for f in in_file:
        fid = (f.metadata or {}).get(b"PARQUET:field_id")
        if fid is not None:
            by_fid[int(fid)] = f.name
    names = set(in_file.names)
    resolved = []
    for name, fid in partition.cols:
        if fid is not None and int(fid) in by_fid:
            resolved.append((name, by_fid[int(fid)]))
        elif name in names:
            resolved.append((name, name))
        else:
            raise ValueError(
                f"{partition.path}: column {name!r} (field id {fid}) "
                f"absent from the file")
    table = pf.read(columns=[c for _, c in resolved])
    dead_parts = []
    if partition.dv_blob is not None:
        from .delta_dv import deserialize_bitmap_array

        dead_parts.append(
            deserialize_bitmap_array(partition.dv_blob).astype("i8"))
    if partition.delete_paths:
        import pyarrow.compute as pc

        key = "/" + _file_suffix_key(partition.path)
        for dp in partition.delete_paths:
            dt = pq.read_table(dp, columns=["file_path", "pos"])
            m = pc.ends_with(dt["file_path"], pattern=key)
            dead_parts.append(
                dt["pos"].filter(m).combine_chunks()
                .to_numpy(zero_copy_only=False).astype("i8"))
    if dead_parts:
        import numpy as np

        dead = np.concatenate(dead_parts)
        if len(dead):
            mask = np.ones(table.num_rows, dtype=bool)
            mask[dead[dead < table.num_rows]] = False
            table = table.filter(pa.array(mask))
    out = pa.table({name: table.column(i)
                    for i, (name, _) in enumerate(resolved)})
    yield from out.to_batches()


class IcebergLogStreamReader(DataSourceStreamReader):
    """Offsets are ``{"ordinal": N}`` = 'snapshots through ordinal N
    served'; a micro-batch (start, end] serves the added data files of
    append snapshots start+1..end."""

    def __init__(self, schema: StructType, options: dict):
        self._path = options["path"]
        self._schema = schema
        self._ignore_deletes = str(
            options.get("ignoredeletes", "false")).lower() == "true"
        self._ignore_changes = str(
            options.get("ignorechanges", "false")).lower() == "true"
        mv = options.get("maxsnapshotspertrigger")
        self._max_snaps = int(mv) if mv else None
        self._starting = int(options.get("startingordinal", 0))
        self._last_end: int | None = None

    def initialOffset(self) -> dict:
        return {"ordinal": self._starting - 1}

    def latestOffset(self) -> dict:
        meta = _load_meta(self._path)
        head = len(meta.get("snapshots") or []) - 1
        # bounded admission relative to the LAST PLANNED batch end (the
        # delta_jarless clamp): restart-safe because partitions() records
        # Spark's own offsets, never local guesses
        if self._max_snaps is not None and self._last_end is not None:
            head = min(head, self._last_end + self._max_snaps)
        return {"ordinal": head}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["ordinal"]), int(end["ordinal"])
        self._last_end = hi
        meta = _load_meta(self._path)
        snaps = meta.get("snapshots") or []
        fields = _current_fields(meta)
        want = {f.name for f in self._schema.fields}
        cols = [(f["name"], int(f["id"])) for f in fields
                if f["name"] in want]
        parts: list[InputPartition] = []
        for ordinal in range(lo + 1, hi + 1):
            sn = snaps[ordinal]
            op = _op_of(sn)
            if op == "replace":
                continue               # compaction: content unchanged
            if op == "delete":
                if not (self._ignore_deletes or self._ignore_changes):
                    raise ValueError(
                        f"snapshot ordinal {ordinal} of {self._path} "
                        f"deletes rows. A streaming source over the "
                        f"table view cannot replay it; set "
                        f"ignoreDeletes=true to skip, or consume the "
                        f"real change feed via streaming/"
                        f"iceberg_source.py")
                continue
            if op == "overwrite":
                if not self._ignore_changes:
                    raise ValueError(
                        f"snapshot ordinal {ordinal} of {self._path} "
                        f"rewrites rows (UPDATE/MERGE). Set "
                        f"ignoreChanges=true to serve its post-image "
                        f"files (skipped deletes are NOT re-served), "
                        f"or consume streaming/iceberg_source.py")
            parts.extend(_IceFilePartition(p, cols)
                         for p in _added_data_files(self._path, sn))
        return parts

    def read(self, partition: InputPartition
             ) -> Iterator["pa.RecordBatch"]:
        yield from _read_ice_partition(partition)

    def commit(self, end: dict) -> None:
        """Offsets live in Spark's streaming checkpoint; the snapshot
        history is append-only input."""


class IcebergLogBatchReader(DataSourceReader):
    """Batch half: a snapshot's live data files with position-delete
    merge-on-read (equality deletes reject toward
    read_iceberg_snapshot). TIME TRAVEL via ``snapshotId`` (exact id)
    or ``asOfOrdinal`` (index into the snapshot history) — columns
    resolve by FIELD ID in the executor, so the current read schema is
    rename-safe across the history. ``pushFilters`` enables
    MANIFEST-STATS FILE PRUNING: pushed comparisons drop files whose
    decoded lower/upper bounds prove no row can match, and every filter
    is returned for Spark to re-evaluate (inexact, superset-safe — the
    same split the full-semantics reader's ``stats_filter`` uses)."""

    def __init__(self, schema: StructType, options: dict):
        self._path = options["path"]
        self._schema = schema
        self._snapshot_id = options.get("snapshotid")
        self._as_of_ordinal = options.get("asofordinal")
        self._preds: list[tuple] = []

    def pushFilters(self, filters):
        from .datasource_pruning import usable_predicates

        self._preds = usable_predicates(filters)
        return filters          # Spark re-applies everything post-scan

    def _pick_snapshot(self, meta: dict) -> dict | None:
        snaps = meta.get("snapshots") or []
        if self._snapshot_id is not None:
            want = int(self._snapshot_id)
            sn = next((s for s in snaps
                       if int(s["snapshot-id"]) == want), None)
            if sn is None:
                raise ValueError(
                    f"snapshot id {want} not in the history of "
                    f"{self._path} (have "
                    f"{[int(s['snapshot-id']) for s in snaps]})")
            return sn
        if self._as_of_ordinal is not None:
            i = int(self._as_of_ordinal)
            if not 0 <= i < len(snaps):
                raise ValueError(
                    f"ordinal {i} out of range for {self._path} "
                    f"({len(snaps)} snapshots)")
            return snaps[i]
        cur = meta.get("current-snapshot-id")
        return next((s for s in snaps
                     if int(s["snapshot-id"]) == int(cur)), None)

    def partitions(self) -> list[InputPartition]:
        from .datasource_pruning import bounds_may_match
        from .iceberg import decoded_column_bounds

        meta = _load_meta(self._path)
        sn = self._pick_snapshot(meta)
        if sn is None:
            return []
        root = _strip_scheme(self._path)
        fields = _current_fields(meta)
        want = {f.name for f in self._schema.fields}
        cols = [(f["name"], int(f["id"])) for f in fields
                if f["name"] in want]
        live: list[str] = []
        pos_delete_paths: list[str] = []
        dv_by_key: dict[str, bytes] = {}
        puffin_cache: dict[str, bytes] = {}
        for m in _snapshot_manifests(self._path, sn):
            _, entries = read_container(open(
                _resolve_path(root, m["manifest_path"]), "rb").read())
            if int(m.get("content") or 0) == 1:   # delete manifest
                for e in entries:
                    if int(e.get("status") or 0) == 2:   # DELETED
                        continue
                    df = e["data_file"]
                    if int(df.get("content") or 0) == 2:
                        # NOT IcebergProtocolError: that subclasses
                        # NotImplementedError, which the Python Data
                        # Source API reads as "partitions()
                        # unimplemented" and silently falls back to a
                        # single None partition
                        raise ValueError(
                            "iceberg_jarless batch read: the table "
                            "carries live EQUALITY deletes; use "
                            "sources/iceberg.read_iceberg_snapshot, "
                            "the full-semantics reader")
                    if df.get("content_offset") is not None:
                        # v3 puffin DV: resolve the KB-scale bitmap at
                        # plan time, ship it with its data file
                        from .puffin import read_puffin_blob

                        ppath = _resolve_path(root, df["file_path"])
                        raw = puffin_cache.get(ppath)
                        if raw is None:
                            raw = open(ppath, "rb").read()
                            puffin_cache[ppath] = raw
                        key = _file_suffix_key(
                            df["referenced_data_file"])
                        dv_by_key[key] = read_puffin_blob(
                            raw, int(df["content_offset"]),
                            int(df["content_size_in_bytes"]))
                    else:
                        pos_delete_paths.append(
                            _resolve_path(root, df["file_path"]))
                continue
            for e in entries:
                if int(e.get("status") or 0) == 2:       # DELETED
                    continue
                if self._preds and not bounds_may_match(
                        decoded_column_bounds(meta, e["data_file"]),
                        self._preds):
                    continue                 # stats prove no match
                live.append(_resolve_path(
                    root, e["data_file"]["file_path"]))
        pos_t = tuple(sorted(set(pos_delete_paths)))
        return [_IceFilePartition(p, cols,
                                  dv_blob=dv_by_key.get(
                                      _file_suffix_key(p)),
                                  delete_paths=pos_t)
                for p in sorted(live)]

    def read(self, partition: InputPartition
             ) -> Iterator["pa.RecordBatch"]:
        yield from _read_ice_partition(partition)


class IcebergJarlessDataSource(DataSource):
    """``spark.dataSource.register(IcebergJarlessDataSource)`` then
    ``spark.read.format("iceberg_jarless").option("path", t).load()``
    for a live-file snapshot or ``spark.readStream`` for the append
    stream over snapshot ordinals."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "iceberg_jarless requires .option('path', ...)")
        fields = _current_fields(_load_meta(path))
        return StructType([
            StructField(f["name"], _spark_type(f["type"]),
                        not f.get("required", False))
            for f in fields])

    def reader(self, schema: StructType) -> DataSourceReader:
        _load_meta(self.options["path"])      # fail fast on non-tables
        return IcebergLogBatchReader(schema, dict(self.options))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        _load_meta(self.options["path"])
        return IcebergLogStreamReader(schema, dict(self.options))


def register_iceberg_stream_source(spark) -> None:
    """Idempotent registration of the format for this session. Also
    enables Python data source filter pushdown (see the delta twin:
    with the conf off, Spark refuses readers that implement
    pushFilters)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(IcebergJarlessDataSource)
