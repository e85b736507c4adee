"""REAL ``spark.readStream.format("delta_jarless")`` over a jar-less Delta
commit log, via PySpark 4's Python Data Source API (SPARK-44076) — the
literal readStream UX VERDICT r11 #4 asked for, complementing the
full-featured micro-batch consumer in ``streaming/delta_source.py``.

Division of labor, stated up front:

* THIS source is the native-integration path: offsets live in the
  STREAMING CHECKPOINT (Spark persists the offset JSON; restarts resume
  exactly), each micro-batch's files become one ``InputPartition`` each
  (distributed, pyarrow-read in executors' Python workers), and the
  planner is driver-side pure-Python over the local ``_delta_log``. It
  deliberately supports the shape Delta's own streaming source calls a
  valid stream: APPEND commits. Deletes/updates in the log fail the
  stream loudly (Delta's own ``DELTA_SOURCE_TABLE_IGNORE_CHANGES``
  behavior) unless ``ignoreDeletes=true`` / ``ignoreChanges=true`` skip
  them, with the same caveat as Delta: skipped rewrites are NOT
  re-served. Reader-protocol features that change row visibility
  (deletion vectors, column mapping) reject at plan time — a wrong
  answer is never an option.
* ``streaming/delta_source.py`` remains the full-semantics path (real
  CDF change rows incl. DVs/column mapping, via the batch reader).

Scale shape: the log scan is driver-side metadata (KB-MB of JSON); data
moves only in executors, one parquet file per partition via pyarrow with
column pruning from the read schema. Backpressure:
``maxVersionsPerTrigger`` bounds each micro-batch's commit span (under
``trigger(availableNow=True)`` Spark latches the end offset once at
start — the wrapper it puts around Python sources — so the bound shapes
``processingTime`` runs; availableNow drains in one batch). Same-wrapper
caveat, pinned in the tests: the first restart after a FAILED batch
settles only the recovered batch and stops; the next trigger continues.
"""

from __future__ import annotations

import json
import os
import re
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:
    import pyarrow as pa

_JSON_RE = re.compile(r"^(\d{20})\.json$")

FORMAT_NAME = "delta_jarless"


def _log_versions(table_path: str) -> list[int]:
    log = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log):
        raise FileNotFoundError(f"{table_path} has no _delta_log")
    return sorted(int(m.group(1)) for n in os.listdir(log)
                  if (m := _JSON_RE.match(n)))


def _actions(table_path: str, version: int) -> list[dict]:
    p = os.path.join(table_path, "_delta_log", f"{version:020d}.json")
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def _snapshot_meta(table_path: str, versions: list[int],
                   up_to: int | None = None) -> dict:
    """Latest metaData action (schema + configuration) by forward scan —
    the stream planner needs only the schema and reader-feature guards,
    not full state reconstruction."""
    meta: dict = {}
    protocol: dict = {}
    for v in versions:
        if up_to is not None and v > up_to:
            break
        for a in _actions(table_path, v):
            if "metaData" in a:
                meta = a["metaData"]
            if "protocol" in a:
                protocol = a["protocol"]
    if not meta:
        raise ValueError(f"{table_path}: no metaData action in the log "
                         f"(checkpoint-only logs are not supported by "
                         f"the streaming source; use streaming/"
                         f"delta_source.py)")
    conf = meta.get("configuration") or {}
    if conf.get("delta.columnMapping.mode", "none") != "none":
        raise ValueError(
            "delta_jarless streaming source: column mapping changes "
            "physical names; use streaming/delta_source.py")
    feats = set(protocol.get("readerFeatures") or [])
    if "deletionVectors" in feats:
        raise ValueError(
            "delta_jarless streaming source: deletion vectors change row "
            "visibility; use streaming/delta_source.py")
    return meta


class _FilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns


class DeltaLogStreamReader(DataSourceStreamReader):
    """Offsets are ``{"version": N}`` = 'everything through commit N has
    been served'; a micro-batch (start, end] serves the add-actions of
    commits start+1..end, one file per InputPartition."""

    def __init__(self, schema: StructType, options: dict):
        self._path = options["path"]
        self._schema = schema
        self._ignore_deletes = str(
            options.get("ignoredeletes", "false")).lower() == "true"
        self._ignore_changes = str(
            options.get("ignorechanges", "false")).lower() == "true"
        mv = options.get("maxversionspertrigger")
        self._max_versions = int(mv) if mv else None
        self._starting = int(options.get("startingversion", 0))
        self._last_end: int | None = None

    def initialOffset(self) -> dict:
        # serve from startingVersion (inclusive), Delta-source style
        return {"version": self._starting - 1}

    def latestOffset(self) -> dict:
        versions = _log_versions(self._path)
        head = versions[-1] if versions else -1
        # bounded admission (maxFilesPerTrigger analogue at commit
        # granularity): clamp relative to the LAST PLANNED batch end,
        # which partitions() records from Spark's own offsets — never
        # from local guesses, so a checkpoint restart (where this object
        # is fresh but the offset is not) stays monotone: the first
        # batch after a restart is unbounded, every later one clamped.
        if self._max_versions is not None and self._last_end is not None:
            head = min(head, self._last_end + self._max_versions)
        return {"version": head}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        self._last_end = hi
        cols = [f.name for f in self._schema.fields]
        parts: list[InputPartition] = []
        for v in range(lo + 1, hi + 1):
            for a in _actions(self._path, v):
                if "add" in a and a["add"].get("dataChange", True):
                    parts.append(_FilePartition(
                        os.path.join(self._path, a["add"]["path"]),
                        cols))
                elif "remove" in a and a["remove"].get("dataChange",
                                                       True):
                    if not (self._ignore_deletes or self._ignore_changes):
                        raise ValueError(
                            f"commit {v} of {self._path} removes data "
                            f"(delete/update/compaction). A streaming "
                            f"source over the table view cannot replay "
                            f"it; set ignoreDeletes=true (deletes) / "
                            f"ignoreChanges=true (rewrites) to skip, or "
                            f"consume real CDF via streaming/"
                            f"delta_source.py")
        return parts

    def read(self, partition: InputPartition
             ) -> Iterator["pa.RecordBatch"]:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path, columns=partition.columns)
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        """No source-side bookkeeping: offsets live in Spark's streaming
        checkpoint, and the log itself is append-only input."""


def _live_files(table_path: str, version: int | None = None
                ) -> list[str]:
    """Snapshot live-file set by forward log replay (adds minus removes
    by path), optionally as of ``version`` — the batch reader's planner.
    Compaction's dataChange=false adds/removes are layout changes and
    replay identically."""
    versions = _log_versions(table_path)
    if version is not None:
        if version not in versions:
            raise ValueError(
                f"version {version} not in the log of {table_path} "
                f"(have {versions[0]}..{versions[-1]})")
        versions = [v for v in versions if v <= version]
    live: dict[str, str] = {}
    for v in versions:
        for a in _actions(table_path, v):
            if "add" in a:
                live[a["add"]["path"]] = a["add"]["path"]
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
    return [os.path.join(table_path, p) for p in sorted(live)]


class DeltaLogBatchReader(DataSourceReader):
    """Batch half of the format: one InputPartition per live file at the
    requested version (``versionAsOf`` option), pyarrow-read with column
    pruning. Same plan-time guards as the stream (DV/column-mapping
    tables reject loudly — ``sources/delta_log.read_delta_snapshot`` is
    the full-semantics reader)."""

    def __init__(self, schema: StructType, options: dict):
        self._path = options["path"]
        self._schema = schema
        v = options.get("versionasof")
        self._version = int(v) if v is not None else None

    def partitions(self) -> list[InputPartition]:
        cols = [f.name for f in self._schema.fields]
        return [_FilePartition(p, cols)
                for p in _live_files(self._path, self._version)]

    def read(self, partition: InputPartition
             ) -> Iterator["pa.RecordBatch"]:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path, columns=partition.columns)
        yield from table.to_batches()


class DeltaJarlessDataSource(DataSource):
    """``spark.dataSource.register(DeltaJarlessDataSource)`` then
    ``spark.read.format("delta_jarless").option("path", t).load()`` for a
    snapshot (``versionAsOf`` optional) or ``spark.readStream`` for the
    commit stream."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("delta_jarless requires .option('path', ...)")
        v = self.options.get("versionasof")
        meta = _snapshot_meta(path, _log_versions(path),
                              up_to=int(v) if v is not None else None)
        return StructType.fromJson(json.loads(meta["schemaString"]))

    def reader(self, schema: StructType) -> DataSourceReader:
        v = self.options.get("versionasof")
        _snapshot_meta(self.options["path"],
                       _log_versions(self.options["path"]),
                       up_to=int(v) if v is not None else None)
        return DeltaLogBatchReader(schema, dict(self.options))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        # re-run the guards with the resolved schema (schema() may be
        # skipped when the user supplies one explicitly)
        _snapshot_meta(self.options["path"],
                       _log_versions(self.options["path"]))
        return DeltaLogStreamReader(schema, dict(self.options))


def register_delta_stream_source(spark) -> None:
    """Idempotent registration of the format for this session."""
    spark.dataSource.register(DeltaJarlessDataSource)
