"""Model-based randomized differential test for the jar-less Delta reader:
a seeded generator drives a random commit history (appends, whole-file
deletes, deletion-vector deletes, classic AND v2 checkpoints) against a
plain-Python model of the table state per version; every version's
snapshot read must match the model EXACTLY, and timestamp resolution must
land on the pinned commit clocks.

This exercises interactions no hand-written fixture covers: DVs layered
over checkpointed state, checkpoints mid-history with truncated prefixes
left intact, removes of DV-bearing files, multiple DVs per snapshot —
across several seeds."""

from __future__ import annotations

import json
import os
import random
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databricks_import_pyspark_scripts_spark.sources.delta_dv import (
    make_uuid_path_or_inline,
    serialize_bitmap_array,
    write_dv_file,
)
from databricks_import_pyspark_scripts_spark.sources.delta_log import (
    read_delta_snapshot,
    resolve_version_at_timestamp,
)

BASE_TS = 1700000000000


def _schema_string() -> str:
    return json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "val", "type": "double", "nullable": True, "metadata": {}},
    ]})


class _TableBuilder:
    """Writes a random-but-modeled Delta table; tracks expected live ids
    per version."""

    def __init__(self, root: str, rng: random.Random):
        self.root = root
        self.log = os.path.join(root, "_delta_log")
        os.makedirs(self.log, exist_ok=True)
        self.rng = rng
        self.next_id = 0
        self.version = -1
        # path -> (all ids in file order, set of DELETED row indexes)
        self.files: dict[str, tuple[list[int], set[int]]] = {}
        self.expected: dict[int, set[int]] = {}  # version -> live ids

    def _commit(self, actions: list[dict]) -> None:
        self.version += 1
        ts = BASE_TS + self.version * 1000
        head = [{"commitInfo": {"timestamp": ts, "operation": "X"}}]
        if self.version == 0:
            head += [
                {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                              "readerFeatures": ["deletionVectors",
                                                 "v2Checkpoint"],
                              "writerFeatures": ["deletionVectors",
                                                 "v2Checkpoint"]}},
                {"metaData": {"id": str(uuid.uuid4()),
                              "format": {"provider": "parquet",
                                         "options": {}},
                              "schemaString": _schema_string(),
                              "partitionColumns": [],
                              "configuration": {},
                              "createdTime": ts}},
            ]
        with open(os.path.join(self.log,
                               f"{self.version:020d}.json"), "w") as f:
            for a in head + actions:
                f.write(json.dumps(a) + "\n")
        self.expected[self.version] = {
            i for ids, dead in self.files.values()
            for pos, i in enumerate(ids) if pos not in dead}

    def _add_action(self, path: str, dv: dict | None = None) -> dict:
        a = {"path": path, "partitionValues": {}, "size": 1,
             "modificationTime": 1, "dataChange": True}
        if dv:
            a["deletionVector"] = dv
        return {"add": a}

    def append(self) -> None:
        n = self.rng.randint(1, 8)
        ids = list(range(self.next_id, self.next_id + n))
        self.next_id += n
        path = f"f{uuid.uuid4().hex[:12]}.parquet"
        pq.write_table(pa.table({
            "id": pa.array(ids, pa.int64()),
            "val": pa.array([i * 1.5 for i in ids], pa.float64())}),
            os.path.join(self.root, path))
        self.files[path] = (ids, set())
        self._commit([self._add_action(path)])

    def whole_file_delete(self) -> None:
        path = self.rng.choice(sorted(self.files))
        del self.files[path]
        self._commit([{"remove": {"path": path, "deletionTimestamp": 1,
                                  "dataChange": True,
                                  "partitionValues": {}}}])

    def dv_delete(self) -> None:
        """Mark 1..k random surviving rows of one file deleted via a DV
        carrying the file's FULL deleted set (DVs replace, not stack)."""
        candidates = [p for p, (ids, dead) in self.files.items()
                      if len(dead) < len(ids)]
        if not candidates:
            self.append()
            return
        path = self.rng.choice(sorted(candidates))
        ids, dead = self.files[path]
        alive = [pos for pos in range(len(ids)) if pos not in dead]
        kill = set(self.rng.sample(alive,
                                   self.rng.randint(1, len(alive))))
        new_dead = dead | kill
        self.files[path] = (ids, new_dead)
        u = uuid.uuid4()
        (offset, size), = write_dv_file(
            os.path.join(self.root, f"deletion_vector_{u}.bin"),
            [serialize_bitmap_array(sorted(new_dead))])
        dv = {"storageType": "u",
              "pathOrInlineDv": make_uuid_path_or_inline(u),
              "offset": offset, "sizeInBytes": size,
              "cardinality": len(new_dead)}
        self._commit([
            {"remove": {"path": path, "deletionTimestamp": 1,
                        "dataChange": True, "partitionValues": {}}},
            self._add_action(path, dv)])

@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_history_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    b = _TableBuilder(str(tmp_path / f"t{seed}"), rng)
    b.append()  # v0 must exist
    for _ in range(9):
        op = rng.random()
        if op < 0.45 or len(b.files) < 2:
            b.append()
        elif op < 0.65:
            b.whole_file_delete()
        else:
            b.dv_delete()
    # checkpoint an EARLIER version mid-history (classic/v2 alternating by
    # seed), commits left intact — replay must prefer the checkpoint and
    # still serve every version both below and above it
    cp_at = b.version - 2
    if cp_at >= 1:
        from delta_fixture import write_checkpoint, write_v2_checkpoint

        from databricks_import_pyspark_scripts_spark.sources.delta_log import (
            replay_log,
        )
        rep = replay_log(spark, b.root, cp_at)
        actions = [{"protocol": rep.protocol}, {"metaData": rep.metadata}]
        actions += [{"add": a} for a in rep.files.values()]
        if seed % 2:
            write_v2_checkpoint(b.root, cp_at, actions)
        else:
            write_checkpoint(spark, b.root, cp_at, actions)

    for v, want in b.expected.items():
        got = {r.id for r in
               read_delta_snapshot(spark, b.root, v).collect()}
        assert got == want, f"seed {seed} version {v}"
        # values survive DV filtering untouched
        vals = {(r.id, r.val) for r in
                read_delta_snapshot(spark, b.root, v).collect()}
        assert vals == {(i, i * 1.5) for i in want}
    # timestamp resolution lands on each pinned commit clock (+500 ms
    # probes the half-open interval; the head uses its exact clock since
    # anything past it correctly raises)
    for v in (0, b.version // 2):
        assert resolve_version_at_timestamp(
            spark, b.root, BASE_TS + v * 1000 + 500) == v
    assert resolve_version_at_timestamp(
        spark, b.root, BASE_TS + b.version * 1000) == b.version
