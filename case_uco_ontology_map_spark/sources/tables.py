"""Snapshot table layer: Iceberg-like semantics over parquet + a JSON
manifest (M5 / SURVEY.md §7: "abstract the table layer ... so the semantics
(snapshot, resume) still hold and the Iceberg path is a config flag").

Why not Iceberg directly: the iceberg-spark-runtime jar is not in this
container (SURVEY.md risk list). This layer gives the two properties the
pipeline needs from it — atomic snapshot commits and time-travel reads —
over plain parquet, behind an API small enough to swap for
``spark.read.format("iceberg")`` by changing one writer/reader pair.

Layout:
  <table>/data/<snapshot_id>/part-*.parquet      immutable data files
  <table>/snapshots/<snapshot_id>.json           snapshot metadata
  <table>/HEAD                                    current snapshot id (atomic
                                                  rename commit)

Commit protocol: write data dir → write snapshot json → atomic rename of a
temp HEAD. Readers resolve HEAD (or an explicit snapshot id) and read only
the data dirs listed in that snapshot's lineage — so a reader never sees a
half-written commit, and any historical snapshot stays readable (exact
resume + audit).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.snap_dir = os.path.join(path, "snapshots")
        self.head_path = os.path.join(path, "HEAD")

    # -- commit ----------------------------------------------------------
    def append(
        self, df: DataFrame, properties: Optional[Dict[str, Any]] = None
    ) -> str:
        """Append df as a new snapshot (previous snapshots' files included
        by reference). Returns the snapshot id."""
        return self._commit(df, mode="append", properties=properties)

    def overwrite(
        self, df: DataFrame, properties: Optional[Dict[str, Any]] = None
    ) -> str:
        """Replace table contents in a new snapshot (old snapshots stay
        readable — time travel)."""
        return self._commit(df, mode="overwrite", properties=properties)

    def _next_snapshot_id(self) -> int:
        """One past the max EXISTING snapshot json (not HEAD): a crash
        between data write and HEAD rename must not wedge the next commit
        into an already-used id."""
        ids = [0]
        if os.path.isdir(self.snap_dir):
            for f in os.listdir(self.snap_dir):
                if f.endswith(".json"):
                    try:
                        ids.append(int(f[:-5]))
                    except ValueError:
                        pass
        head = self.current_snapshot_id()
        if head is not None:
            ids.append(int(head))
        return max(ids) + 1

    def _commit(self, df: DataFrame, mode: str, properties) -> str:
        """Crash-safe commit: data is staged under a UNIQUE dir name
        (uuid-suffixed, never reused), the snapshot json claims its id via
        exclusive create (two concurrent committers can't both win an id),
        and HEAD flips last by atomic rename. A crash at any earlier point
        leaves only an orphaned data dir / unclaimed json — both inert:
        readers resolve HEAD and follow data_dirs, and the next commit
        picks a fresh id and a fresh data dir."""
        import uuid as _uuid

        os.makedirs(self.snap_dir, exist_ok=True)
        parent = self.current_snapshot_id()
        data_name = f"{_uuid.uuid4().hex[:12]}"
        out = os.path.join(self.data_dir, data_name)
        df.write.mode("error").parquet(out)

        dirs: List[str] = [data_name]
        if mode == "append" and parent is not None:
            dirs = self._snapshot(parent)["data_dirs"] + [data_name]
        while True:
            snap_id = f"{self._next_snapshot_id():012d}"
            meta = {
                "snapshot_id": snap_id,
                "parent": parent,
                "mode": mode,
                "data_dirs": dirs,
                "committed_at": time.time(),
                "properties": properties or {},
            }
            try:
                # O_EXCL claim: loser of a concurrent race retries next id
                with open(
                    os.path.join(self.snap_dir, f"{snap_id}.json"), "x"
                ) as fh:
                    json.dump(meta, fh)
                break
            except FileExistsError:
                continue
        tmp = self.head_path + f".tmp.{data_name}"
        with open(tmp, "w") as fh:
            fh.write(snap_id)
        os.replace(tmp, self.head_path)  # atomic commit point
        return snap_id

    # -- read ------------------------------------------------------------
    def current_snapshot_id(self) -> Optional[str]:
        try:
            with open(self.head_path) as fh:
                return fh.read().strip()
        except OSError:
            return None

    def _snapshot(self, snap_id: str) -> Dict[str, Any]:
        with open(os.path.join(self.snap_dir, f"{snap_id}.json")) as fh:
            return json.load(fh)

    def snapshots(self) -> List[Dict[str, Any]]:
        if not os.path.isdir(self.snap_dir):
            return []
        out = []
        for f in sorted(os.listdir(self.snap_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.snap_dir, f)) as fh:
                    out.append(json.load(fh))
        return out

    def read(
        self, spark: SparkSession, snapshot_id: Optional[str] = None
    ) -> DataFrame:
        """Read the table at HEAD or at any historical snapshot id."""
        snap_id = snapshot_id or self.current_snapshot_id()
        if snap_id is None:
            raise FileNotFoundError(f"table {self.path} has no snapshots")
        meta = self._snapshot(snap_id)
        paths = [os.path.join(self.data_dir, d) for d in meta["data_dirs"]]
        return spark.read.parquet(*paths)
