"""Manifest-committed Parquet tables with per-append lineage.

Stands in for Iceberg in this sandbox (no Iceberg runtime jar is available):
same write discipline, toy-scale implementation —

- every append writes a fresh snapshot directory, then commits it by
  atomically replacing ``manifest.json`` (``os.replace``, the same atomic
  primitive the reference uses for its CSV rewrite dance,
  scrapper/core/storage.py:53-82 — but appends here are O(new data), never a
  full-table rewrite);
- the manifest records per-append lineage: round, stage, row count, snapshot
  id — the "per-partition lineage manifests" of the north_rule (file-level
  lineage; Iceberg would track per-data-file stats natively);
- reads list committed snapshot dirs only, so a crashed half-written append
  is invisible (snapshot isolation for a single writer).

In production every call site maps 1:1 onto Iceberg:
``append(df)`` → ``df.writeTo(tbl).append()``; ``read`` → catalog table scan;
manifest lineage → Iceberg snapshot summary + manifests.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession


def _rows_from_footers(path: str) -> int:
    """Row count from parquet footers on the local FS — no Spark job.

    On a real cluster this is the Iceberg snapshot summary (row counts are
    manifest metadata there too; never re-scan data to count it)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


class ParquetTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.name = name
        os.makedirs(self.dir, exist_ok=True)
        self._manifest_path = os.path.join(self.dir, "manifest.json")
        # Serializes the manifest read-modify-commit so key-disjoint appends
        # (e.g. the engine's per-round insert + update deltas) can run as
        # CONCURRENT Spark jobs; the parquet writes themselves go to unique
        # snapshot dirs and never contend. Iceberg gives the same guarantee
        # via optimistic snapshot commits.
        self._commit_lock = threading.Lock()
        # snapshot ordinal allocator — taken under the lock so concurrent
        # appends can't mint the same numeric prefix (ADVICE r5); seeded
        # from the persisted manifest so reopened tables keep counting up
        self._snap_counter = len(self._manifest()["snapshots"])

    # ------------------------------------------------------------ manifest
    def _manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshots": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    # ------------------------------------------------------------------ io
    def append(
        self,
        df: DataFrame,
        *,
        round_idx: int = -1,
        stage: str = "",
        partition_by: list[str] | None = None,
    ) -> int:
        return self.append_with_path(
            df, round_idx=round_idx, stage=stage, partition_by=partition_by
        )[0]

    def append_with_path(
        self,
        df: DataFrame,
        *,
        round_idx: int = -1,
        stage: str = "",
        partition_by: list[str] | None = None,
    ) -> tuple[int, str]:
        """Append a snapshot and return ``(rows, snapshot_path)`` — callers
        that read the delta back must name THIS snapshot, not "the latest"
        (another thread's append may have committed since)."""
        with self._commit_lock:
            ordinal = self._snap_counter
            self._snap_counter += 1
        snap_id = f"snap-{ordinal:05d}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(self.dir, snap_id)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        rows = _rows_from_footers(path)
        with self._commit_lock:
            m = self._manifest()
            m["snapshots"].append(
                {
                    "id": snap_id,
                    "path": path,
                    "rows": rows,
                    "round": round_idx,
                    "stage": stage,
                }
            )
            self._commit(m)
        return rows, path

    def overwrite(self, df: DataFrame, *, round_idx: int = -1, stage: str = "") -> int:
        """Replace table contents (used by checkpoint snapshots)."""
        old = [s["path"] for s in self._manifest()["snapshots"]]
        snap_id = f"snap-{uuid.uuid4().hex[:8]}"
        path = os.path.join(self.dir, snap_id)
        df.write.mode("overwrite").parquet(path)
        rows = _rows_from_footers(path)
        with self._commit_lock:
            self._commit(
                {"snapshots": [{"id": snap_id, "path": path, "rows": rows,
                                "round": round_idx, "stage": stage}]}
            )
            self._snap_counter = 1
        for p in old:
            shutil.rmtree(p, ignore_errors=True)
        return rows

    def read(self, spark: SparkSession) -> DataFrame | None:
        # zero-row snapshots have no parquet files (schema inference would
        # fail) — the manifest row count lets us skip them
        paths = [
            s["path"] for s in self._manifest()["snapshots"] if s["rows"] > 0
        ]
        if not paths:
            return None
        if len(paths) == 1:
            return spark.read.parquet(paths[0])
        # Snapshots may be individually partitioned (k=v subdirs); reading
        # them as one multi-path scan trips partition discovery, so union
        # per-snapshot scans (Iceberg reads via manifests and has no such
        # issue).
        dfs = [spark.read.parquet(p) for p in paths]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def read_versioned(self, spark: SparkSession) -> "DataFrame | None":
        """Union of committed snapshots with a ``_seq`` commit-order column.

        Lets callers reconcile delta snapshots latest-wins (the sandbox
        stand-in for Iceberg MERGE INTO / position deletes): write status
        transitions as O(batch) delta appends, resolve on read with a window
        over ``_seq``. Compaction (overwrite with the reconciled view) resets
        the history to one snapshot."""
        from pyspark.sql import functions as F

        snaps = [s for s in self._manifest()["snapshots"] if s["rows"] > 0]
        if not snaps:
            return None
        out = None
        for i, s in enumerate(snaps):
            df = spark.read.parquet(s["path"]).withColumn("_seq", F.lit(i))
            out = df if out is None else out.unionByName(df)
        return out

    def snapshot_paths(self, stages: set[str] | None = None) -> list[str]:
        """Data paths of committed snapshots, optionally filtered by stage."""
        return [
            s["path"]
            for s in self._manifest()["snapshots"]
            if s["rows"] > 0 and (stages is None or s["stage"] in stages)
        ]

    def lineage(self) -> list[dict]:
        return self._manifest()["snapshots"]

    def exists(self) -> bool:
        return bool(self._manifest()["snapshots"])
