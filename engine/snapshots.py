"""Iceberg-shaped snapshot table: append snapshots + manifests + time travel.

The north-rule targets an Iceberg checkpoint/lineage table; this sandbox ships
neither Iceberg jars nor pyiceberg, so this module emulates the metadata layer
the engine relies on, with the same semantics a real Iceberg catalog provides:

  * every append is a SNAPSHOT: an immutable data directory plus a JSON
    manifest (snapshot_id, parent_snapshot_id, timestamp, operation, added
    files/rows, properties) under ``<path>/metadata/``;
  * reads resolve the manifest chain — ``read()`` is the current table,
    ``time_travel(snapshot_id)`` reconstructs the table as of that snapshot
    (append-only semantics: the file set is the union of all manifests up to
    and including it);
  * manifests are written atomically (tmp + rename), so a crashed append
    leaves no half-visible snapshot — the recovery property the checkpoint
    runner's resume depends on.

On a real deployment the engine swaps this for ``df.writeTo(table).append()``
against an Iceberg catalog and ``spark.read.option("snapshot-id", ...)``; the
CheckpointedRunner call sites are the seam.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """Single-writer append-snapshot table over parquet + JSON manifests."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.meta_dir = os.path.join(path, "metadata")
        self.data_dir = os.path.join(path, "data")

    # -- metadata ----------------------------------------------------------------
    def snapshots(self) -> list[dict]:
        """All snapshot manifests, oldest first."""
        if not os.path.isdir(self.meta_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.meta_dir)):
            if name.startswith("manifest-") and name.endswith(".json"):
                with open(os.path.join(self.meta_dir, name)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda m: m["snapshot_id"])

    def current_snapshot_id(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1]["snapshot_id"] if snaps else None

    # -- write -------------------------------------------------------------------
    def append(self, df: DataFrame, operation: str = "append",
               properties: dict | None = None) -> int:
        """Commit ``df`` as a new snapshot; returns its snapshot_id."""
        snaps = self.snapshots()
        parent = snaps[-1]["snapshot_id"] if snaps else None
        sid = (parent or 0) + 1
        snap_dir = os.path.join(self.data_dir, f"snap-{sid:08d}")
        # crash recovery (ADVICE r2): a crash AFTER the data write but BEFORE
        # the manifest commit leaves an orphan snap-{sid} dir; since sids are
        # deterministic, every retry would recompute the same sid and
        # errorifexists would block the table forever. A dir with no
        # committed manifest is by definition uncommitted -> clear it.
        if os.path.isdir(snap_dir) and not os.path.exists(
            os.path.join(self.meta_dir, f"manifest-{sid:08d}.json")
        ):
            import shutil

            shutil.rmtree(snap_dir)
        df.write.mode("errorifexists").parquet(snap_dir)
        added = sorted(
            os.path.join(f"snap-{sid:08d}", f)
            for f in os.listdir(snap_dir)
            if f.endswith(".parquet")
        )
        rows = self.spark.read.parquet(snap_dir).count()
        manifest = {
            "snapshot_id": sid,
            "parent_snapshot_id": parent,
            "timestamp_ms": int(time.time() * 1000),
            "operation": operation,
            "added_files": added,
            "added_rows": rows,
            "properties": properties or {},
        }
        os.makedirs(self.meta_dir, exist_ok=True)
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, os.path.join(self.meta_dir, f"manifest-{sid:08d}.json"))
        return sid

    # -- read --------------------------------------------------------------------
    def _dirs_as_of(self, snapshot_id: int | None) -> list[str]:
        snaps = self.snapshots()
        if snapshot_id is not None:
            snaps = [m for m in snaps if m["snapshot_id"] <= snapshot_id]
        dirs = {
            os.path.join(self.data_dir, os.path.dirname(f))
            for m in snaps
            for f in m["added_files"]
        }
        return sorted(dirs)

    def read(self, as_of: int | None = None) -> DataFrame | None:
        """Current table state, or the state as of ``as_of`` (inclusive).
        Returns None when no snapshot exists yet."""
        dirs = self._dirs_as_of(as_of)
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def time_travel(self, snapshot_id: int) -> DataFrame:
        df = self.read(as_of=snapshot_id)
        if df is None:
            raise ValueError(f"no snapshot <= {snapshot_id}")
        return df
