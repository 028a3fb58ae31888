"""Snapshot-manifest tables: Iceberg-style commit/pin semantics on
plain parquet (SURVEY §7.3 item 7 — Iceberg jars are not in this
sandbox; this keeps the same API surface so swapping to
``df.writeTo(table)`` / ``option("snapshot-id", ...)`` is mechanical).

Layout:

    table_dir/
      data/<snapshot_id>/part-*.parquet     (immutable per snapshot)
      snapshots/<snapshot_id>.json          (manifest: files, counts, parent)
      HEAD                                  (atomic pointer to current id)

Guarantees:
* writers commit atomically (data fully written before the manifest,
  manifest before HEAD flips; HEAD flip is os.replace)
* readers pin a snapshot id and see an immutable file list — the
  reference's ``id <= watermark`` scan-stability trick
  (db/schema.rs:550-558, mod.rs:6410-6413) without any key column
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["SnapshotTable"]


class SnapshotTable:
    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)

    # --- write side ---------------------------------------------------------

    def commit(self, df: DataFrame, parent: str | None = None) -> str:
        """Write a new immutable snapshot, returns its id."""
        snap_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        data_dir = os.path.join(self.path, "data", snap_id)
        df.write.mode("errorifexists").parquet(data_dir)
        files = sorted(
            f for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
        manifest = {
            "snapshot_id": snap_id,
            "parent": parent if parent is not None else self.current_snapshot(),
            "committed_at": time.time(),
            "data_dir": data_dir,
            "files": files,
        }
        mpath = os.path.join(self.path, "snapshots", f"{snap_id}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mpath)
        head_tmp = os.path.join(self.path, "HEAD.tmp")
        with open(head_tmp, "w") as f:
            f.write(snap_id)
            f.flush()
            os.fsync(f.fileno())
        os.replace(head_tmp, os.path.join(self.path, "HEAD"))
        return snap_id

    # --- read side ----------------------------------------------------------

    def current_snapshot(self) -> str | None:
        head = os.path.join(self.path, "HEAD")
        if not os.path.exists(head):
            return None
        with open(head) as f:
            return f.read().strip() or None

    def snapshots(self) -> list[dict]:
        out = []
        sdir = os.path.join(self.path, "snapshots")
        for name in sorted(os.listdir(sdir)):
            if name.endswith(".json"):
                with open(os.path.join(sdir, name)) as f:
                    out.append(json.load(f))
        return out

    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        """Read HEAD or a pinned snapshot — the pinned file list is
        immutable, so a long job sees one consistent version even while
        writers commit new snapshots."""
        snap_id = snapshot_id or self.current_snapshot()
        if snap_id is None:
            raise FileNotFoundError(f"no snapshot committed at {self.path}")
        mpath = os.path.join(self.path, "snapshots", f"{snap_id}.json")
        with open(mpath) as f:
            manifest = json.load(f)
        paths = [os.path.join(manifest["data_dir"], p) for p in manifest["files"]]
        return spark.read.parquet(*paths)
