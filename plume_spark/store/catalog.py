"""Snapshot-atomic parquet table store (Iceberg-semantics, zero extra jars).

The reference persists through six pluggable graph backends behind one driver
interface (drivers/base/.../IDriver.scala:24-52).  Our single backend is an
Iceberg-style table layout on plain parquet:

    <root>/<table>/data/<commit-uuid>/part-*.parquet     immutable data files
    <root>/<table>/_snapshots/v{N}.json                  manifest: file list + stats
    <root>/<table>/_current                              atomic pointer (os.replace)

Semantics mirrored from Iceberg (and why they matter at 100 TB):
* APPEND never rewrites existing files — a manifest is previous files + new;
* commits are atomic: data lands first, the pointer flips last, so a killed
  run leaves either the old or the new snapshot, never a torn table
  (the resume-idempotency substrate of the north rule);
* snapshots are retained -> time travel (``read(snapshot_id=...)``) and
  snapshot-diff incremental processing (the reference's changed-files-only
  rebuild, CHANGELOG.md:179);
* per-commit row counts in the manifest = the ``bulkTx`` delta-size return
  (drivers/overflowdb/.../OverflowDbDriver.scala:70).

On a real cluster this class is replaced 1:1 by Iceberg
(``df.writeTo("cat.db.t").append()`` / ``MERGE INTO``); the GraphStore API
above it is written against this minimal surface so the swap is confined here.
Single-writer per table is assumed (Iceberg's optimistic-concurrency loop is
out of scope for the sandbox).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str, schema: T.StructType | None = None):
        self.spark = spark
        self.path = path
        self.schema = schema
        os.makedirs(os.path.join(path, "_snapshots"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # ------------------------------------------------------------- manifests

    def _current_version(self) -> int:
        p = os.path.join(self.path, "_current")
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return int(f.read().strip())

    def _manifest(self, version: int) -> dict:
        if version == 0:
            return {"version": 0, "files": [], "row_count": 0, "parent": None}
        with open(os.path.join(self.path, "_snapshots", f"v{version}.json")) as f:
            return json.load(f)

    def _commit(self, files: list[str], row_count: int, operation: str) -> int:
        parent = self._current_version()
        version = parent + 1
        manifest = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "files": files,
            "row_count": row_count,
            "committed_at": time.time(),
        }
        mpath = os.path.join(self.path, "_snapshots", f"v{version}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        # atomic pointer flip — the commit point
        tmp = os.path.join(self.path, f"_current.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.path, "_current"))
        return version

    def _write_files(self, df: DataFrame) -> tuple[list[str], int]:
        """Materialize df as immutable parquet files under a fresh commit dir."""
        commit_dir = f"data/{uuid.uuid4().hex}"
        out = os.path.join(self.path, commit_dir)
        df.write.mode("overwrite").parquet(out)
        files = [
            f"{commit_dir}/{f}"
            for f in os.listdir(out)
            if f.endswith(".parquet")
        ]
        n = self.spark.read.parquet(out).count() if files else 0
        return files, n

    # ------------------------------------------------------------ operations

    def append(self, df: DataFrame) -> int:
        """Append-only commit: no existing file is touched."""
        files, n = self._write_files(df)
        prev = self._manifest(self._current_version())
        return self._commit(prev["files"] + files, prev["row_count"] + n, "append")

    def overwrite(self, df: DataFrame) -> int:
        files, n = self._write_files(df)
        return self._commit(files, n, "overwrite")

    def truncate(self) -> int:
        """S8 destructive clear (the `MATCH (n) DETACH DELETE n` analog,
        drivers/neo4j/.../Neo4jDriver.scala:37-45) — as a new empty snapshot,
        so history survives (Iceberg TRUNCATE semantics)."""
        return self._commit([], 0, "truncate")

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        version = self._current_version() if snapshot_id is None else snapshot_id
        m = self._manifest(version)
        if not m["files"]:
            if self.schema is None:
                raise ValueError(f"empty table {self.path} with no declared schema")
            return self.spark.createDataFrame([], schema=self.schema)
        paths = [os.path.join(self.path, f) for f in m["files"]]
        return self.spark.read.parquet(*paths)

    def merge_insert(self, df: DataFrame, keys: list[str]) -> int:
        """MERGE ... WHEN NOT MATCHED THEN INSERT (the idempotent-upsert path,
        Cypher MERGE at drivers/neo4j/.../Neo4jDriver.scala:119).

        Implemented append-only: anti-join the incoming rows against current
        keys, append survivors.  Incoming duplicates are collapsed first, so
        a double-write is a no-op (idempotency contract).
        """
        current = self.read().select(*keys)
        new = df.dropDuplicates(keys).join(current, keys, "left_anti")
        return self.append(new)

    def merge_upsert(self, df: DataFrame, keys: list[str]) -> int:
        """MERGE with WHEN MATCHED THEN UPDATE — copy-on-write rewrite, like
        Iceberg COW MERGE.  Incoming rows win on key collision."""
        current = self.read()
        kept = current.join(df.select(*keys).distinct(), keys, "left_anti")
        return self.overwrite(kept.unionByName(df.dropDuplicates(keys)))

    def delete_where(self, condition: str) -> int:
        """DELETE FROM t WHERE cond — COW rewrite of the survivors.

        Survivors are rows where cond is NOT TRUE (false or NULL): SQL DELETE
        only removes rows where the predicate evaluates to true, so a bare
        ``NOT (cond)`` would wrongly drop NULL-predicate rows too.
        """
        from pyspark.sql import functions as F

        keep = ~F.coalesce(F.expr(condition), F.lit(False))
        return self.overwrite(self.read().filter(keep))

    # ------------------------------------------------------------ metadata

    def snapshots(self) -> list[dict]:
        out = []
        v = self._current_version()
        while v:
            m = self._manifest(v)
            out.append(m)
            v = m["parent"] or 0
        return list(reversed(out))

    def row_count(self) -> int:
        """O(1) from manifest stats — no scan (Iceberg snapshot summary)."""
        return self._manifest(self._current_version())["row_count"]

    def changed_since(self, snapshot_id: int) -> DataFrame:
        """Snapshot-diff read: rows in files added after ``snapshot_id`` —
        the incremental-rebuild primitive (CHANGELOG.md:179 changed-files-only)."""
        old = set(self._manifest(snapshot_id)["files"])
        cur = self._manifest(self._current_version())
        new_files = [os.path.join(self.path, f) for f in cur["files"] if f not in old]
        if not new_files:
            return self.spark.createDataFrame([], schema=self.read().schema)
        return self.spark.read.parquet(*new_files)

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)


class SnapshotStore:
    """Catalog of SnapshotTables rooted at a directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str, schema: T.StructType | None = None) -> SnapshotTable:
        return SnapshotTable(self.spark, os.path.join(self.root, name), schema)

    def tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d, "_snapshots"))
        )
