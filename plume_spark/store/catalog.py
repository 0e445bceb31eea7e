"""Snapshot-atomic parquet table store (Iceberg-semantics, zero extra jars).

The reference persists through six pluggable graph backends behind one driver
interface (drivers/base/.../IDriver.scala:24-52).  Our single backend is an
Iceberg-style table layout on plain parquet:

    <root>/<table>/data/<commit-uuid>/[_bucket=N/]part-*.parquet  immutable data
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
  (drivers/overflowdb/.../OverflowDbDriver.scala:70);
* LAYOUT: a table may declare hash-bucketing on a key plus a within-file sort
  order (``TableLayout``) — the Spark recast of the reference's secondary
  indexes (drivers/neo4j/.../Neo4jDriver.scala:277-285 CREATE INDEX; the
  OverflowDB heap index OverflowDbDriver.scala:49).  Each data file records
  its bucket id and per-column min/max (read from the parquet footer via
  pyarrow), and ``read(point=...)`` opens only the files that can contain the
  probed key — file skipping, not full scans, is what a point lookup costs.

On a real cluster this class is replaced 1:1 by Iceberg
(``df.writeTo("cat.db.t").append()`` / ``MERGE INTO`` with
``PARTITIONED BY (bucket(N, key))`` + ``WRITE ORDERED BY``); the GraphStore
API above it is written against this minimal surface so the swap is confined
here.  Single-writer per table is assumed (Iceberg's optimistic-concurrency
loop is out of scope for the sandbox).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class TableLayout:
    """Physical layout contract for a SnapshotTable.

    ``bucket_by``: hash-bucket key — rows land in ``pmod(xxhash64(key), n)``
    directories, so a point read on the key opens 1/n of the files;
    ``sort_by``: within-file sort order — tightens parquet min/max stats for
    the listed columns (range pruning), and gives run-length-friendly pages;
    ``stats_cols``: columns whose per-file min/max go into the manifest.
    """

    bucket_by: str | None = None
    n_buckets: int = 16
    sort_by: tuple[str, ...] = ()
    stats_cols: tuple[str, ...] = ()


def _file_stats(abs_path: str, stats_cols: tuple[str, ...]) -> tuple[int, dict]:
    """(row_count, {col: [min, max]}) from the parquet footer — no data scan.
    The same metadata Iceberg keeps in its manifests."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    stats: dict[str, list] = {}
    for col in stats_cols:
        i = names.get(col)
        if i is None:
            continue
        lo = hi = None
        complete = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                complete = False
                break
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        if complete and lo is not None:
            stats[col] = [lo, hi]
    return md.num_rows, stats


class SnapshotTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType | None = None,
        layout: TableLayout | None = None,
    ):
        self.spark = spark
        self.path = path
        self.schema = schema
        self.layout = layout
        os.makedirs(os.path.join(path, "_snapshots"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        # the bucket modulus is TABLE state, not constructor state: a process
        # reopening a table that ``rebucket`` grew must probe with the modulus
        # the data was written under, or bucket pruning silently reads the
        # wrong files.  The current manifest is authoritative.
        if layout and layout.bucket_by:
            persisted = self._manifest(self._current_version()).get("n_buckets")
            if persisted and persisted != layout.n_buckets:
                from dataclasses import replace

                self.layout = replace(layout, n_buckets=persisted)

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

    @staticmethod
    def _entries(manifest: dict) -> list[dict]:
        """Normalize manifest file entries (older manifests stored bare paths)."""
        return [
            e if isinstance(e, dict) else {"path": e, "bucket": None, "stats": {}, "rows": None}
            for e in manifest["files"]
        ]

    def _commit(self, files: list[dict], row_count: int, operation: str) -> int:
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
        if self.layout and self.layout.bucket_by:
            manifest["n_buckets"] = self.layout.n_buckets
        mpath = os.path.join(self.path, "_snapshots", f"v{version}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        # atomic pointer flip — the commit point
        tmp = os.path.join(self.path, f"_current.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.path, "_current"))
        return version

    def _write_files(self, df: DataFrame) -> tuple[list[dict], int]:
        """Materialize df as immutable parquet files under a fresh commit dir,
        honoring the table layout (bucketing + sort), and harvest per-file
        footer stats into manifest entries."""
        commit_dir = f"data/{uuid.uuid4().hex}"
        out = os.path.join(self.path, commit_dir)
        lay = self.layout
        if lay and lay.bucket_by and lay.bucket_by in df.columns:
            bucketed = df.withColumn(
                "_bucket",
                F.pmod(F.xxhash64(lay.bucket_by), F.lit(lay.n_buckets)).cast("int"),
            ).repartition(lay.n_buckets, "_bucket")
            sort_cols = [c for c in (lay.sort_by or ()) if c in df.columns]
            if sort_cols:
                bucketed = bucketed.sortWithinPartitions(*sort_cols)
            bucketed.write.mode("overwrite").partitionBy("_bucket").parquet(out)
        else:
            towrite = df
            sort_cols = [c for c in ((lay.sort_by if lay else ()) or ()) if c in df.columns]
            if sort_cols:
                towrite = towrite.sortWithinPartitions(*sort_cols)
            towrite.write.mode("overwrite").parquet(out)
        entries: list[dict] = []
        total = 0
        stats_cols = tuple(lay.stats_cols) if lay else ()
        for dirpath, _dirs, fnames in os.walk(out):
            for fname in sorted(fnames):
                if not fname.endswith(".parquet"):
                    continue
                abs_path = os.path.join(dirpath, fname)
                rel = os.path.relpath(abs_path, self.path)
                bucket = None
                comp = os.path.basename(dirpath)
                if comp.startswith("_bucket="):
                    bucket = int(comp.split("=", 1)[1])
                rows, stats = _file_stats(abs_path, stats_cols)
                total += rows
                entries.append({"path": rel, "bucket": bucket, "stats": stats, "rows": rows})
        return entries, total

    # ------------------------------------------------------------ operations

    def append(self, df: DataFrame) -> int:
        """Append-only commit: no existing file is touched."""
        files, n = self._write_files(df)
        prev = self._manifest(self._current_version())
        return self._commit(list(prev["files"]) + files, prev["row_count"] + n, "append")

    def overwrite(self, df: DataFrame) -> int:
        files, n = self._write_files(df)
        return self._commit(files, n, "overwrite")

    def truncate(self) -> int:
        """S8 destructive clear (the `MATCH (n) DETACH DELETE n` analog,
        drivers/neo4j/.../Neo4jDriver.scala:37-45) — as a new empty snapshot,
        so history survives (Iceberg TRUNCATE semantics)."""
        return self._commit([], 0, "truncate")

    def _bucket_of(self, value) -> int:
        """Bucket id of a key value, computed with the SAME hash Spark used at
        write time (xxhash64 on the declared column type) — one 1-row job."""
        lay = self.layout
        dtype = None
        if self.schema is not None:
            for f_ in self.schema.fields:
                if f_.name == lay.bucket_by:
                    dtype = f_.dataType
        lit = F.lit(value) if dtype is None else F.lit(value).cast(dtype)
        row = self.spark.range(1).select(
            F.pmod(F.xxhash64(lit), F.lit(lay.n_buckets)).cast("int").alias("b")
        ).first()
        return int(row["b"])

    def buckets_of(self, df: DataFrame, col: str) -> set[int]:
        """Bucket ids the given key column's values hash into — computed with
        the SAME xxhash64/pmod Spark applied at write time.  One small job
        over ``df`` (distinct over at most n_buckets ints); feed the result to
        ``read(buckets=...)`` for a batch-probe pruned scan: the multi-key
        generalization of ``read(point=...)``."""
        n = self.layout.n_buckets if self.layout else 16
        rows = (
            df.select(F.pmod(F.xxhash64(col), F.lit(n)).cast("int").alias("b"))
            .distinct()
            .collect()
        )
        return {int(r["b"]) for r in rows}

    def files_for(
        self,
        point: dict | None = None,
        snapshot_id: int | None = None,
        buckets: set[int] | None = None,
    ) -> list[str]:
        """Data files (relative paths) that can contain rows matching the
        equality ``point`` predicates — bucket pruning on the layout key,
        min/max pruning on stats columns.  ``buckets`` prunes to an explicit
        bucket-id set (from ``buckets_of``) — the probe side of an
        incremental join touches only the file-buckets the batch's keys hash
        into.  The pruning contract is conservative: a pruned-out file
        provably holds no matching row (unbucketed legacy files always
        survive bucket pruning)."""
        version = self._current_version() if snapshot_id is None else snapshot_id
        entries = self._entries(self._manifest(version))
        if not point and buckets is None:
            return [e["path"] for e in entries]
        lay = self.layout
        want_bucket = None
        if lay and lay.bucket_by and point and lay.bucket_by in point:
            want_bucket = self._bucket_of(point[lay.bucket_by])
        keep = []
        for e in entries:
            if want_bucket is not None and e.get("bucket") is not None and e["bucket"] != want_bucket:
                continue
            if buckets is not None and e.get("bucket") is not None and e["bucket"] not in buckets:
                continue
            stats = e.get("stats") or {}
            pruned = False
            for col, val in (point or {}).items():
                rng = stats.get(col)
                if rng is not None and not (rng[0] <= val <= rng[1]):
                    pruned = True
                    break
            if not pruned:
                keep.append(e["path"])
        return keep

    def read(
        self,
        snapshot_id: int | None = None,
        point: dict | None = None,
        buckets: set[int] | None = None,
    ) -> DataFrame:
        """Snapshot read; ``point`` = {col: value} equality hints and
        ``buckets`` = bucket-id set (from ``buckets_of``) are used ONLY to
        skip files (the returned frame still applies no filter itself — pair
        with ``.filter``/join for exactness; pruning is conservative so the
        filtered result is identical to a full scan)."""
        files = self.files_for(point, snapshot_id, buckets)
        if not files:
            if self.schema is None:
                raise ValueError(f"empty table {self.path} with no declared schema")
            return self.spark.createDataFrame([], schema=self.schema)
        paths = [os.path.join(self.path, f) for f in files]
        return self.spark.read.parquet(*paths)

    def merge_insert(self, df: DataFrame, keys: list[str], prune: bool = False) -> int:
        """MERGE ... WHEN NOT MATCHED THEN INSERT (the idempotent-upsert path,
        Cypher MERGE at drivers/neo4j/.../Neo4jDriver.scala:119).

        Implemented append-only: anti-join the incoming rows against current
        keys, append survivors.  Incoming duplicates are collapsed first, so
        a double-write is a no-op (idempotency contract).

        ``prune=True`` (requires the layout bucket key among ``keys``) reads
        only the file-buckets the incoming keys hash into for the anti-join —
        a matching current row must share the incoming row's bucket, so the
        pruned anti-join is exact while the MERGE cost tracks the BATCH, not
        the table (the per-epoch streaming-ingest path).  The incoming frame
        is consumed twice (bucket probe + anti-join): pass something cheap to
        recompute or already checkpointed.
        """
        lay = self.layout
        if prune and lay and lay.bucket_by and lay.bucket_by in keys:
            current = self.read(buckets=self.buckets_of(df, lay.bucket_by)).select(*keys)
        else:
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
        keep = ~F.coalesce(F.expr(condition), F.lit(False))
        return self.overwrite(self.read().filter(keep))

    # ---------------------------------------------------------- maintenance

    def compact(self, target_file_rows: int = 4_000_000, min_files: int = 2) -> int | None:
        """Small-file compaction — the Iceberg ``rewrite_data_files`` analog.

        Streaming/MERGE ingest commits a handful of files per micro-batch; at
        100 TB the FILE COUNT, not the byte count, becomes the bottleneck
        (driver memory for listings, a task per file, a footer open per file).
        Rewrites the current snapshot as one fresh layout-conforming fileset
        (re-bucketed, re-sorted, stats re-harvested) and commits it as a
        ``compact`` snapshot: same rows, fewer files, tighter min/max ranges.
        Old snapshots keep referencing the old files, so time travel is
        unaffected until ``expire_snapshots`` reclaims them.

        Returns the new snapshot id, or None when the table already holds
        ``min_files`` or fewer files (no-op — compaction must be idempotent
        and cheap to call on a schedule).
        """
        import math

        entries = self._entries(self._manifest(self._current_version()))
        lay = self.layout
        if lay and lay.bucket_by:
            # bucketed natural form: at most one file per bucket — already
            # there (no stray unbucketed files, no bucket split across files)
            buckets = [e.get("bucket") for e in entries]
            if None not in buckets and len(buckets) == len(set(buckets)):
                return None
        elif len(entries) <= min_files:
            return None
        df = self.read()
        if not (lay and lay.bucket_by and lay.bucket_by in df.columns):
            # unbucketed: bin-pack into ceil(rows/target) files (coalesce only
            # ever narrows, so a small table collapses to one file)
            n = max(1, math.ceil(self.row_count() / max(1, target_file_rows)))
            df = df.coalesce(n)
        files, cnt = self._write_files(df)
        return self._commit(files, cnt, "compact")

    def rebucket(self, n_buckets: int) -> int | None:
        """Rewrite the table under a new (larger) bucket modulus — the
        Iceberg ``REPLACE PARTITION FIELD bucket(N, key)`` + rewrite analog.

        A fixed modulus makes per-bucket size grow linearly with the table,
        so every bucket-pruned probe widens as an index ages (the round-3
        dedup-epoch probe's 60x drift).  Growing the modulus on a doubling
        schedule keeps rows-per-bucket bounded; the rewrite is O(table) but
        amortized O(1) per ingested row.  The new modulus is committed in the
        manifest, so later processes reopening the table probe with the
        modulus the data was actually written under."""
        from dataclasses import replace

        lay = self.layout
        if not (lay and lay.bucket_by) or n_buckets == lay.n_buckets:
            return None
        df = self.read()
        self.layout = replace(lay, n_buckets=n_buckets)
        files, cnt = self._write_files(df)
        return self._commit(files, cnt, "rebucket")

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Iceberg ``expire_snapshots`` analog: retain only the most recent
        ``keep_last`` snapshots, delete older manifests and every data file no
        retained snapshot references.  Bounds metadata + storage growth for
        always-on ingest, where every micro-batch is a commit.  Time travel
        remains valid for retained snapshots only (reads of expired ids fail
        loudly with the missing manifest, never silently serve partial data).
        """
        keep_last = max(1, keep_last)
        retained: list[int] = []
        v = self._current_version()
        while v and len(retained) < keep_last:
            retained.append(v)
            v = self._manifest(v)["parent"] or 0
        keep_files = {
            e["path"] for rv in retained for e in self._entries(self._manifest(rv))
        }
        removed_manifests = removed_files = 0
        snapdir = os.path.join(self.path, "_snapshots")
        for fname in os.listdir(snapdir):
            if not (fname.startswith("v") and fname.endswith(".json")):
                continue
            if int(fname[1:-5]) not in retained:
                os.remove(os.path.join(snapdir, fname))
                removed_manifests += 1
        datadir = os.path.join(self.path, "data")
        for dirpath, _dirs, fnames in os.walk(datadir, topdown=False):
            for fname in fnames:
                abs_p = os.path.join(dirpath, fname)
                if os.path.relpath(abs_p, self.path) not in keep_files:
                    os.remove(abs_p)  # also sweeps _SUCCESS markers of expired commits
                    removed_files += 1
            if dirpath != datadir and not os.listdir(dirpath):
                os.rmdir(dirpath)
        return {
            "retained": retained,
            "removed_manifests": removed_manifests,
            "removed_data_files": removed_files,
        }

    # ------------------------------------------------------------ metadata

    def snapshots(self) -> list[dict]:
        out = []
        v = self._current_version()
        while v:
            try:
                m = self._manifest(v)
            except FileNotFoundError:
                break  # older history expired — lineage stops here
            out.append(m)
            v = m["parent"] or 0
        return list(reversed(out))

    def row_count(self) -> int:
        """O(1) from manifest stats — no scan (Iceberg snapshot summary)."""
        return self._manifest(self._current_version())["row_count"]

    def changed_since(self, snapshot_id: int) -> DataFrame:
        """Snapshot-diff read: rows in files added after ``snapshot_id`` —
        the incremental-rebuild primitive (CHANGELOG.md:179 changed-files-only)."""
        old = {e["path"] for e in self._entries(self._manifest(snapshot_id))}
        cur = self._entries(self._manifest(self._current_version()))
        new_files = [os.path.join(self.path, e["path"]) for e in cur if e["path"] not in old]
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

    def table(
        self,
        name: str,
        schema: T.StructType | None = None,
        layout: TableLayout | None = None,
    ) -> SnapshotTable:
        return SnapshotTable(self.spark, os.path.join(self.root, name), schema, layout)

    def tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d, "_snapshots"))
        )
