"""Continuous near-duplicate detection: a document stream dedups against an
ever-growing MinHash index.

The batch identity this builds on (operators/dedup.py): every near-dup pair
touches the later-arriving doc's batch, so emitting incremental_neardup
pairs per epoch and folding each batch into the index afterwards yields, in
aggregate, the pair set a full re-run over everything would produce (tested
against the full path in tests/test_streaming.py).  One deliberate
divergence: the band-bucket cap is evaluated ONLINE.  A pair emitted while
its bucket was still small is retained even if later arrivals push that
bucket past MAX_BUCKET_SIZE (a full offline re-run would drop the whole
bucket).  For boilerplate-skewed corpora the online semantics keep strictly
MORE verified-exact pairs than the offline approximation; exactly-once
delivery is unaffected.

Doc identity contract: doc_id is a CONTENT-STABLE identifier — re-crawled
or updated text must arrive under a new doc_id (content-addressed ids, the
same philosophy as the KG pipeline's deterministic hash IDs).  A re-landed
doc_id is treated as a duplicate delivery of the same content and skipped
(first write wins, per table), which is exactly what makes crash replay a
no-op; it is NOT an update mechanism.

Exactly-once without a transactional sink, same recipe as ingest.py:
* the file source's checkpoint gives at-least-once epoch replay;
* all three sinks land via MERGE on natural keys — pairs on
  (doc_a, doc_b), signatures on (doc_id, h), token ids on
  (doc_id, tok_id) — so a replayed epoch is a no-op;
* a crash BETWEEN an index MERGE and the checkpoint commit replays the
  epoch with its batch partially or fully folded in; the per-table
  anti-join in _epoch drops exactly the already-folded rows, so the
  replay completes the fold and re-derives identical pairs.

Per-epoch work is pure DataFrame plans (signatures, the asymmetric band
probe, MERGEs); the foreachBatch closure iterates no rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plume_spark.operators.dedup import (
    JACCARD_TAU,
    incremental_neardup,
    minhash_state,
)
from plume_spark.store.catalog import SnapshotTable

# authoritative shape of the documents table (TESTDATA.md); streaming file
# sources require a declared schema
DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    from plume_spark.streaming.ingest import file_stream

    return file_stream(spark, path, DOCUMENTS, fmt, max_files_per_trigger)


class DedupIndex:
    """The persisted dedup state: signatures + token ids + emitted pairs,
    three snapshot tables under one directory."""

    SIGS = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("minhash", T.LongType()),
        ]
    )
    TOKS = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("tok_id", T.LongType())]
    )
    PAIRS = T.StructType(
        [
            T.StructField("doc_a", T.LongType()),
            T.StructField("doc_b", T.LongType()),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 16):
        # bucket by doc_id: the epoch's anti-join and MERGE keys are doc-keyed,
        # so co-located buckets keep both proportional to touched buckets, and
        # a point read on one doc opens 1/n of the files (the same index
        # recast as the graph store's entities/triples layouts)
        from plume_spark.store.catalog import TableLayout

        doc_layout = TableLayout(
            bucket_by="doc_id", n_buckets=n_buckets, sort_by=("doc_id",),
            stats_cols=("doc_id",),
        )
        pair_layout = TableLayout(
            bucket_by="doc_a", n_buckets=n_buckets, sort_by=("doc_a", "doc_b"),
            stats_cols=("doc_a",),
        )
        self.sigs = SnapshotTable(spark, f"{path}/sigs", schema=self.SIGS, layout=doc_layout)
        self.toks = SnapshotTable(spark, f"{path}/toks", schema=self.TOKS, layout=doc_layout)
        self.pairs = SnapshotTable(spark, f"{path}/pairs", schema=self.PAIRS, layout=pair_layout)

    def has_index(self) -> bool:
        return self.sigs.row_count() > 0


def stream_dedup(
    doc_stream: DataFrame,
    index: DedupIndex,
    checkpoint_dir: str,
    tau: float = JACCARD_TAU,
) -> dict:
    """Drain all available document files (Trigger.AvailableNow), emitting
    near-dup pairs per epoch and growing the index.

    Returns {"epochs", "docs_in", "pairs_new", "pairs_total"} counters
    (pairs_new is this drain's delta; pairs_total includes prior runs).  A
    long-lived deployment runs the identical query with a processing-time
    trigger; the index tables are ordinary snapshot tables, so the batch
    incremental_neardup path (or a compaction / expiry pass) can interleave
    with the stream."""
    progress = {"epochs": 0, "docs_in": 0}
    pairs_before = index.pairs.row_count()

    def _epoch(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        spark = batch_df.sparkSession
        nsigs, ntoks = minhash_state(batch_df)
        # Enforce incremental_neardup's doc-disjointness precondition and the
        # first-write-wins identity contract in one stroke: drop batch docs
        # the index already holds, PER TABLE (narrow single-column anti-join,
        # O(batch) extra work).  Per-table matters for crash replay: a crash
        # between the two index MERGEs below leaves a doc folded into sigs
        # but not toks; on replay its signature rows are skipped while its
        # token rows still land, completing the fold instead of corrupting
        # either table.
        if index.has_index():
            nsigs = nsigs.join(
                index.sigs.read().select("doc_id").distinct(), "doc_id", "left_anti"
            )
            ntoks = ntoks.join(
                index.toks.read().select("doc_id").distinct(), "doc_id", "left_anti"
            )
        # consumed twice each (pair probe + index fold): materialize once
        nsigs, ntoks = nsigs.localCheckpoint(eager=True), ntoks.localCheckpoint(eager=True)
        old_sigs = index.sigs.read() if index.has_index() else None
        old_toks = index.toks.read() if old_sigs is not None else None
        new_pairs = incremental_neardup(old_sigs, old_toks, nsigs, ntoks, tau=tau)
        index.pairs.merge_insert(
            new_pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")),
            keys=["doc_a", "doc_b"],
        )
        index.sigs.merge_insert(nsigs, keys=["doc_id", "h"])
        index.toks.merge_insert(ntoks, keys=["doc_id", "tok_id"])
        # incremental_neardup caches the combined token set (consumed by the
        # star rescue and verify); all actions for this epoch are done, so
        # release it — otherwise a long drain accumulates one corpus-sized
        # cache entry per epoch
        spark.catalog.clearCache()
        progress["epochs"] += 1
        progress["docs_in"] += n

    q = (
        doc_stream.writeStream.foreachBatch(_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress["pairs_total"] = index.pairs.row_count()
    progress["pairs_new"] = progress["pairs_total"] - pairs_before
    # epoch MERGEs append small filesets; bin-pack them so scan cost tracks
    # data volume, not epoch count (same policy as ingest.stream_build)
    if progress["epochs"]:
        for t in (index.sigs, index.toks, index.pairs):
            t.compact(min_files=1)
    return progress
