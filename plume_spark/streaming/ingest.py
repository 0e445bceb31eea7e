"""Structured Streaming ingest: transcript files -> staging change log -> graph.

SURVEY §2.9: the reference is batch with incremental re-runs, and this repo's
primary persist path is incremental batch over snapshot lineage
(pipeline.build_graph).  This module is the Spark-native continuous-arrival
complement the reference never had: new transcript files landing in a
directory (the local stand-in for an Iceberg table's appended data files) are
picked up by a file-source stream and folded into the SAME staging table and
graph tables as the batch path.

Design — exactly-once without a transactional sink:

* the file source's checkpoint tracks which files each epoch consumed
  (at-least-once replay after a crash);
* every change-log record carries a content-derived rec_id
  (pipeline._with_rec_id) and lands via MERGE-on-rec_id into the snapshot
  staging table — so replayed epochs are no-ops (idempotent sink =
  exactly-once effect, the standard Spark recipe);
* materialization stays a deterministic global function of the staging table
  (pipeline.materialize_graph), shared verbatim with the batch path: a store
  fed by the stream is bit-identical to one built by build_graph over the
  same rows (tested in tests/test_streaming.py).

Everything per-epoch is DataFrame-plan work (the extraction pandas UDF and
the MERGE); the foreachBatch closure does no row iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plume_spark.schemas import TRANSCRIPTS


def file_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Shared file-source stream constructor (streaming sources require a
    declared schema).  ``max_files_per_trigger`` bounds epoch size — the
    streaming analog of build_graph's max_units work chunking."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def read_transcript_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of transcript rows (TRANSCRIPTS is the
    authoritative input_hint shape)."""
    return file_stream(spark, path, TRANSCRIPTS, fmt, max_files_per_trigger)


def stream_build(
    transcripts_stream: DataFrame,
    store,
    checkpoint_dir: str,
    tau: float | None = None,
    materialize: bool = True,
) -> dict:
    """Drain all currently-available input (Trigger.AvailableNow), folding
    each epoch's extraction into the staging table, then materialize once.

    AvailableNow is the right trigger for this workload: transcript batches
    arrive in bulk (an upstream job lands files), and canonicalization is a
    global function that should run once per drain, not per micro-batch.  A
    long-lived deployment would run the same query with a processing-time
    trigger and schedule materialize_graph() on its own cadence.

    Returns counters ({"epochs", "rows_in", **materialize stats}).
    """
    from plume_spark.lineage import commit_lineage
    from plume_spark.operators.extraction import extract_changelog
    from plume_spark.pipeline import _with_rec_id, materialize_graph, staging_table

    staging = staging_table(store)
    progress = {"epochs": 0, "rows_in": 0}

    def _fold_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        # checkpoint + pruned MERGE: the idempotency anti-join touches only
        # the file-buckets this epoch's rec_ids hash into, so per-epoch cost
        # tracks the batch, not the accumulated change log
        cl = _with_rec_id(extract_changelog(batch_df)).localCheckpoint(eager=True)
        staging.merge_insert(cl, ["rec_id"], prune=True)
        # per-epoch lineage/metrics (A6 pass-metrics analog; stage="stream"
        # keys by epoch, disjoint from the batch path's bucket ids)
        unit = batch_df.sparkSession.createDataFrame(
            [(int(epoch_id), f"epoch-{epoch_id}", n)],
            "partition_id int, input_hash string, rows_in long",
        )
        commit_lineage(store.lineage, "stream", unit, rows_out=staging.row_count())
        progress["epochs"] += 1
        progress["rows_in"] += n

    q = (
        transcripts_stream.writeStream.foreachBatch(_fold_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if materialize and progress["epochs"]:
        progress.update(materialize_graph(store, tau))
    # post-drain maintenance: every epoch's MERGE appended a small fileset to
    # staging; bin-pack them back into a layout-conforming fileset so the next
    # drain's anti-join scans files proportional to data, not to epochs
    # (Iceberg rewrite_data_files on a schedule).  History is retained —
    # reclaiming it is the operator's explicit expire_snapshots call.
    if progress["epochs"] and staging.compact(min_files=1) is not None:
        progress["compacted"] = True
    return progress


def stream_turn_counts(
    transcripts_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming per-conversation turn counters with late-data bounds — the
    watermarked-aggregation surface (monitoring view for an always-on ingest:
    conversations and max turn_idx seen per event-time window).  `ts` is
    event time; ordering authority for the graph itself remains turn_idx."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "conv_id",
            "n_turns",
            "max_turn_idx",
        )
    )
