"""Per-partition lineage + resume-idempotent checkpointing.

Reference analogs:
* per-pass counters/timings logged at PlumeForkJoinParallelCpgPass.scala:78-111
  — made durable here as rows in the ``lineage`` table;
* incremental idempotency: artifact-hash early exit (CHANGELOG.md:694),
  unchanged-method skip (CHANGELOG.md:704), changed-files-only rebuild
  (CHANGELOG.md:179) — recast as: each unit of work (a conversation bucket)
  is identified by a deterministic ``input_hash``; a rerun anti-joins the
  work list against already-committed hashes and processes only the rest.

Combined with (a) deterministic entity/triple identity (xxhash64 ids) and
(b) MERGE-idempotent writes (store.merge_insert), a killed run re-executed
from the top produces byte-identical tables: work that committed is skipped,
work that didn't is redone, and redone work that half-wrote is deduplicated
by the merge keys.  Lineage is committed AFTER the data it describes, so a
crash between data-commit and lineage-commit only causes harmless rework.

Work units are conv_id hash-buckets (``pmod(xxhash64(conv_id), n_buckets)``)
— the same bucketing that partitions the Iceberg tables, so one unit maps to
one storage partition at cluster scale.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plume_spark.schemas import LINEAGE
from plume_spark.store.catalog import SnapshotTable

BUCKET_COL = "_bucket"


def with_bucket(transcripts: DataFrame, n_buckets: int) -> DataFrame:
    return transcripts.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def bucket_hashes(transcripts_bucketed: DataFrame) -> DataFrame:
    """(partition_id, input_hash, rows_in): order-insensitive content hash per
    bucket — ``bit_xor`` of per-row hashes (a partial/map-side-combinable
    aggregate), so shuffling or re-partitioning the input never changes the
    hash (resume keys must be physical-layout-free)."""
    return (
        transcripts_bucketed.groupBy(BUCKET_COL)
        .agg(
            F.hex(
                F.expr("bit_xor(xxhash64(conv_id, turn_idx, coalesce(text, '\\0')))")
            ).alias("input_hash"),
            F.count("*").alias("rows_in"),
        )
        .withColumnRenamed(BUCKET_COL, "partition_id")
    )


def committed_units(lineage: SnapshotTable, stage: str) -> DataFrame:
    """(partition_id, input_hash) pairs already committed for a stage."""
    return (
        lineage.read()
        .filter(F.col("stage") == stage)
        .select("partition_id", "input_hash")
        .distinct()
    )


def pending_units(
    units: DataFrame, lineage: SnapshotTable, stage: str
) -> DataFrame:
    """Anti-join the work list against committed lineage (A9 unchanged-input
    skip): only units whose (partition_id, input_hash) is unseen remain."""
    done = committed_units(lineage, stage)
    return units.join(done, ["partition_id", "input_hash"], "left_anti")


def commit_lineage(
    lineage: SnapshotTable,
    stage: str,
    units: DataFrame,
    rows_out: int,
) -> None:
    """Durably record completed units.  rows_out is a stage-level counter
    (the nDiff of the reference's pass log)."""
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    rows = units.select(
        F.lit(stage).alias("stage"),
        F.col("partition_id").cast("int"),
        F.col("input_hash").cast("string"),
        F.col("rows_in").cast("long"),
        F.lit(rows_out).cast("long").alias("rows_out"),
        F.lit(now).cast("timestamp").alias("committed_at"),
    )
    spark = units.sparkSession
    lineage.append(spark.createDataFrame(rows.collect(), schema=LINEAGE))
