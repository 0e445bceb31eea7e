"""End-to-end pipeline: transcripts -> mentions -> entities -> triples.

The Spark recast of the reference's CLI construction lifecycle
(src/.../Plume.scala:17-28 -> JimpleAst2Database.scala:71-96 ->
PlumeForkJoinParallelCpgPass.scala:40-90):

  read transcripts              (S1 scan; storage-bucketed by conv_id)
  -> reject malformed rows      (P8 per-part tolerance)
  -> parallel extraction        (applyInPandas change-log pass, §2.10)
  -> split change log           (U2 per-kind partition)
  -> link + canonicalize        (J9 LSH join, J7 CC label propagation)
  -> materialize entities, then triples   (O2 nodes-before-edges ordering)

``run_pipeline`` is store-agnostic (returns DataFrames); ``build_graph``
persists through the snapshot store with lineage checkpointing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plume_spark.operators.canonicalize import build_entities, canonicalize_triples
from plume_spark.operators.extraction import (
    extract_changelog,
    split_changelog,
    split_valid_rejects,
)


@dataclass
class PipelineResult:
    mentions: DataFrame
    entities: DataFrame
    triples: DataFrame
    rejects: DataFrame
    # lazy endpoint-kind constraint check (SchemaBuilder.checkEdgeConstraint
    # recast, operators/constraints.py) — empty for a valid extraction; a
    # declared plan, no cost unless inspected.
    kind_violations: DataFrame | None = None


def run_pipeline(
    transcripts: DataFrame, tau: float | None = None, persist_changelog: bool = True
) -> PipelineResult:
    from plume_spark.operators.constraints import kind_violations

    _, rejects = split_valid_rejects(transcripts)
    # One extraction pass feeds both mention and triple branches — persist so
    # the pandas UDF runs once (the reference runs runOnPart once and splits
    # the DiffGraph afterwards, Neo4jDriver.scala:198-212).  Two volume cuts,
    # both because the columnar cache build (and every scan of it) is
    # memory-bandwidth-bound — the one cost more cores cannot buy down:
    # (a) compact_mentions collapses mention records to per-batch distinct
    #     (norm, kind) pairs (linking is a pure function of the distinct-norm
    #     dictionary, so downstream results are identical);
    # (b) only the columns the pipeline's own jobs consume are cached.
    # The full per-occurrence mention frame stays available as a lazy,
    # uncached recompute (PipelineResult.mentions).
    changelog = extract_changelog(transcripts, compact_mentions=True)
    slim = changelog.select(
        "rec_kind", "conv_id", "turn_idx", "norm", "kind", "pred",
        "subj_norm", "subj_kind", "obj_norm", "obj_kind",
        "src_mention", "obj_mention",
    )
    if persist_changelog:
        slim = slim.persist()
    mentions_slim = slim.filter(F.col("rec_kind") == "mention").select("norm", "kind")
    raw_triples = slim.filter(F.col("rec_kind") == "triple").select(
        "conv_id", "turn_idx", "subj_norm", "subj_kind", "pred",
        "obj_norm", "obj_kind", "src_mention", "obj_mention",
    )
    entities, norm_to_entity = build_entities(mentions_slim, tau)
    triples = canonicalize_triples(raw_triples, norm_to_entity)
    # full per-occurrence frame: lazy, uncached, re-extracts only if read
    mentions, _ = split_changelog(extract_changelog(transcripts))
    return PipelineResult(
        mentions, entities, triples, rejects, kind_violations(raw_triples)
    )


def _with_rec_id(changelog: DataFrame) -> DataFrame:
    """Deterministic identity for every change-log record, so staging-table
    merges are idempotent under retries (null-safe: keys are coalesced)."""
    return changelog.withColumn(
        "rec_id",
        F.xxhash64(
            "rec_kind",
            "conv_id",
            "turn_idx",
            F.coalesce(F.col("span_start"), F.lit(-1)),
            F.coalesce(F.col("subj_norm"), F.lit("")),
            F.coalesce(F.col("pred"), F.lit("")),
            F.coalesce(F.col("obj_norm"), F.lit("")),
        ),
    )


def build_graph(
    transcripts: DataFrame,
    store,
    n_buckets: int = 64,
    tau: float | None = None,
    max_units: int | None = None,
) -> dict:
    """Resumable persist path: transcripts -> GraphStore tables.

    Two stages with different incrementality (SURVEY §2.9: incremental batch,
    not streaming):

    1. **extract** — the expensive pandas-UDF pass, incremental per conv_id
       hash-bucket: pending units = bucket work list anti-joined against
       committed lineage (the reference's changed-files-only rebuild,
       CHANGELOG.md:179); extracted change-log records land in a staging
       table via rec_id-keyed MERGE (retry-safe).
    2. **materialize** — linking + canonicalization + triple rewrite, a
       deterministic GLOBAL function of the full change log, committed as an
       atomic OVERWRITE of entities/triples.  Global because canonical names
       are component-wide minima: linking only new buckets could disagree
       with an uninterrupted run.  The change log (distinct norms + triple
       records) is orders of magnitude smaller than the transcript text, so
       re-running this stage per increment is the right cost split at scale.

    A killed run re-executed from the top therefore produces exactly the
    tables an uninterrupted run produces (tested in test_resume.py).

    ``max_units`` bounds how many pending buckets stage 1 processes in this
    call (work chunking — the txMax analog; also the kill-simulation hook).
    Returns counters (the per-pass metrics of
    PlumeForkJoinParallelCpgPass.scala:78-111).
    """
    from plume_spark.lineage import (
        BUCKET_COL,
        bucket_hashes,
        commit_lineage,
        pending_units,
        with_bucket,
    )

    staging = staging_table(store)

    tb = with_bucket(transcripts, n_buckets)
    units = bucket_hashes(tb)
    pending = pending_units(units, store.lineage, "extract")
    pend_rows = pending.collect()  # bounded by n_buckets — driver-safe
    if max_units is not None:
        pend_rows = sorted(pend_rows, key=lambda r: r["partition_id"])[:max_units]
    stats = {"pending_units": len(pend_rows), "vec_fallback_batches": 0}

    if pend_rows:
        buckets = [r["partition_id"] for r in pend_rows]
        sub = tb.filter(F.col(BUCKET_COL).isin(buckets)).drop(BUCKET_COL)
        # observable perf cliff (round-3 VERDICT #2): every batch the
        # vectorized kernel fails on (and the loop kernel silently absorbs)
        # is counted; >0 on clean input means a vec-kernel regression is
        # eating ~3x throughput in production.
        fb_acc = transcripts.sparkSession.sparkContext.accumulator(0)
        # checkpoint: the pruned MERGE consumes cl twice (bucket probe +
        # anti-join/write); without it the pandas-UDF extraction would run
        # per consumer.  Change-log records are compact — orders of
        # magnitude below the transcript text this stage just avoided
        # re-reading.
        cl = _with_rec_id(
            extract_changelog(sub, fallback_acc=fb_acc)
        ).localCheckpoint(eager=True)
        staging.merge_insert(cl, ["rec_id"], prune=True)
        done = transcripts.sparkSession.createDataFrame(pend_rows)
        commit_lineage(store.lineage, "extract", done, rows_out=staging.row_count())
        stats["vec_fallback_batches"] = fb_acc.value

    # ---- stage 2: global materialize (atomic overwrite) ----
    stats.update(materialize_graph(store, tau))
    return stats


def staging_table(store):
    """The change-log staging table (extraction output, rec_id-keyed MERGE
    target).  One definition shared by the batch (build_graph) and streaming
    (streaming.ingest) write paths.

    Bucketed by rec_id so the per-increment MERGE anti-joins within the
    incoming keys' file-buckets only (merge_insert(prune=True)) — without
    the layout every epoch/unit-batch would rescan the ENTIRE accumulated
    change log for the idempotency check, an O(store)-per-increment cost at
    the 10^12-turn target (the same fix as DedupIndex's registry)."""
    from plume_spark.operators.extraction import CHANGELOG_SCHEMA
    from pyspark.sql import types as T

    from plume_spark.store.catalog import TableLayout

    staging_schema = T.StructType(
        CHANGELOG_SCHEMA.fields + [T.StructField("rec_id", T.LongType())]
    )
    layout = TableLayout(
        bucket_by="rec_id", n_buckets=16, sort_by=("rec_id",), stats_cols=("rec_id",)
    )
    return store.catalog.table("changelog", staging_schema, layout)


def materialize_graph(store, tau: float | None = None) -> dict:
    """Stage 2 of the persist path: staging change log -> entities + triples,
    committed as an atomic OVERWRITE (deterministic global function of the
    full change log; see build_graph docstring for why it is global).  Shared
    verbatim by batch and streaming ingest — both produce the same staging
    rows, so both converge to identical graph tables."""
    from plume_spark.lineage import commit_lineage
    from plume_spark.operators.constraints import kind_violations

    staging = staging_table(store)
    changelog = staging.read()
    mentions, raw_triples = split_changelog(changelog)
    # write-time schema check (checkEdgeConstraint recast): the closed
    # extraction vocabulary guarantees zero, so any hit is a pipeline bug.
    stats = {"kind_violations": kind_violations(raw_triples).count()}
    entities, norm_to_entity = build_entities(mentions, tau)
    triples = canonicalize_triples(raw_triples, norm_to_entity).dropDuplicates()
    store.entities.overwrite(entities)
    store.triples.overwrite(triples)
    stats["entities"] = store.entities.row_count()
    stats["triples"] = store.triples.row_count()
    mat_unit = store.spark.createDataFrame(
        [(-1, "global", int(stats["entities"]))],
        "partition_id int, input_hash string, rows_in long",
    )
    commit_lineage(store.lineage, "materialize", mat_unit, rows_out=stats["triples"])
    return stats


def triples_with_names(result: PipelineResult) -> DataFrame:
    """Human-readable triple view (canonical names instead of ids) — the
    comparison form for P/R vs the oracle extractor."""
    ent = F.broadcast(result.entities.select("entity_id", "canonical_name"))
    t = result.triples
    return (
        t.join(ent.withColumnRenamed("entity_id", "subj").withColumnRenamed("canonical_name", "subj_name"), "subj")
        .join(ent.withColumnRenamed("entity_id", "obj").withColumnRenamed("canonical_name", "obj_name"), "obj")
        .select("conv_id", "turn_idx", "subj_name", "pred", "obj_name")
    )
