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


def run_pipeline(
    transcripts: DataFrame, tau: float | None = None, persist_changelog: bool = True
) -> PipelineResult:
    _, rejects = split_valid_rejects(transcripts)
    changelog = extract_changelog(transcripts)
    if persist_changelog:
        # one extraction pass feeds both mention and triple branches — persist
        # so the pandas UDF runs once (the reference runs runOnPart once and
        # splits the DiffGraph afterwards, Neo4jDriver.scala:198-212)
        changelog = changelog.persist()
    mentions, raw_triples = split_changelog(changelog)
    entities, norm_to_entity = build_entities(mentions, tau)
    triples = canonicalize_triples(raw_triples, norm_to_entity)
    return PipelineResult(mentions, entities, triples, rejects)


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
