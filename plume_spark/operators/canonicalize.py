"""Canonicalization: mention norms -> canonical entities with stable IDs.

The analog of Plume's node-identity management: the concurrent identity map
``nodeId.getOrElseUpdate(node, nextId)`` (drivers/base/.../IDriver.scala:19-20,
91-98) guarantees "same node => same id".  Here identity is semantic (alias
variants of one real-world entity must collapse), so the map is replaced by:

  distinct norms -> LSH-verified similarity edges -> connected components ->
  canonical name = lexicographic min norm in the component ->
  entity_id = xxhash64(kind, canonical_name)   (resume-idempotent)

Entity ``kind`` is resolved per component: the lexicographically smallest
non-'entity' kind observed for any member norm, else 'entity' — deterministic
regardless of partitioning.  ``aliases`` collects every member norm (the
reference's list-valued node property, SchemaBuilder.scala:17,40-42).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plume_spark.functions.ids import entity_id_col
from plume_spark.operators.components import _driver_union_find, connected_components
from plume_spark.operators.linking import driver_link_kernel, verified_pairs

# Dictionary-size cutover for the driver-local linking kernel.  Entity
# vocabularies are scale-free: even at 10^12 turns the distinct-norm
# dictionary is typically << this, so most jobs take the kernel path; the
# distributed LSH pipeline is the unbounded fallback (and the kernel is
# asserted bit-identical to it in tests).  Env-overridable so benchmarks can
# force the distributed path (DRIVER_LINK_MAX_NORMS=0).
DRIVER_LINK_MAX_NORMS = int(os.environ.get("DRIVER_LINK_MAX_NORMS", "500000"))


def norm_components(mentions: DataFrame, tau: float | None = None) -> DataFrame:
    """(norm, canonical_norm) over every distinct mention norm.

    Norms not linked to anything are their own canonical (isolated nodes are
    unioned back — connected_components only sees edge endpoints).

    Physical strategy is size-adaptive, like components.connected_components:
    a dictionary that fits the driver runs the whole LSH+verify+CC chain as
    one vectorized local kernel (identical output, none of the ~20 small
    shuffle stages); larger dictionaries run distributed.  Non-ASCII norms
    force the distributed path (the kernel's vectorized hash assumes 1-byte
    chars; textnorm emits ASCII, so this triggers only on foreign callers).
    """
    # lazy distinct: the driver-path probe below folds it into ONE job
    # (distinct + limit + collect); the eager checkpoint is deferred to the
    # distributed branch — the only consumer that re-reads the dictionary
    # (banding, gram dict, isolated-norm union).  Each avoided job is ~0.3 s
    # of serial driver scheduling that the N->4N scaling gate bills in full.
    norms = mentions.select("norm").distinct()
    kwargs = {} if tau is None else {"tau": tau}
    head = norms.limit(DRIVER_LINK_MAX_NORMS + 1).collect()
    if len(head) <= DRIVER_LINK_MAX_NORMS:
        vals = [r["norm"] for r in head if r["norm"] is not None]
        if all(v.isascii() for v in vals):
            pairs = driver_link_kernel(vals, **kwargs)
            comp = dict(_driver_union_find(pairs))
            rows = [(n, comp.get(n, n)) for n in vals]
            spark = mentions.sparkSession
            return spark.createDataFrame(rows, "norm string, canonical_norm string")
    norms = norms.localCheckpoint(eager=True)
    # materialize the similarity edges once: connected_components and every
    # downstream consumer would otherwise re-run the LSH + verify lineage
    edges = verified_pairs(norms, "norm", **kwargs).localCheckpoint(eager=True)
    cc = connected_components(edges, "norm_a", "norm_b").withColumnRenamed("node", "norm")
    return (
        norms.join(cc, "norm", "left")
        .select("norm", F.coalesce("component", "norm").alias("canonical_norm"))
    )


def build_entities(mentions: DataFrame, tau: float | None = None) -> tuple[DataFrame, DataFrame]:
    """Returns (entities, norm_to_entity).

    entities:        entity_id, canonical_name, kind, aliases
    norm_to_entity:  norm, entity_id   (the linking dictionary for triples)
    """
    # per-norm kind candidates (smallest non-'entity' kind per norm) — the
    # ONE AND ONLY reduction over the big mention stream: norm_components
    # below runs on this dictionary-sized table, not on the mention stream,
    # so its distinct() is a no-op-priced re-agg (one full-cache scan total,
    # was two).  localCheckpoint: everything downstream (entities,
    # norm->entity dictionary) is dictionary-sized; without the eager cut,
    # every broadcast exchange of a derived table launches its own job that
    # re-scans the full cached change log — measured ~8-10 redundant
    # big-cache scans (~90 s at local[16], k=48) for tables of a few
    # thousand rows.
    norm_kind = (
        mentions.groupBy("norm")
        .agg(
            F.min(F.when(F.col("kind") != "entity", F.col("kind"))).alias("kind_hint")
        )
        .localCheckpoint(eager=True)
    )
    comp = norm_components(norm_kind, tau).cache()  # reused by entities + dict
    member = comp.join(norm_kind, "norm", "left")
    ent = (
        member.groupBy("canonical_norm")
        .agg(
            F.min("kind_hint").alias("kind_hint"),
            F.sort_array(F.collect_set("norm")).alias("aliases"),
        )
        .select(
            F.col("canonical_norm").alias("canonical_name"),
            F.coalesce("kind_hint", F.lit("entity")).alias("kind"),
            "aliases",
        )
    )
    entities = ent.select(
        entity_id_col("kind", "canonical_name").alias("entity_id"),
        "canonical_name",
        "kind",
        "aliases",
    )
    norm_to_entity = (
        comp.join(
            entities.select(
                F.col("canonical_name").alias("canonical_norm"), "entity_id"
            ),
            "canonical_norm",
        )
        .select("norm", "entity_id")
    )
    return entities, norm_to_entity


def canonicalize_triples(
    raw_triples: DataFrame, norm_to_entity: DataFrame, broadcast_dict: bool = True
) -> DataFrame:
    """Rewrite raw (norm-keyed) triples to entity-id triples.

    The norm->entity dictionary is small (distinct norms) — broadcast it so
    the fact-table join is map-side (no shuffle of the triple stream).  At
    dictionary sizes beyond broadcast limits, fall back to a shuffle join and
    let AQE split the hot-entity skew.
    """
    d = norm_to_entity
    if broadcast_dict:
        d = F.broadcast(d)
    subj_d = d.select(F.col("norm").alias("subj_norm"), F.col("entity_id").alias("subj"))
    obj_d = d.select(F.col("norm").alias("obj_norm"), F.col("entity_id").alias("obj"))
    return (
        raw_triples.join(subj_d, "subj_norm")
        .join(obj_d, "obj_norm")
        .select(
            "subj", "pred", "obj", "conv_id", "turn_idx", "src_mention", "obj_mention"
        )
    )
