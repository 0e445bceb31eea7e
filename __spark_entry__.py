"""Driver contract for the spark-graft builder.

``queries()`` maps SURVEY.md §2 operator ids to runnable DataFrame builders;
``oracle_sql()`` carries the DuckDB-equivalent SQL (same column names/types,
computed identically — rounding is CAST(... AS DOUBLE) because DuckDB round()
returns DECIMAL).  Every queries() entry has an oracle_sql() twin — the
streaming and pandas-UDF ops included (their oracles recompute the same
values from the base tables).
"""

from __future__ import annotations

import math
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from plume_spark import graft
from plume_spark.functions.quantize import qround
from plume_spark.operators import corpus, dedup, similarity, text, traversal
from plume_spark.operators.extraction import extract_changelog, split_changelog
from plume_spark.pipeline import run_pipeline, triples_with_names

NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'), "
    "'\\s+', ' ', 'g'))"
)

LOOKUP_NAMES = [
    "Customer#000000003",
    "Customer#000000007",
    "Customer#000000021",
    "Customer#000000042",
    "Customer#000000099",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full KG pipeline (extraction -> LSH linking -> CC
    canonicalization -> triple materialize) over transcripts derived from
    sf0.001.  tau=0.95: sequential customer names are near but distinct."""
    t = graft.kg_transcripts(spark, "/root/testdata/sf0.001")
    result = run_pipeline(t, tau=0.95)
    return triples_with_names(result).orderBy("conv_id", "turn_idx")


# --------------------------------------------------------------------------
# queries — (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------


def _q_w1(spark, sf):
    t = graft.transcripts_from_events(spark, sf)
    return t.filter(F.col("turn_idx") < 3).select("conv_id", "turn_idx", "role", "text")


def _q_w2(spark, sf):
    t = graft.transcripts_from_events(spark, sf)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        t.withColumn("prev_text", F.lag("text").over(w))
        .filter(F.col("turn_idx") < 3)
        .select("conv_id", "turn_idx", "prev_text")
    )


def _q_o1(spark, sf):
    e = graft.load(spark, sf, "events")
    return (
        e.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(100)
        .select("event_id", "value")
    )


def _q_a1(spark, sf):
    e = graft.load(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.count("*").alias("n"),
    )


def _q_a2(spark, sf):
    e = graft.load(spark, sf, "events")
    return e.filter(F.col("value") > 100).agg(F.count("*").alias("n"))


def _q_a5(spark, sf):
    e = graft.load(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("event_types")
    )


def _q_u1(spark, sf):
    e = graft.load(spark, sf, "events")
    hi = e.filter(F.col("value") > 150).select("event_type")
    lo = e.filter(F.col("value") < 50).select("event_type")
    return hi.union(lo).distinct()


def _q_p1(spark, sf):
    c = graft.load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.coalesce("c_mktsegment", F.lit("<empty>")).alias("segment"),
        F.coalesce("c_acctbal", F.lit(-1.0)).alias("acctbal"),
    )


def _q_j1(spark, sf):
    o = graft.load(spark, sf, "orders")
    c = graft.load(spark, sf, "customer")
    return o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


def _q_p2(spark, sf):
    o = graft.load(spark, sf, "orders")
    c = graft.load(spark, sf, "customer").filter(F.col("c_acctbal") > 5000)
    return (
        o.select(F.col("o_custkey").alias("custkey"))
        .join(c.select(F.col("c_custkey").alias("custkey")), "custkey", "left_semi")
        .distinct()
    )


def _q_p3(spark, sf):
    o = graft.load(spark, sf, "orders")
    li = graft.load(spark, sf, "lineitem")
    fwd = o.filter(F.col("o_custkey") == 1).limit(1).agg(
        (F.count(F.lit(1)) > 0).alias("fwd")
    )
    missing = li.filter(F.col("l_orderkey") == -5).limit(1).agg(
        (F.count(F.lit(1)) > 0).alias("missing")
    )
    return fwd.crossJoin(missing)


def _q_p7(spark, sf):
    return traversal.roots(graft.dag_edges(spark, sf))


def _q_j6(spark, sf):
    edges = graft.dag_edges(spark, sf)
    seeds = (
        graft.load(spark, sf, "customer")
        .filter(F.col("c_custkey") < 5)
        .select(F.col("c_custkey").alias("node"))
    )
    return traversal.out_neighbors(edges, seeds)


def _q_j7(spark, sf):
    edges = graft.dag_edges(spark, sf)
    seeds = (
        graft.load(spark, sf, "customer")
        .filter(F.col("c_custkey") < 10)
        .select(F.col("c_custkey").alias("node"))
    )
    return traversal.k_hop(edges, seeds, 2)


def _q_j7r(spark, sf):
    edges = graft.dag_edges(spark, sf)
    seeds = (
        graft.load(spark, sf, "customer")
        .filter(F.col("c_custkey") < 3)
        .select(F.col("c_custkey").alias("node"))
    )
    return traversal.reachable(edges, seeds)


def _q_g5_bfs(spark, sf):
    """Min-hop BFS distances over the 3-level transcript DAG from the same
    seed set as j7_reachable — the distance-annotated traversal.  The engine
    runs the generic iterative frontier BFS (cycle-safe via the visited
    anti-join); the oracle exploits the known DAG shape: dist 0 = seeds,
    dist 1 = their orders, dist 2 = those orders' parts, MIN() folding
    multi-path reaches."""
    edges = graft.dag_edges(spark, sf)
    seeds = (
        graft.load(spark, sf, "customer")
        .filter(F.col("c_custkey") < 3)
        .select(F.col("c_custkey").alias("node"))
    )
    return traversal.bfs_distances(edges, seeds)


def _q_g1_pagerank(spark, sf):
    """Iterative PageRank (3 synchronous iterations) over the 3-level DAG —
    one shuffle per iteration, partial-agg contributions (skew-safe)."""
    from plume_spark.operators.pagerank import pagerank

    return pagerank(graft.dag_edges(spark, sf))


def _q_w3_sessionize(spark, sf):
    """Gap-based sessionization (30-min inactivity closes a session): the
    standard event-stream operator the reference's per-conversation grouping
    approximates.  One window pass: flag gaps > threshold, running-sum the
    flags into session ordinals — no self-join, no UDF."""
    e = graft.load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # fractional epoch seconds (micros / 1e6, bit-identical in both engines)
    # — unix_timestamp truncates to whole seconds and shifts gap thresholds
    ts_s = F.col("ts").cast("timestamp").cast("double")
    gap = ts_s - F.lag(ts_s).over(w)
    return (
        e.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_idx", F.sum("new_sess").over(w).cast("long"))
        .select("event_id", "user_id", "session_idx")
    )


def _q_f5_json_payload(spark, sf):
    """JSON payload construction + parsing (F5, TigerGraphDriver.scala:94-145
    analog): build a JSON document per event, then extract fields back —
    round-trip through the engine's JSON codec, all codegen."""
    e = graft.load(spark, sf, "events")
    doc = F.to_json(F.struct(F.col("event_type").alias("t"), F.col("value").alias("v")))
    return e.select(
        "event_id",
        F.get_json_object(doc, "$.t").alias("t"),
        F.get_json_object(doc, "$.v").cast("double").alias("v"),
    )


def _q_f11_levenshtein(spark, sf):
    """Blocked edit-distance fuzzy match (the verify alternative to gram
    Jaccard in entity linking): customer-name pairs within a nation block
    at Levenshtein distance <= 2.

    Scale design: the block key is COMPOUND (nation, name-length bucket) —
    a bare nation block grows linearly with the corpus (25 values), making
    the within-block self-join quadratic at 100x.  Length bucketing is
    guaranteed-covering: dist <= 2 implies |len_a - len_b| <= 2, so the
    probe side expands to the <= 2 buckets that can hold a match (width 4).
    The |len_a - len_b| <= 2 Levenshtein lower bound rides in the join
    condition, killing most candidates before the O(len^2) distance."""
    c = graft.load(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    a = c.select(
        F.col("c_nationkey").alias("blk_a"),
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.length("c_name").alias("len_a"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor((F.col("len_a") - 2) / 4), F.floor((F.col("len_a") + 2) / 4)
            )
        ).alias("lb"),
    )
    b = c.select(
        F.col("c_nationkey").alias("blk_b"),
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.length("c_name").alias("len_b"),
    ).withColumn("lb", F.floor(F.col("len_b") / 4))
    return (
        a.join(
            b,
            (F.col("blk_a") == F.col("blk_b"))
            & (a["lb"] == b["lb"])
            & (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= 2),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 2)
        .select("id_a", "id_b", "dist")
    )


def _q_emb_centroids(spark, sf):
    """Per-label per-dimension embedding centroids (the IVF/clustering
    building block): posexplode to long form, one partial-agg mean — no
    array reassembly shuffle, columnar the whole way."""
    emb = graft.load(spark, sf, "embeddings")
    # decimal sum / count instead of avg(double): float summation order
    # varies with partitioning; the decimal sum is associative-exact, so the
    # centroid is identical under any plan (a1/a8's determinism pattern)
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.round(
                (F.sum(F.col("v").cast("decimal(27,12)")) / F.count("*")).cast("double"), 6
            ).alias("centroid"),
            F.count("*").alias("n_vecs"),
        )
    )


def _q_emb_outliers(spark, sf):
    """Embedding-space outlier scan (the mislabeled-data read): per label,
    the 10 vectors farthest from their label centroid by squared L2 —
    points that sit in the wrong cluster are the first candidates for
    label-noise review before training on the set.

    Determinism: the centroid is emb_centroids' decimal-exact mean (rounded
    once); each squared residual is ONE double op cast to decimal(38,18),
    so the distance sum is associative-exact under any partitioning — the
    same plan-independence pattern as a1/a8/emb_centroids.  Scale: long-form
    posexplode, one (label, dim) partial agg, a (label, dim)-keyed join
    back, one (vec, label) partial agg, and a per-label top-k window over
    the per-vector aggregate — no step touches vectors pairwise."""
    emb = graft.load(spark, sf, "embeddings")
    ex = emb.select("vec_id", "label", F.posexplode("embedding").alias("dim", "v"))
    cent = ex.groupBy("label", "dim").agg(
        F.round(
            (F.sum(F.col("v").cast("decimal(27,12)")) / F.count("*")).cast("double"), 6
        ).alias("c")
    )
    vd = F.col("v").cast("double")
    d2 = (
        ex.join(cent, ["label", "dim"])
        .select(
            "vec_id",
            "label",
            ((vd - F.col("c")) * (vd - F.col("c"))).cast("decimal(38,18)").alias("sq"),
        )
        .groupBy("vec_id", "label")
        .agg(F.sum("sq").cast("double").alias("d2x"))
    )
    w = Window.partitionBy("label").orderBy(F.col("d2x").desc(), F.col("vec_id").asc())
    return (
        d2.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("label", "vec_id", qround(F.col("d2x"), 6).alias("dist2"), "rank")
    )


def _q_w4_sliding_rate(spark, sf):
    """Sliding event rate: per event, how many same-user events fell in the
    preceding hour — a RANGE frame over event time (one window pass; the
    self-join formulation t2 uses is the non-window twin)."""
    e = graft.load(spark, sf, "events")
    # fractional epoch seconds — see w3: whole-second truncation moves the
    # RANGE frame boundary relative to the oracle's epoch(ts)
    ts_s = F.col("ts").cast("timestamp").cast("double")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_s)
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


def _q_a9_pivot(spark, sf):
    """Pivot (wide per-user event counts) with a FIXED value list so the
    plan is one pass (no values-discovery job) — the dashboard cross-tab."""
    e = graft.load(spark, sf, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = e.groupBy("user_id").pivot("event_type", kinds).count()
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds]
    )


def _q_corpus_repetition(spark, sf):
    return corpus.repetition_score(graft.load(spark, sf, "documents"))


def _q_corpus_logprob(spark, sf):
    # avg over ln() values cannot use the decimal-exact trick (logs are not
    # decimal-representable); residual cross-engine risk is summation-order
    # noise ~1e-14 against a 5e-7 rounding half-unit — flip probability
    # ~1e-8 per row, accepted
    return corpus.unigram_logprob(graft.load(spark, sf, "documents"))


def _q_corpus_select(spark, sf):
    """Capstone composition: quality + language + exact-dup-keeper gates in
    one plan — the raw-crawl -> training-ready selection chain."""
    return corpus.select_corpus(graft.load(spark, sf, "documents"))


def _q_corpus_mix_sample(spark, sf):
    """Stratified corpus mixing: per-source keep rates (deterministic hash
    sampling) — rates derived arithmetically from the source id so the
    oracle can replay them without a literal table."""
    d = graft.load(spark, sf, "documents")
    rates = (
        d.select("source")
        .distinct()
        .withColumn(
            "rate",
            (F.substring("source", 4, 10).cast("int") % 4 + 1) * F.lit(0.25),
        )
    )
    return corpus.mix_sample(d, rates)


def _q_corpus_dupe_ngrams(spark, sf):
    """Cross-document 8-gram duplication rate (the corpus-duplication
    diagnostic).  The engine counts gram document-frequency over xxhash64'd
    grams (fixed-width keys at scale); the oracle groups by the gram string
    — identical unless 64-bit hashes collide (~n^2/2^64)."""
    return corpus.dupe_ngram_rate(graft.load(spark, sf, "documents"), n=8)


def _q_text_pii_scrub(spark, sf):
    """PII scrub over documents with deterministic synthetic PII appended
    (the base corpus contains none): one email + one long numeric ref per
    doc, so every row exercises both redaction patterns."""
    from plume_spark.operators.text import pii_scrub

    d = graft.load(spark, sf, "documents")
    withpii = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.org or ref "),
            (F.col("doc_id") * 7919 + 100000).cast("string"),
        ).alias("text"),
    )
    return pii_scrub(withpii)


def _q_text_quality_logreg(spark, sf):
    """Fixed-weight logistic-regression quality score — model serving as
    pure column arithmetic."""
    from plume_spark.operators.text import quality_logreg

    return quality_logreg(graft.load(spark, sf, "documents"))


def _q_emb_quantize(spark, sf):
    """Symmetric int8 embedding quantization (scale = max |x|, floor to
    avoid tie-break modes)."""
    return similarity.quantize_embeddings(graft.load(spark, sf, "embeddings"))


_KG_MEMO: dict[tuple, tuple] = {}


def _kg_flagship(spark, sf, tau=0.95, substrate="base"):
    """ONE flagship build shared by the kg_* analytics queries.

    kg_entity_degrees / kg_path2 / kg_triple_support / kg_entities are all
    1-3 s aggregations over the flagship output, but each previously re-ran
    the full ~15 s (sf0.1) pipeline cold (round-3 VERDICT #5).  The memo is
    keyed on (Spark application id, resolved sf dir, tau) — a fresh session
    or a different input never sees a stale hit, and entries from dead
    sessions are evicted on insert (localCheckpointed RDDs die with their
    session).  The flagship contract query itself stays UNMEMOIZED so bench
    timings keep measuring the real end-to-end build.

    Returns (entities, named_triples), both eagerly localCheckpointed so the
    four consumers pay the build exactly once per gate/bench session."""
    key = (spark.sparkContext.applicationId, os.path.realpath(sf), tau, substrate)
    hit = _KG_MEMO.get(key)
    if hit is not None:
        return hit
    for k in [k for k in _KG_MEMO if k[0] != key[0]]:
        del _KG_MEMO[k]
    make = {
        "base": graft.kg_transcripts,
        "varied": graft.kg_transcripts_varied,
        "alias": graft.kg_transcripts_alias,
    }[substrate]
    res = run_pipeline(make(spark, sf), tau=tau)
    out = (
        res.entities.localCheckpoint(eager=True),
        triples_with_names(res).localCheckpoint(eager=True),
    )
    _KG_MEMO[key] = out
    return out


def _co_backbone(spark, sf):
    """ONE part co-purchase backbone (co_occurrence_edges over lineitem)
    shared by the graph-structure family g3/g7/g8/g9/g10 — each previously
    rebuilt the same two-shuffle edge table cold (round-4 VERDICT plan
    audit / "Next round" #4).  Same memo discipline as ``_kg_flagship``:
    keyed on (application id, resolved sf dir), dead-session entries
    evicted on insert, eagerly localCheckpointed so consumers pay the
    build exactly once per gate/bench session.  g4_cooccur — the edge
    build CONTRACT query itself — stays unmemoized so bench keeps
    measuring the real construction cost."""
    key = (spark.sparkContext.applicationId, os.path.realpath(sf), "co", "backbone")
    hit = _KG_MEMO.get(key)
    if hit is not None:
        return hit
    for k in [k for k in _KG_MEMO if k[0] != key[0]]:
        del _KG_MEMO[k]
    from plume_spark.operators.graph_metrics import co_occurrence_edges

    li = graft.load(spark, sf, "lineitem")
    out = co_occurrence_edges(li, "l_orderkey", "l_partkey").localCheckpoint(
        eager=True
    )
    _KG_MEMO[key] = out
    return out


def _q_kg_entity_degrees(spark, sf):
    """Graph analytics over the BUILT knowledge graph (not the raw tables):
    per canonical entity, out-degree, in-degree, and distinct predicates —
    the degree-distribution read every KG consumer starts with.  Pure
    composition over the flagship pipeline's output; the oracle re-derives
    the triple set via the same gram-fingerprint canonicalization CTE."""
    _, named = _kg_flagship(spark, sf)
    outd = named.groupBy(F.col("subj_name").alias("name")).agg(
        F.count("*").alias("out_deg"),
        F.countDistinct("pred").alias("n_preds"),
    )
    ind = named.groupBy(F.col("obj_name").alias("name")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        outd.join(ind, "name", "full")
        .select(
            "name",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("n_preds", F.lit(0)).alias("n_preds"),
        )
    )


def _kg_with_regions(spark, sf):
    """Flagship triples unioned with nation->region 'located_in' edges (same
    norm as the pipeline, applied to nation/region names from the source
    tables) — the two-relation KG that makes path composition non-trivial."""
    from plume_spark.functions.textnorm import norm_col

    _, named = _kg_flagship(spark, sf)
    t1 = named.select("subj_name", "pred", "obj_name")
    n = graft.load(spark, sf, "nation")
    r = graft.load(spark, sf, "region")
    t2 = (
        n.join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(
            norm_col("n_name").alias("subj_name"),
            F.lit("located_in").alias("pred"),
            norm_col("r_name").alias("obj_name"),
        )
    )
    return t1.unionByName(t2).distinct()


def _q_kg_entities(spark, sf):
    """The ENTITY side of the built KG under the value gate (triples are
    checked by the flagship; this checks canonicalization's other output):
    per canonical entity, its inferred kind (min non-'entity' kind hint over
    member norms) and its alias set (sorted member norms, projected to CSV
    for an engine-portable value hash).  The oracle re-derives the clusters
    via the same gram-fingerprint CTE and re-applies the kind-hint rule."""
    ents, _ = _kg_flagship(spark, sf)
    return ents.select(
        "canonical_name",
        "kind",
        F.size("aliases").cast("long").alias("n_aliases"),
        F.array_join("aliases", ",").alias("alias_csv"),
    )


def _q_kg_path2(spark, sf):
    """2-hop relation composition over the built KG + located_in edges:
    how many (subj -pred1-> mid -pred2-> obj) paths exist per predicate
    pair — the relation-cooccurrence statistic schema-inference and
    rule-mining passes start from.

    Scale: the naive formulation self-joins the triple table on
    mid-entity (fan-out = in-deg x out-deg per entity — quadratic at hub
    entities).  This is rewritten as the degree product: per mid entity,
    count incoming edges per pred1 and outgoing per pred2, join the two
    SMALL per-entity aggregates, and sum n_in * n_out — identical counts,
    but the path set is never materialized and the worst case is
    O(|entities| x |preds|^2), not O(paths).  The oracle runs the naive
    join so the rewrite is verified against the definition."""
    d = _kg_with_regions(spark, sf)
    inc = d.groupBy(F.col("obj_name").alias("mid"), F.col("pred").alias("pred1")).agg(
        F.count(F.lit(1)).alias("n_in")
    )
    outc = d.groupBy(
        F.col("subj_name").alias("mid"), F.col("pred").alias("pred2")
    ).agg(F.count(F.lit(1)).alias("n_out"))
    return (
        inc.join(outc, "mid")
        .groupBy("pred1", "pred2")
        .agg(F.sum(F.col("n_in") * F.col("n_out")).alias("n_paths"))
    )


def _q_kg_triple_support(spark, sf):
    """Per canonical triple: mention support — total mentions, distinct
    conversations, and first turn seen.  The confidence signal downstream
    KG consumers rank/threshold on (a triple asserted across many
    independent conversations outranks a one-off).  One partial-agg
    groupBy over the flagship output; countDistinct(conv_id) is exact."""
    _, named = _kg_flagship(spark, sf)
    return named.groupBy("subj_name", "pred", "obj_name").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.min("turn_idx").alias("first_turn"),
    )


def _q_kg_pred_cardinality(spark, sf):
    """Predicate cardinality profiling over the built KG — the
    schema-inference read that decides whether a predicate is functional
    (N:1), inverse-functional (1:N), or M:N before rule mining / conflict
    detection.  Two partial-agg groupBys over the distinct edge set joined
    on pred (2 rows out) — never a per-pair window."""
    _, named = _kg_flagship(spark, sf)
    d = named.select("pred", "subj_name", "obj_name").distinct()
    # every subject-side statistic folds out of ONE per-(pred, subj) partial
    # (n_pairs = sum of per-subject distinct objs; n_subj = row count;
    # max = max) — no countDistinct expands, no second pass over d
    per_subj = d.groupBy("pred", "subj_name").agg(F.count(F.lit(1)).alias("o"))
    per_obj = d.groupBy("pred", "obj_name").agg(F.count(F.lit(1)).alias("s"))
    subj_stats = per_subj.groupBy("pred").agg(
        F.sum("o").alias("n_pairs"),
        F.count(F.lit(1)).alias("n_subj"),
        F.max("o").alias("max_obj_per_subj"),
    )
    obj_stats = per_obj.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_obj"),
        F.max("s").alias("max_subj_per_obj"),
    )
    return subj_stats.join(obj_stats, "pred").select(
        "pred",
        "n_pairs",
        "n_subj",
        "n_obj",
        "max_obj_per_subj",
        "max_subj_per_obj",
        (F.col("max_obj_per_subj") == 1).alias("functional"),
    )


def _q_kg_entity_cooccur(spark, sf):
    """Canonical-entity co-mention graph: entity pairs appearing in the same
    conversation, weighted by distinct conversations — the edge generator
    for entity-graph analytics (g1/g2/g6 consume exactly this shape).
    The within-conversation self-join's fan-out is bounded by per-conv
    entity count (itself bounded by turns per conversation), never by
    corpus size — the same hub-safety argument as g4_cooccur."""
    _, named = _kg_flagship(spark, sf)
    m = (
        named.select("conv_id", F.col("subj_name").alias("name"))
        .unionByName(named.select("conv_id", F.col("obj_name").alias("name")))
        .distinct()
    )
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(b, "conv_id")
        .filter(F.col("a.name") < F.col("b.name"))
        .groupBy(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .agg(F.count(F.lit(1)).alias("n_convs"))
    )


def _q_t5_interval_overlap(spark, sf):
    """Interval overlap join over gap-sessionized spans: every pair of
    sessions (across users) that overlap in wall-clock time, with the exact
    overlap in microseconds — the concurrency/load read (how many sessions
    run at once) and the contact-tracing join shape.  The operator is the
    grid-blocked self-join from operators/temporal.py: bucket-explode, one
    equi-join on bucket, exact filter, later-start dedup — never the naive
    |sessions|^2 theta-join the oracle runs."""
    from plume_spark.operators.temporal import interval_overlap_pairs

    e = graft.load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ts_s = F.col("ts").cast("timestamp").cast("double")
    gap = ts_s - F.lag(ts_s).over(w)
    sess = (
        e.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_idx", F.sum("new_sess").over(w).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    return interval_overlap_pairs(sess, ("user_id", "session_idx"))


def _q_g9_assortativity(spark, sf):
    """Degree assortativity of the co-purchase backbone (g8's substrate):
    exact int64 degree moments + the Pearson coefficient r — the one-number
    mixing diagnostic (hub-hub vs hub-leaf wiring) run before committing to
    a partitioning strategy for iterative graph work.  Oracle generated next
    to the operator from the same edge SQL."""
    from plume_spark.operators.graph_metrics import assortativity_moments

    backbone = _co_backbone(spark, sf).filter(F.col("n_groups") >= 2)
    return assortativity_moments(backbone)


def _q_corpus_ngram_novelty(spark, sf):
    """Order-aware 8-gram novelty per document (corpus.ngram_novelty): the
    data-mixing freshness signal — see the operator docstring."""
    return corpus.ngram_novelty(graft.load(spark, sf, "documents"), n=8)


def _q_g10_clustering(spark, sf):
    """Local clustering coefficient over the co-purchase backbone (g3's
    substrate): per node, degree, triangle participation, and
    cc = 2T/(deg*(deg-1)) — the transitivity profile that separates
    community-like neighborhoods from star hubs before choosing between
    triangle-based and propagation-based algorithms.  Oracle generated next
    to the operator (clustering_oracle_sql) from the same items SQL, so the
    degree-ordered orientation and cap stay in lockstep with g3."""
    from plume_spark.operators.graph_metrics import clustering_coefficient

    return clustering_coefficient(_co_backbone(spark, sf))


def _q_ann_range_search(spark, sf):
    """Cosine range query: every embedding with cos >= 0.2 to vector 0 —
    the radius-threshold retrieval complement of ann_cosine_topk (recall
    sweeps, dedup-radius probes).  Inlined-literal scoring, zero shuffle."""
    return similarity.range_search(
        graft.load(spark, sf, "embeddings"), query_vec_id=0, tau=0.2
    )


def _q_kg_conflicts(spark, sf):
    """Functional-dependency conflict detection over the built KG: every
    (subject, predicate) asserting >= 2 distinct objects, with the sorted
    object list — the contradiction surface a KG curation pass reviews
    first (e.g. one customer 'placed' many orders is fine; two birth dates
    are not; the cardinality profile from kg_pred_cardinality says which).
    One distinct + one partial-agg groupBy over the flagship output."""
    _, named = _kg_flagship(spark, sf)
    d = named.select("subj_name", "pred", "obj_name").distinct()
    return (
        d.groupBy("subj_name", "pred")
        .agg(
            F.count(F.lit(1)).alias("n_objs"),
            F.array_join(F.array_sort(F.collect_set("obj_name")), ",").alias(
                "obj_csv"
            ),
        )
        .filter(F.col("n_objs") >= 2)
    )


def _q_w8_transition_matrix(spark, sf):
    """First-order Markov transition matrix over per-user event sequences:
    (from_type, to_type, n, p) where p is row-normalized within from_type —
    the behavioral-model read (what follows a click?) and the input to
    sequence-anomaly scoring.  One window shuffle for the lag, one
    partial-agg groupBy, then a window over the ~|types|^2 result rows —
    the normalization never touches event-scale data."""
    e = graft.load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    t = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    cnt = t.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        qround(
            F.col("n") / F.sum("n").over(Window.partitionBy("from_type")), 4
        ).alias("p"),
    )


def _q_corpus_keep_best(spark, sf):
    """Canonical-document selection: for every near-dup cluster (>= 2
    members) from the minhash/LSH + connected-components path, keep the
    highest-quality member (tie -> lowest doc_id) — the step that turns a
    dedup pair list into an actual training-corpus decision.  Clusters are
    tiny (bounded by the LSH bucket cap), so the per-cluster window is
    bounded; quality is the oracle-checked quality_score projection."""
    d = graft.load(spark, sf, "documents")
    groups = _q_dedup_groups(spark, sf)  # (doc_id, keeper_id)
    q = text.quality_score(d).select("doc_id", "quality")
    m = groups.join(q, "doc_id")
    win = Window.partitionBy("keeper_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        m.withColumn("rn", F.row_number().over(win))
        .withColumn("n_members", F.count(F.lit(1)).over(Window.partitionBy("keeper_id")))
        .filter(F.col("rn") == 1)
        .select(
            "keeper_id",
            F.col("doc_id").alias("best_doc"),
            F.col("quality").alias("best_quality"),
            "n_members",
        )
    )


def _q_text_readability(spark, sf):
    """Flesch reading ease with a vowel-group syllable proxy over documents
    (text.readability) — zero-shuffle column projection."""
    return text.readability(graft.load(spark, sf, "documents"))


def _q_w7_retention_cohorts(spark, sf):
    """Weekly cohort retention over events: cohort = the user's first-seen
    week, each (cohort_week, week_offset) cell counts distinct users still
    active that many weeks later — the canonical growth-analytics triangle.
    One groupBy for first-seen, one distinct activity projection, one
    partial-agg count — all shuffles on the keys they aggregate by."""
    e = graft.load(spark, sf, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def _q_t4_resample_gapfill(spark, sf):
    """Hourly resample with forward fill: a per-user time spine (every hour
    from the user's first to last event) left-joined to the hourly
    aggregates; empty buckets carry the previous close forward — the
    telemetry/metrics gap-fill shape.  The spine is generated by a sequence
    expression (no spine table materialized), the fill is one IGNORE NULLS
    window over the (user, bucket) shuffle the aggregate already made."""
    e = graft.load(spark, sf, "events").withColumn(
        "bucket_ts", F.date_trunc("hour", F.col("ts"))
    )
    wd = Window.partitionBy("user_id", "bucket_ts").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hourly = (
        e.withColumn("_rd", F.row_number().over(wd))
        .groupBy("user_id", "bucket_ts")
        .agg(
            F.count("*").alias("n"),
            F.max(F.when(F.col("_rd") == 1, F.col("value"))).alias("v_close"),
        )
    )
    spine = (
        e.groupBy("user_id")
        .agg(
            F.min("bucket_ts").alias("_lo"),
            F.max("bucket_ts").alias("_hi"),
        )
        .select(
            "user_id",
            F.explode(F.expr("sequence(_lo, _hi, interval 1 hour)")).alias("bucket_ts"),
        )
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "bucket_ts"], "left")
        .select(
            "user_id",
            "bucket_ts",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.round(F.last("v_close", ignorenulls=True).over(wf), 6).alias("v_fill"),
        )
    )


def _q_w5_funnel(spark, sf):
    """Ordered conversion funnel (click -> view -> purchase, strictly later
    stages only): per-stage first-completion times + reached stage.  Three
    filtered aggregates chained by user-keyed joins — each stage's input is
    only the users that reached the previous stage, so the work SHRINKS
    down the funnel (never a per-user sort of all events)."""
    e = graft.load(spark, sf, "events")
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        c.join(v, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_click",
            "t_view",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_view").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


def _q_t3_ohlc_downsample(spark, sf):
    """Time-bucketed OHLC downsample: per (user, hour) open/high/low/close
    over event values, ordered by (ts, event_id).  One window pass computes
    both endpoint ranks, then a grouped aggregate — the telemetry/market
    rollup shape (at scale: partition-pruned by the time bucket, the window
    and the aggregate share one (user, bucket) shuffle)."""
    e = graft.load(spark, sf, "events").withColumn(
        "bucket_ts", F.date_trunc("hour", F.col("ts"))
    )
    w = Window.partitionBy("user_id", "bucket_ts").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("user_id", "bucket_ts").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = e.select(
        "user_id",
        "bucket_ts",
        "value",
        F.row_number().over(w).alias("_ra"),
        F.row_number().over(wd).alias("_rd"),
    )
    return r.groupBy("user_id", "bucket_ts").agg(
        F.count("*").alias("n"),
        F.max(F.when(F.col("_ra") == 1, F.col("value"))).alias("v_open"),
        F.max("value").alias("v_high"),
        F.min("value").alias("v_low"),
        F.max(F.when(F.col("_rd") == 1, F.col("value"))).alias("v_close"),
    )


def _q_u3_except_intersect(spark, sf):
    """EXCEPT/INTERSECT set ops (beyond the reference's union-only absorb):
    users who purchased but never errored, and users who did both."""
    e = graft.load(spark, sf, "events")
    p = e.filter(F.col("event_type") == "purchase").select("user_id")
    err = e.filter(F.col("event_type") == "error").select("user_id")
    only = p.subtract(err).withColumn("kind", F.lit("purchase_only"))
    both = p.intersect(err).withColumn("kind", F.lit("both"))
    return only.unionByName(both)


def _q_a7_percentiles(spark, sf):
    """Exact interpolated percentiles per group — the latency-style summary
    every events pipeline ships; Catalyst's native percentile aggregate
    (sort-based partial agg), no sketch approximation."""
    e = graft.load(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def _q_a8_rollup(spark, sf):
    """ROLLUP aggregate (per-type subtotals + grand total) — Catalyst's
    native grouping-sets expansion, one pass."""
    e = graft.load(spark, sf, "events")
    # decimal sum: associative/exact, so the rollup total is identical under
    # any partitioning (same determinism pattern as _q_a1)
    return e.rollup("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def _q_a10_approx_distinct(spark, sf):
    """HLL++ approximate distinct (the 100 TB scale path for cardinality:
    fixed 2^p-register state per group vs an O(distinct) exact set) checked
    against its own error contract.  The sketch value itself is
    engine-specific and cannot value-match DuckDB, so the contract row
    carries (a) the EXACT distinct count, value-checked, and (b) a boolean
    asserting the HLL estimate landed within 5 sigma of its configured
    rsd=2% — deterministic because HLL registers merge by max (associative,
    commutative), so the estimate is partitioning-independent."""
    e = graft.load(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("n_hll"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("n_hll") - F.col("n_exact"))
                <= F.greatest(F.lit(1.0), F.col("n_exact") * 0.10)
            ).alias("hll_ok"),
        )
    )


def _q_a11_approx_quantile(spark, sf):
    """Greenwald-Khanna quantile sketch (percentile_approx) checked against
    its rank-error contract.  accuracy=10000 bounds rank error at 1e-4; the
    boolean asserts the sketch's p50 lies between the EXACT 0.49 and 0.51
    percentiles (100x the guaranteed bound), which holds under ANY merge
    order of the sketch, so the row is partitioning-independent.  The exact
    interpolated p50 is the value-checked column (same pattern as a7)."""
    e = graft.load(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_exact"),
            F.expr("percentile_approx(value, 0.5, 10000)").alias("p50_gk"),
            F.expr("percentile(value, 0.49)").alias("_lo"),
            F.expr("percentile(value, 0.51)").alias("_hi"),
        )
        .select(
            "event_type",
            "p50_exact",
            ((F.col("p50_gk") >= F.col("_lo")) & (F.col("p50_gk") <= F.col("_hi"))).alias(
                "gk_ok"
            ),
        )
    )


def _q_g2_components(spark, sf):
    """Distributed connected components (driver kernel disabled) over the
    DAG with part edges thinned to obj % 23 == 0 — a multi-component graph
    (~300 components at sf0.01) whose label paths run 8+ hops, so the gate
    exercises the real iterative salted label-propagation loop."""
    from plume_spark.operators.components import connected_components

    # build from source tables so "is a part edge" is provenance, not an id
    # ordinal (obj < NODE_PART_OFFSET breaks once o_orderkey spills past the
    # offset at large sf, and would silently diverge from the oracle)
    o = graft.load(spark, sf, "orders")
    li = graft.load(spark, sf, "lineitem")
    e1 = o.select(
        F.col("o_custkey").alias("subj"),
        (F.lit(graft.NODE_ORDER_OFFSET) + F.col("o_orderkey")).alias("obj"),
    )
    e2 = li.select(
        (F.lit(graft.NODE_ORDER_OFFSET) + F.col("l_orderkey")).alias("subj"),
        (F.lit(graft.NODE_PART_OFFSET) + F.col("l_partkey")).alias("obj"),
    ).filter(F.col("obj") % 23 == 0)
    # max_iters matches the oracle's unroll depth (n_iters=32 below): a graph
    # too deep for the oracle now fails LOUDLY on the Spark side instead of
    # both sides silently agreeing on non-converged labels
    return connected_components(
        e1.unionByName(e2), src="subj", dst="obj", driver_max_edges=0, max_iters=32
    )


def _q_g3_triangles(spark, sf):
    """Per-node triangle counts on the part co-purchase graph (parts sharing
    an order), degree-ordered orientation — hub-safe wedge joins."""
    from plume_spark.operators.graph_metrics import triangle_count

    return triangle_count(_co_backbone(spark, sf))


def _q_g4_cooccur(spark, sf):
    """Co-occurrence edge generation itself (entity co-mention analog):
    part pairs sharing an order, with shared-order counts."""
    from plume_spark.operators.graph_metrics import co_occurrence_edges

    li = graft.load(spark, sf, "lineitem")
    return co_occurrence_edges(li, "l_orderkey", "l_partkey")


def _q_g6_label_prop(spark, sf):
    """Synchronous label propagation (2 rounds) over the transcript DAG read
    as an undirected graph — deterministic community labels (neighbor
    majority, min-label ties).  The oracle is generated next to the
    operator (label_prop_oracle_sql) with the rounds unrolled, so the
    symmetrization and tie-break rules can never silently diverge."""
    from plume_spark.operators.graph_metrics import label_propagation

    edges = graft.dag_edges(spark, sf)
    return label_propagation(edges, n_iters=2, a="subj", b="obj")


def _q_g7_kcore(spark, sf):
    """k-core (k=3) of the part co-purchase graph: iterative whole-round
    peeling until fixpoint — the cohesion filter run before community or
    embedding passes.  The engine peels with a convergence test and raises
    past max_iters; the oracle unrolls the same number of rounds (peeling
    is idempotent at the fixpoint, so over-unrolling is harmless and
    under-unrolling cannot pass silently)."""
    from plume_spark.operators.graph_metrics import k_core

    return k_core(_co_backbone(spark, sf), k=3, max_iters=8)


def _q_g8_common_neighbors(spark, sf):
    """Link prediction over the strong-tie backbone (part pairs sharing >= 2
    orders): for every non-adjacent pair with a shared neighbor, the
    common-neighbor count and neighbor-set Jaccard — the structural
    missing-edge candidate generator.  Middle nodes above the degree cap
    are excluded from the wedge role (hub pairs carry no signal), the same
    degenerate-hub policy as the LSH band cap."""
    from plume_spark.operators.graph_metrics import common_neighbors

    backbone = _co_backbone(spark, sf).filter(F.col("n_groups") >= 2)
    return common_neighbors(backbone, max_degree=64)


def _q_w6_event_runs(spark, sf):
    """Consecutive-run detection (gaps-and-islands): per user and event
    type, the longest unbroken run and run count — the retry/streak pattern
    read (N failed tool calls in a row) that sequential transcript QA
    needs.  Two window row_numbers whose DIFFERENCE is constant within a
    run (the textbook islands trick: no self-join, no UDF), then two
    partial aggs; both windows share the one (user_id) shuffle."""
    e = graft.load(spark, sf, "events")
    w_all = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    runs = (
        e.withColumn("grp", F.row_number().over(w_all) - F.row_number().over(w_typ))
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("user_id", "event_type").agg(
        F.max("run_len").alias("max_run"), F.count(F.lit(1)).alias("n_runs")
    )


def _q_corpus_quality_tiers(spark, sf):
    """CCNet-style quality tiering: bucket docs by their unigram
    log-likelihood against FIXED thresholds (head/middle/tail), report
    per-tier doc and token totals — the corpus-curriculum split.  Fixed
    thresholds (not quantiles) are the scale-safe reading: no global sort
    or single-partition window, the tier is a pure projection over the
    per-doc score, and the aggregate is two partial-agg sums.  Thresholds
    compare the 6dp-ROUNDED score, which both engines agree on, so the
    bucketing is deterministic cross-engine."""
    lp = corpus.unigram_logprob(graft.load(spark, sf, "documents"))
    tier = (
        F.when(F.col("avg_logprob") > -3.401, F.lit("head"))
        .when(F.col("avg_logprob") > -3.404, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        lp.withColumn("tier", tier)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens_total"),
        )
    )


def _q_ann_knn_graph(spark, sf):
    """Approximate k-NN graph over the embeddings table (k=5, LSH-bucket
    candidates): per vector, its top-5 same-bucket neighbors by cosine —
    the embedding-space graph substrate.  Rank is on the 4dp-rounded
    cosine with neighbor-id tie-break, so the result set is deterministic
    cross-engine despite float ordering."""
    return similarity.knn_graph(graft.load(spark, sf, "embeddings"), k=5)


def _q_diag_hot_keys(spark, sf):
    """Skew diagnostic: heaviest join-key values with row share — what sizes
    n_salts / flags AQE-skew candidates before a big join."""
    from plume_spark.operators.skew import hot_keys

    return hot_keys(graft.load(spark, sf, "events"), "user_id", top_n=20)


def _q_t1_asof_join(spark, sf):
    """As-of join (union-window composition, one shuffle): each purchase gets
    the latest same-user view at or before it."""
    from plume_spark.operators.temporal import asof_join

    ev = graft.load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases, views, key="user_id", right_vals=("event_id",), prefix="matched_"
    )
    return out.select(
        "event_id", "user_id", F.col("matched_event_id").alias("matched_view")
    )


def _q_t7_asof_tolerance(spark, sf):
    """As-of join with a staleness tolerance (pandas merge_asof's
    ``tolerance``, kdb wj's window edge): each purchase matches the latest
    same-user view at or before it ONLY if that view is at most 10 minutes
    old — older matches null out, and the match age rides along in
    microseconds.  Pure post-projection over the one-shuffle union-window
    as-of (the carried right timestamp makes the age computable without a
    second join), so the tolerance costs nothing at scale."""
    from plume_spark.operators.temporal import asof_join

    ev = graft.load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases, views, key="user_id",
        right_vals=("event_id", "ts"), prefix="matched_",
    )
    age_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("matched_ts").cast("timestamp")
    )
    fresh = F.col("matched_ts").isNotNull() & (age_us <= 600 * 1_000_000)
    return out.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("matched_event_id")).alias("matched_view"),
        F.when(fresh, age_us).alias("age_us"),
    )


def _q_t2_range_join(spark, sf):
    """Bounded range join (bucketed, linear candidates): per purchase, the
    count of same-user clicks in the preceding hour."""
    from plume_spark.operators.temporal import range_join_count

    ev = graft.load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = range_join_count(purchases, clicks, key="user_id", before_s=3600, after_s=0)
    return out.select("event_id", "user_id", "n_in_range")


def _q_j4(spark, sf):
    c = graft.load(spark, sf, "customer")
    keys = c.sparkSession.createDataFrame([(k,) for k in LOOKUP_NAMES], ["c_name"])
    return traversal.point_lookup(c, keys, "c_name").select("c_custkey", "c_name")


def _q_dedup_exact(spark, sf):
    return dedup.exact_dedup(graft.load(spark, sf, "documents"))


def _q_dedup_minhash(spark, sf):
    d = graft.load(spark, sf, "documents")
    out = dedup.minhash_dedup(d, portable_ids=True)
    return out.select("doc_a", "doc_b", qround(F.col("jaccard"), 4).alias("jaccard"))


def _q_dedup_simhash(spark, sf):
    return dedup.simhash(graft.load(spark, sf, "documents"), portable_ids=True)


def _q_dedup_ngram(spark, sf):
    d = graft.load(spark, sf, "documents")
    out = dedup.ngram_jaccard_pairs(d, n=3, tau=0.5)
    return out.select("doc_a", "doc_b", qround(F.col("jaccard"), 4).alias("jaccard"))


def _q_dedup_embedding(spark, sf):
    return dedup.embedding_neardup(graft.load(spark, sf, "embeddings"), tau=0.35)


def _q_dedup_lsh_recall(spark, sf):
    """Dedup retrieval-quality audit — the dedup pillar's sibling of
    ann_multiprobe_topk: ground truth = the exact shingle-blocked Jaccard
    pairs (dedup_ngram_jaccard's parity path), candidate = the banded
    MinHash/LSH pipeline actually used at scale, both at the same tau/unit
    so the comparison is apples-to-apples.  Per exact pair: whether LSH
    found it, plus the exact counts and the acceptance bit
    (n_found * 5 >= n_exact * 4, i.e. recall@tau >= 0.8) — INTEGER
    arithmetic only, so the pin can never trip on float rounding.  With
    16 hashes in 8 two-row bands, P(candidate | J) = 1 - (1 - J^2)^8
    (~0.90 at J = 0.5, ->1 above 0.7); the measured recall tells whether
    the band geometry holds on THIS corpus — the number that justifies
    trusting the sub-quadratic path before turning off the exact one.

    Scale: the exact side is the quadratic-in-hot-shingles parity path —
    audit-only, run on samples at 100 TB; the LSH side is the production
    plan unchanged."""
    d = graft.load(spark, sf, "documents")
    exact = dedup.ngram_jaccard_pairs(d, n=3, tau=0.5).select(
        "doc_a", "doc_b", qround(F.col("jaccard"), 4).alias("jaccard")
    )
    approx = dedup.minhash_dedup(d, portable_ids=True).select(
        "doc_a", "doc_b", F.lit(1).alias("_f")
    )
    j = exact.join(F.broadcast(approx), ["doc_a", "doc_b"], "left")
    w = Window.partitionBy()  # pair-audit table — never raw rows
    found = F.col("_f").isNotNull()
    n_exact = F.count(F.lit(1)).over(w)
    n_found = F.sum(found.cast("int")).over(w)
    return j.select(
        "doc_a",
        "doc_b",
        "jaccard",
        found.alias("lsh_found"),
        n_exact.cast("long").alias("n_exact"),
        n_found.cast("long").alias("n_found"),
        (n_found * 5 >= n_exact * 4).alias("recall_ok"),
    )


def _q_p5(spark, sf):
    # property-presence filter (has(ORDER) analog): events rows with a tool/props value
    e = graft.load(spark, sf, "events")
    return e.filter(F.col("props").isNotNull() & (F.col("props") != "")).select(
        "event_id", "event_type"
    )


def _q_p6(spark, sf):
    # theta predicate on property (orderGt(2) analog)
    e = graft.load(spark, sf, "events")
    return e.filter(F.col("value") > 2).select("event_id", "value")


def _q_p9(spark, sf):
    # role/config-file dispatch filter (isClass/isConfigFile analog)
    t = graft.transcripts_from_events(spark, sf)
    return t.filter(F.col("role").isin("click", "purchase")).select(
        "conv_id", "turn_idx", "role"
    )


def _q_a3(spark, sf):
    # bare node count (clear-path decision, NeptuneDriver.scala:69-77)
    return graft.load(spark, sf, "customer").agg(F.count("*").alias("n"))


def _q_j5(spark, sf):
    # unindexed scan-lookup variant of J4: same semantics, shuffle-hash join
    # forced (no broadcast) — the reference's index-off benchmark twin
    c = graft.load(spark, sf, "customer")
    keys = c.sparkSession.createDataFrame([(k,) for k in LOOKUP_NAMES], ["c_name"])
    return (
        c.join(keys.hint("shuffle_hash"), "c_name", "left_semi")
        .select("c_custkey", "c_name")
    )


def _q_f2(spark, sf):
    # list<->CSV round-trip (IDriver.serializeLists/deserializeLists)
    d = graft.load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return d.select(
        "doc_id",
        F.concat_ws(",", toks).alias("csv"),
        F.size(toks).cast("long").alias("n_items"),
        F.split(F.concat_ws(",", toks), ",").getItem(0).alias("first_item"),
    )


def _q_f8(spark, sf):
    # deterministic content-hash IDs (artifact/method-body hashes, CHANGELOG.md:694,704)
    c = graft.load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.sha2(F.concat_ws("|", F.lit("customer"), "c_name"), 256).alias("content_hash"),
    )


def _q_j8(spark, sf):
    # schema-constraint anti-join: level-2 edges whose subj is NOT a customer
    # node (checkEdgeConstraint recast) — count of out-of-domain sources
    edges = graft.dag_edges(spark, sf)
    cust = graft.load(spark, sf, "customer").select(
        F.col("c_custkey").alias("subj")
    )
    return edges.join(cust, "subj", "left_anti").agg(
        F.count("*").alias("n_violations")
    )


def _q_w1_reassemble(spark, sf):
    # per-turn text-equality round trip: turns concatenated in stable order
    # (the north-rule invariant; reference analog TinkerGraphDbTests.scala:20-67)
    from plume_spark.operators.ordering import reassemble

    t = graft.transcripts_from_events(spark, sf)
    return reassemble(t)


def _q_text_stats(spark, sf):
    return text.token_stats(graft.load(spark, sf, "documents")).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        "avg_token_len",
        F.col("n_subtokens").cast("long").alias("n_subtokens"),
    )


def _q_text_quality(spark, sf):
    return text.quality_score(graft.load(spark, sf, "documents"))


def _q_text_langid(spark, sf):
    return text.language_id(graft.load(spark, sf, "documents"))


def _q_text_fingerprint(spark, sf):
    return text.fingerprint(graft.load(spark, sf, "documents"))


def _q_ann_topk(spark, sf):
    return similarity.brute_force_topk(
        graft.load(spark, sf, "embeddings"), query_vec_id=0, k=10
    )


def _q_ann_batch_topk(spark, sf):
    """Batched vector search: top-3 per query for the 5-query batch
    vec_id < 5, one broadcast + one window in a single plan (see
    similarity.batch_topk)."""
    return similarity.batch_topk(
        graft.load(spark, sf, "embeddings"), n_queries=5, k=3
    )


def _q_ann_recall_curve(spark, sf):
    """The recall-vs-cost CURVE for IVF probing: for n_probe in (1, 2, 4),
    the candidate-set size the probe pays and how many of the exact top-10
    it recovers — the table an operator actually tunes nprobe from
    (ann_lsh_recall and ann_multiprobe_topk pin the two endpoints; this
    measures the middle).  All three outputs are exact int64 counts —
    nothing float-rounded — so the curve is hash-portable by construction.

    Scale: ONE assignment pass shared by all three probe levels (the
    centroid table broadcasts; members-only scans per level), three
    top-10 TakeOrderedAndProject's, and count aggregates — the per-level
    cost is the probed fraction of one scan, which is the point."""
    emb = graft.load(spark, sf, "embeddings")
    # the three tiny shared tables (10-row exact baseline, 8-row ranked
    # cells, member assignment) checkpoint once — every probe level reuses
    # them instead of re-deriving its own copy
    exact10 = (
        similarity.brute_force_topk(emb, 0, k=10)
        .select("vec_id")
        .localCheckpoint(eager=True)
    )
    assigned, cents, cos = similarity.ivf_assign(emb)
    assigned = assigned.localCheckpoint(eager=True)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    ranked_cells = (
        cents.crossJoin(F.broadcast(q))
        .select("cent_id", cos(F.col("cvec"), F.col("qvec")).alias("sim"))
        .orderBy(F.col("sim").desc(), "cent_id")
        .localCheckpoint(eager=True)
    )
    out = None
    for np_ in (1, 2, 4):
        cells = ranked_cells.limit(np_).select("cent_id")
        cand = assigned.join(F.broadcast(cells), "cent_id")
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        top = (
            cand.crossJoin(F.broadcast(q))
            .select(
                "vec_id", F.round(cos(F.col("emb"), F.col("qvec")), 4).alias("c")
            )
            .orderBy(F.col("c").desc(), "vec_id")
            .limit(10)
            .select("vec_id")
        )
        hit = top.join(exact10, "vec_id").agg(F.count(F.lit(1)).alias("n_hit"))
        row = (
            n_cand.crossJoin(hit)
            .select(
                F.lit(np_).alias("n_probe"),
                "n_candidates",
                "n_hit",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _q_ann_filtered_topk(spark, sf):
    """Filtered vector search: exact top-10 among label % 3 == 0 vectors
    for query vec 0 (which is NOT constrained to the filter) — the
    metadata-predicate serving shape, pre-filtered so selectivity makes
    the scan cheaper (see similarity.filtered_topk)."""
    return similarity.filtered_topk(
        graft.load(spark, sf, "embeddings"),
        query_vec_id=0,
        pred=F.col("label") % 3 == 0,
        k=10,
    )


def _q_ann_lsh(spark, sf):
    return similarity.lsh_buckets(graft.load(spark, sf, "embeddings")).select(
        "vec_id", F.col("bucket").cast("long").alias("bucket")
    )


def _q_ann_blocked(spark, sf):
    return similarity.blocked_cosine_pairs(
        graft.load(spark, sf, "embeddings"), block_col="label", tau=0.35
    )


def _q_ann_ivf(spark, sf):
    return similarity.ivf_topk(
        graft.load(spark, sf, "embeddings"), query_vec_id=0, k=10, n_centroids=8, n_probe=2
    )


def _q_ann_multiprobe_topk(spark, sf):
    """Multi-probe retrieval with the quality contract IN-BAND: the query
    probes its 3 nearest coarse cells, the candidate union pays the exact
    rerank (ivf_topk's broadcast-pruned plan — no full-corpus scoring),
    and the output carries the measured recall@10 against the exact
    cosine top-10 with the >= 0.8 acceptance bit PINNED by the oracle.
    This closes the ANN quality story ann_lsh_recall opened: single-probe
    sign-hyperplane LSH reads recall@10 = 0.1 on this corpus, and widening
    to Hamming-radius-3 multi-probe (41% of the corpus as candidates!)
    still only reaches 0.6-0.7 — near-isotropic embeddings defeat
    data-oblivious hyperplanes — while the data-adaptive coarse quantizer
    reaches 1.0 probing 3 of 8 cells.  Measured, not assumed: the recall
    column IS the contract, so a corpus where multi-probe stopped working
    would fail the gate rather than silently serve bad neighbors.

    Scale: candidate generation is a broadcast of 3 cell ids against the
    bucketed member table (at 10^9 vectors: members of 3/nlist cells, the
    FAISS nprobe shape); the rerank touches candidates only; the audit
    joins two 10-row broadcast sides and the recall window runs over 10
    rows — nothing global beyond ivf_topk's own plan."""
    emb = graft.load(spark, sf, "embeddings")
    top = similarity.ivf_topk(emb, query_vec_id=0, k=10, n_centroids=8, n_probe=3)
    exact = similarity.brute_force_topk(emb, query_vec_id=0, k=10).select(
        F.col("vec_id").alias("e_id")
    )
    h = top.join(F.broadcast(exact), top["vec_id"] == F.col("e_id"), "left").select(
        "vec_id", "cos_sim", F.col("e_id").isNotNull().alias("in_exact_topk")
    )
    w = Window.partitionBy()  # 10-row audit table — never raw rows
    rec = F.sum(F.col("in_exact_topk").cast("int")).over(w) / F.lit(10.0)
    return h.select(
        "vec_id",
        "cos_sim",
        "in_exact_topk",
        rec.alias("recall_at_10"),
        (rec >= 0.8).alias("recall_ok"),
    )


def _q_kg_extract_raw(spark, sf):
    t = graft.kg_transcripts(spark, sf)
    _, raw = split_changelog(extract_changelog(t))
    return raw.select("conv_id", "turn_idx", "subj_norm", "pred", "obj_norm")


def _q_kg_build(spark, sf):
    t = graft.kg_transcripts(spark, sf)
    return triples_with_names(run_pipeline(t, tau=0.95))


def _q_j8b_kind_constraints(spark, sf):
    # endpoint-KIND constraint validation (SchemaBuilder.checkEdgeConstraint):
    # perturb every 7th turn's obj_kind to 'tool' — works_at/visited require
    # obj kind 'org', so exactly those rows violate; count per pred.
    from plume_spark.operators.constraints import kind_violations

    t = graft.kg_transcripts(spark, sf)
    _, raw = split_changelog(extract_changelog(t))
    typed = raw.select(
        "pred",
        "subj_kind",
        F.when(F.col("turn_idx") % 7 == 0, F.lit("tool"))
        .otherwise(F.col("obj_kind"))
        .alias("obj_kind"),
    )
    return kind_violations(typed).groupBy("pred").agg(
        F.count("*").alias("n_violations")
    )


def _q_parent_walk(spark, sf):
    # astUp analog (OverflowDbReadBenchmark.scala:70-78): root-ward walk from
    # part leaves through orders to customers over the 3-level DAG.
    edges = graft.dag_edges(spark, sf)
    seeds = (
        graft.load(spark, sf, "lineitem")
        .filter(F.col("l_partkey") < 3)
        .select((F.lit(graft.NODE_PART_OFFSET) + F.col("l_partkey")).alias("node"))
        .distinct()
    )
    return traversal.parent_walk(edges, seeds)


def _q_order_sum(spark, sf):
    # orderSum read benchmark (OverflowDbReadBenchmark.scala:81-89) through
    # the traversal module; l_linenumber is the integer 'order' property.
    nodes = graft.load(spark, sf, "lineitem").select(
        F.col("l_linenumber").alias("order")
    )
    return traversal.order_sum(nodes)


def _q_order_count(spark, sf):
    # callOrder filtered count (OverflowDbReadBenchmark.scala:92-99).
    nodes = graft.load(spark, sf, "lineitem").select(
        F.col("l_linenumber").alias("order")
    )
    return traversal.filtered_count(nodes, "order", 2)


def _q_a4_map_merge(spark, sf):
    # A4 per-id property-map group-merge (TigerGraphDriver.scala:233-237):
    # first-wins per key, key-sorted map; projected to k=v CSV for the
    # engine-portable value hash.
    from plume_spark.operators.properties import merge_property_maps

    e = graft.load(spark, sf, "events").withColumn(
        "props", F.coalesce("props", F.lit(""))
    )
    merged = merge_property_maps(e, "user_id", "event_type", "props", "event_id")
    return merged.select(
        "user_id",
        F.concat_ws(
            ";",
            F.transform(
                F.map_entries("props"),
                lambda kv: F.concat_ws("=", kv["key"], kv["value"]),
            ),
        ).alias("props_csv"),
    )


def _q_mm_features(spark, sf):
    from plume_spark.operators.multimodal import extract_features

    media = graft.documents_media(spark, sf)
    return extract_features(media).select(
        "media_id",
        "modality",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "checksum",
    )


def _q_mm_frame_sample(spark, sf):
    # video frame-sampling fan-out plan: pure column arithmetic, payload
    # never read (column pruning drops it from the scan)
    from plume_spark.operators.multimodal import frame_sample_plan

    media = graft.documents_media(spark, sf)
    return frame_sample_plan(media, every_ms=1000).select(
        "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    )


def _reap_stale_dirs(prefix: str) -> None:
    """Best-effort reclaim of DEAD processes' streaming work dirs: each dir
    embeds its owning pid; a live concurrent process keeps its dirs (os.kill
    probe — portable, no /proc dependency).  Output parquet must outlive its
    creating call (the returned DataFrame is collected lazily), so each run
    cleans up after earlier ones instead of itself."""
    import glob
    import shutil
    import tempfile

    for stale in glob.glob(f"{tempfile.gettempdir()}/{prefix}-*-p*"):
        try:
            owner = int(stale.rsplit("-p", 1)[1])
        except ValueError:
            continue
        if owner == os.getpid():
            continue
        try:
            os.kill(owner, 0)
        except ProcessLookupError:
            shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass


def _q_stream_kg_build(spark, sf):
    """The FULL KG pipeline fed by a real Structured Streaming drain instead
    of a batch read: transcripts land as three parquet files (split by
    conversation hash — bulk upstream landings), a file-source stream with
    maxFilesPerTrigger=1 folds each epoch's extraction into the snapshot
    staging table via MERGE-on-rec_id (exactly-once effect), and one
    materialization pass links + canonicalizes + persists the graph tables.
    The returned triples are read back FROM THE STORE, so the oracle (the
    flagship canonicalization CTE) checks the whole streaming persist path
    end-to-end: stream == batch is not just a pytest claim, it's
    value-checked against SQL on every gate run."""
    import tempfile
    from types import SimpleNamespace

    from plume_spark.store import GraphStore
    from plume_spark.streaming import read_transcript_stream, stream_build

    _reap_stale_dirs("plume-kgbuild-contract")
    d = tempfile.mkdtemp(prefix="plume-kgbuild-contract-", suffix=f"-p{os.getpid()}")
    inbox, ckpt = f"{d}/in", f"{d}/ck"

    t = graft.kg_transcripts(spark, sf)
    bucket = F.pmod(F.xxhash64("conv_id"), F.lit(3))
    for i in range(3):
        t.filter(bucket == i).write.mode("append").parquet(inbox)

    store = GraphStore(spark, f"{d}/store")
    stream_build(
        read_transcript_stream(spark, inbox, max_files_per_trigger=1),
        store,
        ckpt,
        tau=0.95,
    )
    result = SimpleNamespace(
        entities=store.entities.read(), triples=store.triples.read()
    )
    return triples_with_names(result)


def _q_kg_build_incr(spark, sf):
    """Incremental BATCH KG build under the value gate (A7/A9 as a contract
    query, not just pytest): build the store from the first 43 of 64
    conversation hash-buckets, then fold the full transcript set in a second
    build_graph call — per-bucket lineage must SKIP the 43 already-committed
    buckets (asserted loudly: the second call may extract at most the 21 new
    ones), extraction MERGEs only the delta, and one global re-materialize
    (canonical names are component-wide minima, so linking is re-run over
    the compact change log, never the transcript text).  The store's final
    triples are read back and checked against the SAME SQL oracle as the
    batch flagship — incremental == one-shot, value-identical."""
    import tempfile
    from types import SimpleNamespace

    from plume_spark.pipeline import build_graph
    from plume_spark.store import GraphStore

    _reap_stale_dirs("plume-incr-contract")
    d = tempfile.mkdtemp(prefix="plume-incr-contract-", suffix=f"-p{os.getpid()}")
    store = GraphStore(spark, f"{d}/store")
    t = graft.kg_transcripts(spark, sf)
    first = t.filter(F.pmod(F.xxhash64("conv_id"), F.lit(64)) < 43)
    build_graph(first, store, n_buckets=64, tau=0.95)
    stats = build_graph(t, store, n_buckets=64, tau=0.95)
    if stats["pending_units"] > 21:
        raise RuntimeError(
            f"incremental build re-extracted {stats['pending_units']} buckets; "
            "unchanged-input skip (A9) regressed"
        )
    result = SimpleNamespace(
        entities=store.entities.read(), triples=store.triples.read()
    )
    return triples_with_names(result)


def _q_stream_turn_counts(spark, sf):
    """The watermarked streaming-aggregation surface run for real: the kg
    transcripts land as two files (split by conversation hash), a
    file-source stream drains them one file per epoch, and the per-(hour
    window, conversation) turn counters fold across epochs in aggregation
    state (complete output into a memory sink — the monitoring-view shape).
    The oracle is the equivalent batch GROUP BY over the same derivation,
    so the cross-epoch state fold is value-checked, not just row-counted."""
    import tempfile
    import time

    from plume_spark.streaming import read_transcript_stream, stream_turn_counts

    _reap_stale_dirs("plume-wmagg-contract")
    d = tempfile.mkdtemp(prefix="plume-wmagg-contract-", suffix=f"-p{os.getpid()}")
    inbox = f"{d}/in"
    t = graft.kg_transcripts(spark, sf)
    bucket = F.pmod(F.xxhash64("conv_id"), F.lit(2))
    for i in range(2):
        t.filter(bucket == i).write.mode("append").parquet(inbox)
    name = f"turn_counts_{os.getpid()}_{int(time.time() * 1000)}"
    q = (
        stream_turn_counts(read_transcript_stream(spark, inbox, max_files_per_trigger=1))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _q_stream_ordered_release(spark, sf):
    # The custom stateful streaming operator (applyInPandasWithState) run for
    # real: land the kg transcripts out of order (turn tails first, heads in
    # a later file), drain with maxFilesPerTrigger=1 so the tails must buffer
    # in state across micro-batches, and return the released rows.  The
    # oracle is exact — in-order exactly-once release means the released set
    # IS the transcript set (per-turn text equality under stable ordering,
    # the north-rule invariant, now under continuous out-of-order arrival).
    import tempfile
    import time

    from plume_spark.streaming import ordered_turn_release, read_transcript_stream

    _reap_stale_dirs("plume-stream-contract")
    t = graft.kg_transcripts(spark, sf)
    d = tempfile.mkdtemp(prefix="plume-stream-contract-", suffix=f"-p{os.getpid()}")
    inbox, ckpt, outdir = f"{d}/in", f"{d}/ck", f"{d}/out"
    t.filter("turn_idx >= 1").write.mode("append").parquet(inbox)
    time.sleep(0.1)
    t.filter("turn_idx < 1").write.mode("append").parquet(inbox)
    q = (
        ordered_turn_release(read_transcript_stream(spark, inbox, max_files_per_trigger=1))
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(outdir).select("conv_id", "turn_idx", "role", "text")


def _q_stream_sessionize(spark, sf):
    # The SECOND custom stateful operator run for real: gap sessionization
    # under bounded-disorder continuous arrival.  Events land in three
    # chronological windows, except events within 10 minutes of a window
    # boundary straggle into the NEXT file — they arrive an epoch late but
    # ahead of the 30-minute watermark, so state must reorder them.  Two
    # far-future sentinel landings advance the global watermark and fire the
    # event-time timeouts that flush every buffered tail.  The oracle is the
    # batch w3 window semantics (same gap rule), sentinel user excluded.
    import datetime
    import tempfile
    import time

    from plume_spark.streaming.ingest import file_stream
    from plume_spark.streaming.stateful import stream_sessionize

    _reap_stale_dirs("plume-sess-contract")
    e = graft.load(spark, sf, "events")
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    straggle = datetime.timedelta(minutes=10)
    d = tempfile.mkdtemp(prefix="plume-sess-contract-", suffix=f"-p{os.getpid()}")
    inbox, ckpt, outdir = f"{d}/in", f"{d}/ck", f"{d}/out"
    bounds = [lo + span, lo + 2 * span]
    ts = F.col("ts")
    windows = [
        ts < F.lit(bounds[0]),
        (ts >= F.lit(bounds[0])) & (ts < F.lit(bounds[1])),
        ts >= F.lit(bounds[1]),
    ]
    is_straggler = F.lit(False)
    for b in bounds:
        is_straggler = is_straggler | ((ts >= F.lit(b - straggle)) & (ts < F.lit(b)))
    prev_stragglers = None
    for k, w in enumerate(windows):
        cur = e.filter(w)
        land = cur.filter(~is_straggler) if k < 2 else cur
        if prev_stragglers is not None:
            land = land.unionByName(prev_stragglers)
        prev_stragglers = cur.filter(is_straggler) if k < 2 else None
        land.write.mode("append").parquet(inbox)
        time.sleep(0.15)

    def drain():
        q = (
            stream_sessionize(
                file_stream(spark, inbox, e.schema, max_files_per_trigger=1),
                watermark="30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    for i in (1, 2):
        sent = spark.createDataFrame(
            [(10**9 + i, hi + datetime.timedelta(days=30 * i), -1, "click", 0.0, "{}")],
            e.schema,
        )
        sent.write.mode("append").parquet(inbox)
        time.sleep(0.15)
        drain()
    return (
        spark.read.parquet(outdir)
        .filter("user_id >= 0")
        .select("event_id", "user_id", "session_idx")
    )


def _q_stream_dedup(spark, sf):
    """Continuous near-dup dedup run as a REAL stream: documents land as
    three parquet files (split by doc_id mod 3 — staggered crawl drops), a
    file-source stream with maxFilesPerTrigger=1 folds each epoch into a
    persisted DedupIndex (MERGE/append + registry, exactly-once under
    replay), and the output is the AGGREGATED pair table read back from
    the index.  The oracle is the full-corpus banded-MinHash SQL — so the
    central streaming-dedup identity (union of per-epoch incremental pair
    sets == one offline run over everything) is value-checked on every
    gate run, not just asserted in pytest.  portable_ids=True keys the
    minhash on the engine-portable gram ids the oracle replicates."""
    import tempfile

    from plume_spark.streaming import DedupIndex, read_document_stream, stream_dedup

    _reap_stale_dirs("plume-sdedup-contract")
    d = tempfile.mkdtemp(prefix="plume-sdedup-contract-", suffix=f"-p{os.getpid()}")
    docs = graft.load(spark, sf, "documents")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).write.mode("append").parquet(f"{d}/in")
    idx = DedupIndex(spark, f"{d}/index")
    stream_dedup(
        read_document_stream(spark, f"{d}/in", max_files_per_trigger=1),
        idx,
        f"{d}/ck",
        portable_ids=True,
    )
    return idx.pairs.read().select("doc_a", "doc_b", "jaccard")


def _q_dedup_incr(spark, sf):
    # incremental near-dup: docs with doc_id % 4 == 0 arrive as the "new
    # crawl batch"; the rest are the pre-built index.  Output = pairs
    # touching a new doc, identical to a full re-run's pairs for those docs.
    d = graft.load(spark, sf, "documents")
    old = d.filter(F.col("doc_id") % 4 != 0)
    new = d.filter(F.col("doc_id") % 4 == 0)
    osigs, otoks = dedup.minhash_state(old, portable_ids=True)
    nsigs, ntoks = dedup.minhash_state(new, portable_ids=True)
    out = dedup.incremental_neardup(osigs, otoks, nsigs, ntoks)
    return out.select("doc_a", "doc_b", qround(F.col("jaccard"), 4).alias("jaccard"))


def _q_dedup_groups(spark, sf):
    """The dedup deliverable: near-dup clusters.  MinHash pairs -> connected
    components (min doc_id = the cluster keeper) — pure composition of the
    two oracle-checked operators."""
    from plume_spark.operators.components import connected_components

    d = graft.load(spark, sf, "documents")
    pairs = dedup.minhash_dedup(d, portable_ids=True)
    # max_iters matches the oracle's unroll depth (n_iters=10): too-deep
    # clusters raise here rather than silently diverge from the oracle
    return connected_components(
        pairs, src="doc_a", dst="doc_b", driver_max_edges=0, max_iters=10
    ).withColumnRenamed("node", "doc_id").withColumnRenamed("component", "keeper_id")


def _q_corpus_decon(spark, sf):
    # benchmark decontamination: train-doc 5-gram overlap vs a deterministic
    # held-out subset (doc_id % EVAL_MOD == 0 plays the eval suite)
    d = graft.load(spark, sf, "documents")
    train = d.filter(F.col("doc_id") % corpus.EVAL_MOD != 0)
    ev = d.filter(F.col("doc_id") % corpus.EVAL_MOD == 0)
    return corpus.ngram_overlap(train, ev, n=5)


def _q_corpus_boilerplate(spark, sf):
    return corpus.boilerplate_score(graft.load(spark, sf, "documents"), n=3, min_docs=10)


def _q_corpus_split(spark, sf):
    return corpus.train_val_split(graft.load(spark, sf, "documents"), val_pct=10)


def _q_corpus_tfidf(spark, sf):
    return corpus.tfidf_topk(graft.load(spark, sf, "documents"), k=3)


def _q_corpus_pack(spark, sf):
    return corpus.pack_chunks(graft.load(spark, sf, "documents"), budget=256, n_shards=8)


def _q_w9_peak_concurrency(spark, sf):
    """Per-day peak session concurrency via the day-partitioned sweep line
    (operators/temporal.py:peak_concurrency) over the same gap-sessionized
    spans as t5 — the capacity read (max simultaneous sessions) that the
    naive global +1/-1 sweep cannot produce at scale without serializing."""
    from plume_spark.operators.temporal import peak_concurrency

    e = graft.load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ts_s = F.col("ts").cast("timestamp").cast("double")
    gap = ts_s - F.lag(ts_s).over(w)
    sess = (
        e.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_idx", F.sum("new_sess").over(w).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    return peak_concurrency(sess)


def _q_text_word_entropy(spark, sf):
    """Per-doc unigram Shannon entropy (operators/text.py:word_entropy):
    the Gopher-style diversity signal — see the operator docstring."""
    return text.word_entropy(graft.load(spark, sf, "documents"))


def _q_corpus_length_hist(spark, sf):
    """Power-of-two doc-length histogram per source
    (operators/corpus.py:length_histogram): exact bit-length buckets, so
    edges are engine-portable with no float log2."""
    return corpus.length_histogram(graft.load(spark, sf, "documents"))


def _q_kg_schema_induce(spark, sf):
    """Implicit-schema induction over the BUILT knowledge graph: per
    (subject kind, predicate, object kind) triple pattern, distinct-triple
    and distinct-entity counts — the ontology-shape statistic (domain/range
    inference) a KG-construction pass emits so downstream consumers know
    what the graph actually contains, vs what the schema claims.

    Scale: triples join the (far smaller) entity-kind table on canonical
    name — two equi-joins the planner may broadcast when the entity side
    fits, else a plain shuffle join bounded by entity count; the pattern
    aggregate is a partial-agg over a handful of groups."""
    ents, named = _kg_flagship(spark, sf)
    kinds = ents.select("canonical_name", "kind")
    d = named.select("subj_name", "pred", "obj_name").distinct()
    ks = kinds.select(
        F.col("canonical_name").alias("subj_name"), F.col("kind").alias("subj_kind")
    )
    ko = kinds.select(
        F.col("canonical_name").alias("obj_name"), F.col("kind").alias("obj_kind")
    )
    return (
        d.join(ks, "subj_name")
        .join(ko, "obj_name")
        .groupBy("subj_kind", "pred", "obj_kind")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct("subj_name").alias("n_subj"),
            F.countDistinct("obj_name").alias("n_obj"),
        )
    )


def _q_kg_fact_recency(spark, sf):
    """Temporal scoping of the built KG: per canonical triple, first/last
    mention wall-clock time, mention count, and observation span in days —
    the fact-validity signal (recency decay, stale-fact detection) a KG
    consumer needs before trusting an extracted edge.  Mentions re-attach
    to wall-clock by joining the flagship's (conv_id, turn_idx) provenance
    back to the transcript timestamps — one equi-join on the conversation
    key the extraction already partitions by, then a partial agg on the
    triple key."""
    _, named = _kg_flagship(spark, sf)
    t = graft.kg_transcripts(spark, sf).select("conv_id", "turn_idx", "ts")
    return (
        named.join(t, ["conv_id", "turn_idx"])
        .groupBy("subj_name", "pred", "obj_name")
        .agg(
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.count(F.lit(1)).alias("n_mentions"),
            F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date"))
            .cast("long")
            .alias("span_days"),
        )
    )


def _q_w11_week_over_week(spark, sf):
    """Week-over-week volume change per event type: weekly counts + the
    lagged percent delta — the trend read every operational dashboard
    starts from.  Weeks are exact date_trunc buckets; the pct change is one
    double division of exact int64 counts (engine-portable).  Scale: one
    partial-agg shuffle to (type, week) — cardinality is types x weeks, so
    the lag window runs over a tiny aggregate, never the raw events."""
    e = graft.load(spark, sf, "events")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    agg = e.groupBy(F.col("event_type"), wk.alias("week")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("week").asc())
    prev = F.lag("n").over(w)
    return agg.select(
        "event_type",
        "week",
        "n",
        prev.alias("prev_n"),
        qround((F.col("n") - prev).cast("double") / prev, 6).alias("wow_change"),
    )


def _q_w12_time_to_convert(spark, sf):
    """Conversion latency: per user, the first 'view' and the first
    'purchase' AT OR AFTER it, with the gap in whole seconds — the
    time-to-convert distribution input (w5_funnel's ordered-step rule,
    reduced to the first qualifying pair).  One partial agg for first
    views, one conditional agg for the earliest post-view purchase after a
    keyed join — never a per-event window over raw history."""
    e = graft.load(spark, sf, "events")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    return (
        p.join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_purchase"))
        .select(
            "user_id",
            "first_view",
            "first_purchase",
            (
                F.unix_micros(F.col("first_purchase").cast("timestamp"))
                - F.unix_micros(F.col("first_view").cast("timestamp"))
            ).alias("convert_us"),
        )
    )


def _q_corpus_vocab_growth(spark, sf):
    """Heaps-law vocabulary-growth curve (operators/corpus.py:vocab_growth):
    first-occurrence counting via min(doc_id) per token + a two-level
    cumulative sum whose only unpartitioned window runs over the tiny
    bucket aggregate — see the operator docstring."""
    return corpus.vocab_growth(graft.load(spark, sf, "documents"))


def _q_corpus_weighted_sample(spark, sf):
    """Deterministic length-weighted sampling per source
    (operators/corpus.py:weighted_sample_topk): Efraimidis-Spirakis keys
    from the portable poly_hash — reproducible, resume-safe, seedless."""
    return corpus.weighted_sample_topk(
        graft.load(spark, sf, "documents"), weight_col="n_chars",
        group_col="source", k=20
    )


def _q_corpus_containment(spark, sf):
    """Asymmetric containment dedup (operators/corpus.py:containment_pairs):
    directed pairs where >= 50% of doc_a's distinct 5-grams appear in doc_b
    — the partial-copy detector symmetric Jaccard misses."""
    return corpus.containment_pairs(
        graft.load(spark, sf, "documents"), n=5, tau=0.5, max_gram_docs=64
    )


def _q_g11_edge_lift(spark, sf):
    """Lift/PMI edge weighting over the co-purchase backbone
    (operators/graph_metrics.py:edge_lift): separates popularity-driven
    co-occurrence from genuine association before community detection or
    KG-edge promotion — see the operator docstring."""
    from plume_spark.operators.graph_metrics import edge_lift

    li = graft.load(spark, sf, "lineitem")
    return edge_lift(li, "l_orderkey", "l_partkey", min_groups=2)


def _q_w10_zscore_outliers(spark, sf):
    """Per-user anomaly detection: events whose value sits >= 3 population
    standard deviations from that user's mean.  The moments are EXACT
    decimal sums (sum, sum-of-squares) cast to double before the single
    division — the same engine-portable pattern as a1_group_sum — so the
    z-score and the |z| >= 3 boundary are bit-identical across engines.

    Scale: one partial-agg shuffle for the per-user moments (map-side
    combinable), then one equi-join of facts to the (far smaller) moment
    table — broadcast when it fits, never a window over raw events."""
    e = graft.load(spark, sf, "events")
    dec = F.col("value").cast("decimal(18,6)")
    agg = (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).cast("double").alias("sum_d"),
            F.sum(dec * dec).cast("double").alias("sumsq_d"),
        )
        .filter(F.col("n") >= 2)
    )
    nd = F.col("n").cast("double")
    mean = F.col("sum_d") / nd
    std = F.sqrt(F.greatest(F.col("sumsq_d") / nd - mean * mean, F.lit(0.0)))
    z = (F.col("value") - mean) / std
    return (
        e.join(agg, "user_id")
        .filter((std > 0) & (F.abs(z) >= 3.0))
        .select("event_id", "user_id", "value", F.round(z, 4).alias("z"))
    )


def _q_kg_sym_preds(spark, sf):
    """Predicate symmetry scoring over a built KG: for each predicate, the
    share of distinct triples whose exact reverse (obj, pred, subj) is also
    asserted — the schema-curation signal that separates inherently
    symmetric relations ('met') from directed ones ('works_at') before
    choosing which edges to mirror in the graph store.  Runs on the VARIED
    substrate (graft.kg_transcripts_varied) where 'met' is symmetric for
    roughly the half of its edges that got an explicit reverse turn; the
    functional flagship substrate would score 0 everywhere.  One distinct
    projection + a self left-semi join on the (name, pred, name) key + two
    partial-agg groupBys — the self-join shuffles the distinct TRIPLE set
    (orders of magnitude below mention scale), keyed by the same columns it
    joins on, so at 100 TB both sides co-partition."""
    _, named = _kg_flagship(spark, sf, substrate="varied")
    d = named.select("subj_name", "pred", "obj_name").distinct()
    rev = d.select(
        F.col("obj_name").alias("subj_name"),
        "pred",
        F.col("subj_name").alias("obj_name"),
    )
    sym = d.join(rev, ["subj_name", "pred", "obj_name"], "left_semi")
    n_all = d.groupBy("pred").agg(F.count(F.lit(1)).alias("n_triples"))
    n_sym = sym.groupBy("pred").agg(F.count(F.lit(1)).alias("n_sym"))
    return n_all.join(n_sym, "pred", "left").select(
        "pred",
        "n_triples",
        F.coalesce(F.col("n_sym"), F.lit(0)).alias("n_sym"),
        qround(
            F.coalesce(F.col("n_sym"), F.lit(0)).cast("double") / F.col("n_triples"),
            6,
        ).alias("sym_ratio"),
    )


def _q_kg_current_facts(spark, sf):
    """Latest-wins conflict resolution: the current-snapshot read over a
    temporally-scoped KG.  Per (subject, predicate), keep the object whose
    LAST mention is most recent (tie -> lexicographically greatest object —
    a total, engine-portable rule), plus how many alternatives were
    discarded — the step that turns kg_conflicts' contradiction list into a
    servable fact table.  Runs on the varied substrate where 'visited' is
    genuinely multi-valued.  Provenance re-attaches wall-clock by the same
    (conv_id, turn_idx) join as kg_fact_recency; the argmax is one window
    over the (subj, pred, obj)-grouped fact table, never over raw
    mentions."""
    _, named = _kg_flagship(spark, sf, substrate="varied")
    t = graft.kg_transcripts_varied(spark, sf).select("conv_id", "turn_idx", "ts")
    facts = (
        named.join(t, ["conv_id", "turn_idx"])
        .groupBy("subj_name", "pred", "obj_name")
        .agg(F.max("ts").alias("last_seen"))
    )
    w = Window.partitionBy("subj_name", "pred").orderBy(
        F.col("last_seen").desc(), F.col("obj_name").desc()
    )
    return (
        facts.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_alternatives",
            F.count(F.lit(1)).over(Window.partitionBy("subj_name", "pred")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "subj_name",
            "pred",
            F.col("obj_name").alias("obj_current"),
            "last_seen",
            "n_alternatives",
        )
    )


def _q_w17_rank_family(spark, sf):
    """The full SQL rank family over per-customer revenue within nation —
    rank (gaps on ties), dense_rank, percent_rank, cume_dist, and ntile(4)
    in ONE window pass (they all share the single (nation) shuffle) — the
    leaderboard/percentile-banding surface the row_number-only queries
    don't cover.  Revenue is the exact decimal sum, ordered with a custkey
    tie-break, so every rank and the two ratio functions ((rank-1)/(n-1),
    rows<=current/n — exact-int divisions) are engine-identical; ntile uses
    the standard floor distribution on both engines."""
    o = graft.load(spark, sf, "orders")
    c = graft.load(spark, sf, "customer")
    rev = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_custkey").alias("custkey"), "c_nationkey", "revenue")
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("revenue").desc(), F.col("custkey").asc()
    )
    return rev.select(
        "custkey",
        F.col("c_nationkey").alias("nationkey"),
        "revenue",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        # NO display rounding on the two ratio columns: with power-of-two
        # group sizes (640 customers/nation at sf0.1) i/n lands EXACTLY on
        # .5 round boundaries where Spark (half-up) and DuckDB (half-even)
        # legitimately disagree — the unrounded doubles are bit-identical
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


# Count-Min sketch geometry shared by the Spark query and its oracle SQL —
# one source of truth so the hash family can never drift between engines.
CMS_W, CMS_P = 1024, 2147483647
CMS_SALTS = [(131, 7), (1009, 19), (524287, 3), (8191, 101)]


def _q_a14_countmin(spark, sf):
    """Count-Min sketch heavy-hitter estimates vs exact counts — the third
    sketch aggregate (HLL distinct = a10, GK quantiles = a11, CMS frequency
    = this): at 100 TB the per-key frequency table for a skew decision is a
    fixed (d x w) int grid, not an O(keys) map.  Unlike a10/a11, the CMS
    estimate is FULLY value-checked: the hash family is explicit integer
    arithmetic and depth-wise min is order-independent, so both engines
    compute the identical sketch.  One explode(d)+groupBy for the grid
    (map-side combinable), one exact top-20, one broadcast-sized join of 20
    users against their d=4 grid cells; cms_ok pins the one-sided error
    guarantee (CMS never underestimates)."""
    e = graft.load(spark, sf, "events")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (((F.col("user_id") * a + b) % CMS_P) % CMS_W).alias("bucket"),
            )
            for j, (a, b) in enumerate(CMS_SALTS)
        ]
    )
    cms = (
        e.select(F.explode(cells).alias("s"))
        .select("s.j", "s.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("user_id").asc())
        .limit(20)
    )
    probes = top.select(
        "user_id", "n_exact", F.explode(cells).alias("s")
    ).select("user_id", "n_exact", "s.j", "s.bucket")
    est = (
        F.broadcast(probes)
        .join(cms, ["j", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cnt").alias("n_cms"))
    )
    return est.select(
        "user_id", "n_exact", "n_cms", (F.col("n_cms") >= F.col("n_exact")).alias("cms_ok")
    )


def _q_w16_gini(spark, sf):
    """Gini coefficient of per-user event volume — the one-number
    concentration read (is traffic spread out or is one whale generating
    the corpus?) run before partitioning decisions for user-keyed work.
    Rank formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over counts ranked
    ascending with a (count, user_id) total order, so ties are broken
    identically on every engine.  The only unpartitioned window runs over
    the per-user AGGREGATE (dimension-table sized), never raw events; all
    sums are exact int64, divided once in binary64."""
    e = graft.load(spark, sf, "events")
    per = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").asc(), F.col("user_id").asc())
    r = per.select("n", F.row_number().over(w).alias("i"))
    cnt = F.count(F.lit(1))
    return r.agg(
        cnt.alias("n_users"),
        F.sum("n").alias("total_events"),
        qround(
            (F.lit(2.0) * F.sum(F.col("i") * F.col("n")))
            / (cnt * F.sum("n"))
            - (cnt + F.lit(1.0)) / cnt,
            6,
        ).alias("gini"),
    )


def _q_kg_alias_merge(spark, sf):
    """The canonicalization MERGE path under the value gate: entities with
    >= 2 alias surface forms, with the sorted alias list — on the alias
    substrate (graft.kg_transcripts_alias) every customer appears both
    plain and zero-padded, two DIFFERENT norms with IDENTICAL distinct
    3-gram sets, so the LSH+CC path must merge each into one 2-alias
    entity.  This is the one pipeline behavior (cluster merging) the other
    kg_* contract queries never fire on their substrates — previously it
    was pinned only by generator-based pytest, never by the DuckDB gate."""
    ents, _ = _kg_flagship(spark, sf, substrate="alias")
    return ents.filter(F.size("aliases") >= 2).select(
        "canonical_name",
        F.size("aliases").cast("long").alias("n_aliases"),
        F.array_join("aliases", ",").alias("alias_csv"),
    )


def _q_emb_pq_codes(spark, sf):
    """Product quantization: each 64-dim embedding is split into 4
    sub-vectors of 16 dims, and each sub-vector is assigned to its nearest
    (squared-L2) entry of a deterministic 8-entry codebook (the sub-vectors
    of anchor vec_ids 0-7) — the memory-compression path that makes
    billion-vector ANN indexes fit (4 bytes/vector here vs 256).
    Engine-exact by construction: doubles throughout, each sub-distance is
    a FIXED-ORDER fold over 16 dims, argmin ties break on cent_id, and the
    reported quantization error sums the 4 sub-distances in fixed order.
    Zero shuffle after the 1-row codebook aggregate broadcasts: the
    assignment is a pure per-row projection, exactly how a 100 TB encode
    pass must run."""
    return _pq_codes(graft.load(spark, sf, "embeddings"))


def _pq_codes(emb):
    """PQ encode of an embeddings DataFrame (codebook = sub-vectors of
    vec_ids 0-7) — the body of _q_emb_pq_codes, parameterized on the input
    so the scaled correctness check (scripts/check_oracle.py --scaled) can
    run the identical chain over k-replicated input."""
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e = emb.select("vec_id", vec_d.alias("v"))
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cvec")
    )
    packed = cents.agg(F.collect_list(F.struct("cent_id", "cvec")).alias("cents"))
    d = e.crossJoin(F.broadcast(packed))

    def best(j):
        def dist(cent):
            a = F.slice(F.col("v"), j * 16 + 1, 16)
            b = F.slice(cent["cvec"], j * 16 + 1, 16)
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )

        init = F.struct(
            F.lit(float("inf")).alias("d"), F.lit(-1).cast("long").alias("c")
        )
        return F.aggregate(
            F.col("cents"),
            init,
            lambda acc, cent: F.when(
                (dist(cent) < acc["d"])
                | ((dist(cent) == acc["d"]) & (cent["cent_id"] < acc["c"])),
                F.struct(dist(cent).alias("d"), cent["cent_id"].alias("c")),
            ).otherwise(acc),
        )

    bs = [best(j) for j in range(4)]
    return d.select(
        "vec_id",
        *[bs[j]["c"].alias(f"code_{j}") for j in range(4)],
        qround(bs[0]["d"] + bs[1]["d"] + bs[2]["d"] + bs[3]["d"], 6).alias("qerr"),
    )


def _q_a13_mad(spark, sf):
    """Median absolute deviation per event type — the robust dispersion
    read (outlier-insensitive, unlike w10's stddev): med = exact p50 of
    values, MAD = exact p50 of |value - med|.  Two sort-based percentile
    aggregates with a broadcast of the tiny per-type median table between
    them; both medians interpolate at p=0.5 (an exact binary fraction), so
    the result is engine-identical before the display round."""
    e = graft.load(spark, sf, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 6).alias("median"),
            F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad"),
        )
    )


def _q_corpus_dup_cluster_stats(spark, sf):
    """Near-dup cluster-size profile: how much of the corpus sits in
    clusters of each size — the one-screen dedup health read (a fat tail
    here means boilerplate or mirror floods) computed BEFORE choosing
    keep-best policy.  One partial agg over the oracle-checked component
    assignment, then a second over the (tiny) per-cluster sizes."""
    groups = _q_dedup_groups(spark, sf)
    sizes = groups.groupBy("keeper_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size")).cast("long").alias("n_docs"),
    )


def _q_corpus_decon_fuzzy(spark, sf):
    """Fuzzy benchmark decontamination: near-duplicate links BETWEEN the
    training split and the held-out split (doc_id % EVAL_MOD == 0 plays the
    eval suite), via the full MinHash/LSH + exact-Jaccard-verify path — the
    paraphrase-contamination complement of corpus_decon_overlap's exact
    5-gram rule.  Pure post-filter over the oracle-matched dedup pair set
    (cross-split xor), so banding, bucket caps, and verification are the
    single battle-tested implementation — zero new pair-generation code
    paths to diverge at scale."""
    d = graft.load(spark, sf, "documents")
    pairs = dedup.minhash_dedup(d, portable_ids=True)
    ev_a = (F.col("doc_a") % corpus.EVAL_MOD) == 0
    ev_b = (F.col("doc_b") % corpus.EVAL_MOD) == 0
    return pairs.filter(ev_a != ev_b).select(
        F.when(ev_b, F.col("doc_a")).otherwise(F.col("doc_b")).alias("train_doc"),
        F.when(ev_b, F.col("doc_b")).otherwise(F.col("doc_a")).alias("eval_doc"),
        qround(F.col("jaccard"), 4).alias("jaccard"),
    )


def _q_corpus_gopher_rules(spark, sf):
    """Gopher-style rule-based quality filter: per document, token count,
    mean word length, and stopword fraction, each checked against fixed
    thresholds, with a named reason list for every failed rule — the
    auditable deterministic pre-filter run before any model-based scoring
    (and the operator a 100 TB curation pipeline runs FIRST, because it is
    a zero-shuffle pure projection: list ops on the split-token array,
    whole-stage codegen, no explode).  All three signals are exact-integer
    ratios divided once in binary64, so thresholds compare identically on
    every engine."""
    d = graft.load(spark, sf, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(toks)
    sum_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin("the", "a", "of", "to", "and"))
    )
    r = d.select(
        "doc_id",
        n.alias("n_tokens"),
        (sum_chars.cast("double") / n).alias("_mwl"),
        (n_stop.cast("double") / n).alias("_sf"),
    )
    ok_len = F.col("n_tokens") >= 20
    ok_mwl = (F.col("_mwl") >= 4.0) & (F.col("_mwl") <= 5.0)
    ok_stop = F.col("_sf") >= 0.03
    reasons = F.array_join(
        F.filter(
            F.array(
                F.when(~ok_len, F.lit("short")),
                F.when(~ok_mwl, F.lit("wordlen")),
                F.when(~ok_stop, F.lit("stopwords")),
            ),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    return r.select(
        "doc_id",
        "n_tokens",
        qround(F.col("_mwl"), 6).alias("mean_word_len"),
        qround(F.col("_sf"), 6).alias("stop_frac"),
        (ok_len & ok_mwl & ok_stop).alias("passed"),
        reasons.alias("fail_reasons"),
    )


def _q_g12_hits(spark, sf):
    """HITS hubs/authorities over the 3-level customer->order->part DAG
    (operators/pagerank.py:hits) — the second fixed-iteration spectral-style
    ranking beside PageRank; unnormalized iterations keep every
    intermediate score integer-exact, so the only float op is the final
    max-division (see the operator docstring)."""
    from plume_spark.operators.pagerank import hits

    return hits(graft.dag_edges(spark, sf), n_iters=2)


def _q_kg_degree_hist(spark, sf):
    """Power-of-two degree histogram over the built KG's distinct edge set
    — the skew diagnostic read BEFORE choosing salting/broadcast strategy
    for entity-graph analytics (the north rule's hot-entity case: a fat
    top bucket says the join needs skew handling).  Exact integer
    bit-length buckets (corpus_length_hist's engine-portable edge rule)
    over one union-all + two partial-agg groupBys; the share window runs
    over the <=64-row bucket aggregate, never the entity table."""
    _, named = _kg_flagship(spark, sf)
    d = named.select("subj_name", "pred", "obj_name").distinct()
    ends = d.select(F.col("subj_name").alias("name")).unionByName(
        d.select(F.col("obj_name").alias("name"))
    )
    deg = ends.groupBy("name").agg(F.count(F.lit(1)).alias("deg"))
    agg = deg.groupBy(
        F.length(F.bin(F.col("deg"))).cast("int").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_entities"), F.sum("deg").alias("total_deg"))
    w = Window.partitionBy()
    return agg.select(
        "bucket",
        "n_entities",
        "total_deg",
        qround(F.col("n_entities") / F.sum("n_entities").over(w), 6).alias("share"),
    )


def _q_corpus_ccnet_cut(spark, sf):
    """CCNet-style adaptive quality cut: bucket documents into head/middle/
    tail by the QUARTILES of their own unigram log-likelihood distribution
    (corpus_quality_tiers uses fixed thresholds; real corpus pipelines cut
    at data-dependent percentiles recomputed per snapshot).  Knife-edge
    safety is by construction: the per-doc score is the already-6dp-rounded
    avg_logprob (oracle-verified value-identical cross-engine) and the cut
    points are interpolated percentiles at p=0.25/0.75 — exact binary
    fractions, so both engines interpolate identical doubles and every
    boundary comparison agrees.  One extra 1-row broadcast + one partial
    agg on top of the logprob table."""
    lp = corpus.unigram_logprob(graft.load(spark, sf, "documents")).select(
        "doc_id", "n_tokens", "avg_logprob"
    )
    thr = lp.agg(
        F.expr("percentile(avg_logprob, 0.25)").alias("p25"),
        F.expr("percentile(avg_logprob, 0.75)").alias("p75"),
    )
    b = lp.crossJoin(F.broadcast(thr)).withColumn(
        "bucket",
        F.when(F.col("avg_logprob") <= F.col("p25"), F.lit("tail"))
        .when(F.col("avg_logprob") > F.col("p75"), F.lit("head"))
        .otherwise(F.lit("middle")),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens_total"),
        qround(
            F.sum(F.col("avg_logprob").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_logprob"),
    )


def _q_w15_interarrival(spark, sf):
    """Inter-arrival-gap distribution per event type: for each event, the
    microsecond gap to the SAME user's previous event (any type), then the
    exact interpolated p50/p90 of those gaps grouped by the arriving
    event's type — the traffic-burstiness read behind rate-limit and
    session-timeout tuning.  One (user) window shuffle for the lag, one
    sort-based percentile aggregate keyed by type."""
    e = graft.load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    g = e.select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(gap_us, 0.5)"), 6).alias("p50_us"),
        F.round(F.expr("percentile(gap_us, 0.9)"), 6).alias("p90_us"),
    )


def _q_w13_rolling_active(spark, sf):
    """7-day rolling distinct active users per day — the DAU/WAU-style
    engagement read.  Distinct-over-sliding-window is inexpressible as a
    Spark window function (no DISTINCT aggregates over frames), so the
    scale path is the explode rewrite: each distinct (user, day) pair is
    fanned out to the <=7 window-end days it covers (constant 7x row
    amplification of the ALREADY-distinct pair set, not of raw events),
    then one partial-agg count-distinct keyed by window day.  No global
    sort, no per-event window, no self-join — the oracle runs the naive
    range join instead.  The day dimension (~tens of rows) broadcasts."""
    e = graft.load(spark, sf, "events")
    pairs = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    days = pairs.select(F.col("day").alias("win_day")).distinct()
    cov = pairs.select(
        "user_id",
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("win_day"),
    )
    return (
        cov.join(F.broadcast(days), "win_day")
        .groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .select(F.col("win_day").alias("day"), "active_7d")
    )


def _q_a12_cube(spark, sf):
    """CUBE aggregate over (event_type, day-of-week): all four grouping
    sets (full, per-type, per-dow, grand total) in ONE pass — Catalyst's
    native grouping-sets expansion (the rollup complement, a8).  dow is
    0=Sunday..6=Saturday on both engines (Spark dayofweek()-1 == DuckDB
    date_part('dow')); sums are exact decimal cast to double, so every
    subtotal is identical under any partitioning."""
    e = graft.load(spark, sf, "events")
    d = e.select(
        "event_type",
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    return d.cube("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("sum_value"),
    )


def _q_w14_rfm(spark, sf):
    """RFM segmentation over orders: per customer recency (days since last
    order, vs the corpus max date), frequency (order count), monetary
    (exact decimal revenue), each scored into fixed 1-3 bands — the
    classic customer-value cut.  One partial-agg groupBy keyed by
    customer; the 1-row reference date broadcasts (never a driver
    collect); fixed thresholds keep every band edge engine-portable
    (day diffs and counts are exact ints, monetary is an exact decimal
    sum cast once to double)."""
    o = graft.load(spark, sf, "orders")
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("ref_day"))
    per = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    r = per.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days", F.datediff("ref_day", "last_day").cast("long")
    )
    return r.select(
        F.col("o_custkey").alias("custkey"),
        "recency_days",
        "frequency",
        "monetary",
        F.when(F.col("recency_days") <= 365, 3)
        .when(F.col("recency_days") <= 730, 2)
        .otherwise(1)
        .cast("int")
        .alias("r_score"),
        F.when(F.col("frequency") >= 15, 3)
        .when(F.col("frequency") >= 8, 2)
        .otherwise(1)
        .cast("int")
        .alias("f_score"),
        F.when(F.col("monetary") >= 2000000.0, 3)
        .when(F.col("monetary") >= 1000000.0, 2)
        .otherwise(1)
        .cast("int")
        .alias("m_score"),
    )


# Bloom-filter geometry shared by the Spark query and its oracle SQL (the
# CMS pattern): k = len(CMS_SALTS) hash functions over an M-bit space.
BLOOM_M = 8192


def _q_a15_bloom(spark, sf):
    """Bloom-filter membership: build a 4-hash/8192-bit filter over the
    purchasing users, probe EVERY user through it, and report the exact
    membership, the filter's answer, and the no-false-negative contract —
    the sketch that makes 100 TB anti-joins cheap (ship 1 KB of bits
    instead of the key set; only bloom-positive rows pay the real join).
    Same affine hash family as the Count-Min query, reduced mod BLOOM_M
    instead of CMS_W, so the whole sketch family shares one set of salt
    constants.  The bit table is <= 8192 rows and broadcasts; the probe is
    a per-row projection + one broadcast semi-join + one user-keyed agg —
    nothing scales with the filter, exactly how a distributed Bloom probe
    must run."""
    e = graft.load(spark, sf, "events")

    def pos(a, b):
        return ((F.col("user_id") * a + b) % CMS_P) % BLOOM_M

    hashes = F.array(*[pos(a, b) for a, b in CMS_SALTS])
    # ONE events scan + ONE user-keyed agg yields both the member flag and
    # the probe universe; everything downstream stays on that partitioning
    users = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("_m")
    ).localCheckpoint(eager=True)
    bits = (
        users.filter(F.col("_m") == 1)
        .select(F.explode(hashes).alias("bit"))
        .distinct()
    )
    k_hit = (
        users.select("user_id", F.explode(hashes).alias("bit"))
        .join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("k_hit"))
    )
    return (
        users.join(k_hit, "user_id", "left")
        .select(
            "user_id",
            (F.col("_m") == 1).alias("is_member"),
            (F.coalesce("k_hit", F.lit(0)) == len(CMS_SALTS)).alias("bloom_hit"),
        )
        .withColumn("no_false_neg", F.col("bloom_hit") | ~F.col("is_member"))
    )


def _q_kg_star_join(spark, sf):
    """Star basic-graph-pattern match over the built KG: every entity
    asserting BOTH a works_at edge and a visited edge, with the matched
    (workplace, visited_place) bindings — the 2-arm SPARQL-style star join
    (?who works_at ?w . ?who visited ?v) that KG consumers run constantly
    and that kg_path2 (chain composition) does not cover.  Runs on the
    varied substrate where 'visited' is genuinely multi-valued, so arms
    multiply.  Both arms are filters over ONE distinct-triple projection
    shuffled on the shared subject key — a self-equi-join that co-partitions
    at any scale; the star never touches raw mentions."""
    _, named = _kg_flagship(spark, sf, substrate="varied")
    d = named.select("subj_name", "pred", "obj_name").distinct()
    works = d.filter(F.col("pred") == "works_at").select(
        F.col("subj_name").alias("who"), F.col("obj_name").alias("workplace")
    )
    vis = d.filter(F.col("pred") == "visited").select(
        F.col("subj_name").alias("who"), F.col("obj_name").alias("visited_place")
    )
    return works.join(vis, "who")


def _q_ann_pq_adc(spark, sf):
    """Asymmetric-distance (ADC) top-k over the PQ codes: the query vector
    stays un-quantized, each coded vector's distance is the sum of four
    table lookups d(q_sub_j, centroid[code_j]) — the search half of the
    product-quantization story (emb_pq_codes is the encode half) and the
    memory-bound scan shape every billion-vector IVF-PQ index runs.  The
    32-entry lookup table (4 sub-spaces x 8 centroids) is computed once
    from the same codebook the encoder used and broadcast; the scan is then
    four broadcast hash-joins + one fixed-order double sum per row with a
    TakeOrderedAndProject top-20 — zero shuffle of the code table.  Tie
    determinism: distances fold in fixed order, round(6) before the sort,
    vec_id tie-break."""
    emb = graft.load(spark, sf, "embeddings")
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e = emb.select("vec_id", vec_d.alias("v"))
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cvec")
    )
    q = e.filter(F.col("vec_id") == 9).select(F.col("v").alias("qvec"))

    def subdist(j):
        return F.aggregate(
            F.zip_with(
                F.slice(F.col("qvec"), j * 16 + 1, 16),
                F.slice(F.col("cvec"), j * 16 + 1, 16),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    lut = cents.crossJoin(F.broadcast(q)).select(
        "cent_id", *[subdist(j).alias(f"d{j}") for j in range(4)]
    )
    codes = _q_emb_pq_codes(spark, sf)
    for j in range(4):
        lj = lut.select(F.col("cent_id").alias(f"code_{j}"), f"d{j}")
        codes = codes.join(F.broadcast(lj), f"code_{j}")
    adc = codes.select(
        "vec_id",
        qround(
            F.col("d0") + F.col("d1") + F.col("d2") + F.col("d3"), 6
        ).alias("adc_dist"),
    )
    return adc.orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc()).limit(20)


def _q_w18_streaks(spark, sf):
    """Longest consecutive-DAY active streak per user — the calendar-gap
    islands variant (w6 covers sequence-number islands within the event
    stream; retention work needs the date-arithmetic twin: 'how many days
    in a row was this user active?').  Classic trick: over distinct
    (user, day), day - row_number(days so far) is CONSTANT within a run of
    consecutive dates, so one window plus two partial aggs — no self-join,
    no UDF, no per-user iteration.  The (user, day) distinct and the
    (user) window share key prefixes, and both aggs after the window run
    on the existing (user) partitioning, so AQE plans one extra exchange
    at most.  All outputs are exact int64."""
    e = graft.load(spark, sf, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy(F.col("day").asc())
    anchored = days.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    runs = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


def _q_t6_scd2(spark, sf):
    """Slowly-changing-dimension (type 2) interval reconstruction: compress
    each user's event-type sequence into state-change rows carrying
    [valid_from, valid_to) validity intervals and an is_current flag — the
    standard shape for temporally-scoped KG facts and dimension snapshots
    (kg_current_facts picks ONE latest winner; this keeps the full
    history as intervals).  lag() marks the change rows, lead() over the
    surviving rows closes each interval; both windows share the one
    (user_id) shuffle and the same (ts, event_id) total order, so the
    change detection and the interval close are engine-identical under
    timestamp ties."""
    e = graft.load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    marked = e.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lag("event_type").over(w).alias("_prev"),
    )
    changes = marked.filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("state"))
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("valid_from").asc(), F.col("event_id").asc()
    )
    return changes.select(
        "user_id",
        F.col("event_id").alias("change_event"),
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def _q_ann_rerank(spark, sf):
    """Two-stage retrieval: PQ asymmetric-distance shortlist (top-20, the
    16-bytes-per-vector scan from ann_pq_adc) -> exact float cosine rerank
    of ONLY the shortlist -> top-5.  This is the production billion-vector
    serving shape (IVF-PQ candidate scan + exact rerank): the full corpus is
    touched only through its codes, and the expensive exact math runs on a
    candidate set whose size is independent of corpus size.  The 20-row
    shortlist is broadcast into the candidate semi-join, so the only
    full-scan work is the parquet read of the 20 matching rows (vec_id
    pushed to the scan would need a literal list — the broadcast hash join
    is the distributed equivalent); ordering is deterministic via round(4)
    cosine + vec_id tie-break on both engines."""
    shortlist = _q_ann_pq_adc(spark, sf)  # (vec_id, adc_dist) top-20
    emb = graft.load(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 9).select("embedding").first()
    qv = [float(x) for x in qrow[0]]
    qn = math.sqrt(sum(x * x for x in qv))
    cand = emb.join(F.broadcast(shortlist), "vec_id")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, F.array(*[F.lit(x) for x in qv]), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, z: acc + z
        )
    )
    return (
        cand.select(
            "vec_id",
            "adc_dist",
            F.round(dot / (nrm * F.lit(qn)), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
    )


def _q_g13_linkpred_ra(spark, sf):
    """Resource-allocation link prediction over the strong-tie co-purchase
    backbone (g8's substrate): RA(a,b) = sum over shared neighbors z of
    1/deg(z), carried as exact int64 fixed-point (RA_SCALE div deg) so the
    score is engine-portable without any float rounding contract — the
    down-weighted sibling of g8's raw common-neighbor count (a shared
    degree-2 middle is strong evidence; a shared hub is noise)."""
    from plume_spark.operators.graph_metrics import (
        co_occurrence_edges,
        resource_allocation,
    )

    li = graft.load(spark, sf, "lineitem")
    backbone = co_occurrence_edges(li, "l_orderkey", "l_partkey").filter(
        F.col("n_groups") >= 2
    )
    return resource_allocation(backbone, max_degree=64)


def _q_kg_neg_samples(spark, sf):
    """Deterministic filtered negative sampling over the built KG — the
    training-pair generator every KG-embedding loss (TransE/DistMult/...)
    needs: for each positive triple, corrupt the object with a same-kind
    entity chosen by portable hash, then FILTER corruptions that are
    accidentally true (the standard 'filtered' protocol, Bordes et al.).

    Determinism without RNG: the pick is poly_hash(subj|pred|obj) mod B
    into a (kind, bucket) -> min(name) candidate dictionary (B=64 buckets
    over the canonical entity table) — the same seedless portable-hash
    policy as corpus_train_val_split / corpus_weighted_sample, so the same
    triple draws the same negative on every run, executor count, and
    engine (resume-safe by construction).  Scale: the entity dictionary is
    broadcast-sized relative to the triple stream (it already fits the
    flagship's broadcast joins); everything else is pure projection + one
    anti-join against the positive set on its natural key."""
    from plume_spark.operators.dedup import poly_hash

    ents, named = _kg_flagship(spark, sf)
    B = 64
    pos = named.select("subj_name", "pred", "obj_name").distinct()
    pool = (
        ents.select(
            "kind",
            F.pmod(poly_hash(F.col("canonical_name")), F.lit(B)).alias("bucket"),
            F.col("canonical_name").alias("cand"),
        )
        .groupBy("kind", "bucket")
        .agg(F.min("cand").alias("neg_obj"))
    )
    obj_kind = ents.select(
        F.col("canonical_name").alias("obj_name"), F.col("kind").alias("obj_kind")
    )
    picked = (
        pos.join(F.broadcast(obj_kind), "obj_name")
        .withColumn(
            "pick_bucket",
            F.pmod(
                poly_hash(F.concat_ws("|", "subj_name", "pred", "obj_name")),
                F.lit(B),
            ),
        )
        .join(
            F.broadcast(pool),
            (F.col("obj_kind") == F.col("kind"))
            & (F.col("pick_bucket") == F.col("bucket")),
        )
        .filter(F.col("neg_obj") != F.col("obj_name"))
    )
    truth = pos.select(
        F.col("subj_name").alias("t_s"),
        F.col("pred").alias("t_p"),
        F.col("obj_name").alias("t_o"),
    )
    return picked.join(
        truth,
        (F.col("subj_name") == F.col("t_s"))
        & (F.col("pred") == F.col("t_p"))
        & (F.col("neg_obj") == F.col("t_o")),
        "left_anti",
    ).select("subj_name", "pred", "obj_name", "neg_obj")


def _q_corpus_chunk_windows(spark, sf):
    """Sliding token-window chunking (W=64, stride S=48, 16-token overlap)
    — the context-window preparation step between cleaning and packing in
    every LLM training pipeline (corpus_pack_chunks packs whole docs into a
    budget; this SPLITS long docs into overlapping model-sized windows).
    Chunk starts are the multiples of S below the token count, so the chunk
    set is a pure function of the text: no RNG, no state, resume-safe.

    Scale: tokenize + sequence + posexplode + slice is a zero-wide-shuffle
    projection chain (budget-asserted) — it streams at scan speed over
    100 TB.  Each chunk carries its exact token count and a SHA-256
    fingerprint of the joined tokens (native codegen on both engines —
    measured 16x faster than the interpreted poly-hash HOF fold here,
    which matters because the fingerprint runs once per chunk of the whole
    corpus), so the value gate checks the chunk CONTENT, not just the
    fan-out arithmetic."""
    W, S = 64, 48
    d = graft.load(spark, sf, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    t = t.withColumn(
        "chunk_idx",
        # exact integer division (`div`), mirroring the oracle's `//` —
        # never a double-divide-then-truncate on integer types
        F.explode(F.sequence(F.lit(0), F.expr(f"(size(toks) - 1) div {S}"))),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_idx") * S + 1, W)
    return t.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.sha2(F.array_join(chunk, " "), 256).alias("chunk_fp"),
    )


def _q_text_zipf_slope(spark, sf):
    """Zipf-law fit per source: OLS slope of ln(freq) on ln(rank) over the
    top-100 token ranks — the distributional-health read (natural text sits
    near -1; templated/spammy sources flatten or steepen) that complements
    text_word_entropy's per-doc diversity signal with a per-corpus one.
    Ranks are deterministic (freq desc, token asc row_number); the slope is
    computed with the SAME closed-form moment formula on both engines
    (DuckDB's regr_slope uses a mean-shifted accumulation that rounds
    differently) and round(6) absorbs the <=1e-12 float-sum divergence of
    100 ln terms.  Scale: one (source, tok) partial agg + a top-100 window
    per source + a 100-row final agg — nothing global."""
    d = graft.load(spark, sf, "documents")
    tok = d.select(
        "source", F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("tok")
    )
    freq = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("source").orderBy(F.col("freq").desc(), F.col("tok").asc())
    top = freq.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 100)
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    m = top.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_ranks"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    den = F.col("n_ranks") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        F.col("n_ranks") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / den
    # den == 0 when a source has a single distinct rank (degenerate top
    # list): Spark (non-ANSI) yields NULL on 0/0 but DuckDB yields inf;
    # guard explicitly so both engines emit NULL.
    return m.select(
        "source",
        "n_ranks",
        F.when(den != 0, F.round(slope, 6)).alias("zipf_slope"),
    )


def _q_w19_attribution(spark, sf):
    """Linear multi-touch attribution: each purchase splits its credit
    equally across the user's view events in the preceding 7 days — the
    marketing-analytics join family (w12_time_to_convert measures the
    latency of the FIRST touch; this enumerates and weights ALL touches).
    The per-touch credit is carried as exact ppm fixed-point
    (1000000 div n_touches) — no float division contract — and the touch
    window edges are exact timestamp arithmetic (min/max view ts).

    Scale: one user-keyed equi-join carries the range predicate (AQE
    skew-handles hot users), then one purchase-keyed partial agg; per-user
    touch volume bounds the fan-out, and the 7-day bound keeps state
    finite under incremental re-runs."""
    e = graft.load(spark, sf, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    j = p.join(v, "user_id").filter(
        (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    return j.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.expr("1000000L div count(1)").alias("credit_ppm"),
        F.min("v_ts").alias("first_view_ts"),
        F.max("v_ts").alias("last_view_ts"),
    )


def _q_ann_ivf_adc(spark, sf):
    """The full IVF-PQ serving stack: coarse quantizer (ann_ivf_topk's
    deterministic 8-centroid assignment) restricts the scan to the query's
    2 probed cells, then PQ asymmetric distance (ann_pq_adc's 32-entry
    lookup table) ranks the members WITHOUT touching their float vectors —
    the composition every billion-vector index actually runs (coarse probe
    prunes ~n_probe/n_centroids of the corpus; ADC makes the surviving scan
    memory-bound at 16 bytes/vector).  All three pieces reuse the exact
    operators the gate already pins (ivf_assign, emb_pq_codes, the LUT),
    so this checks the COMPOSITION, not new math.  Output keeps cent_id so
    the oracle also value-checks the cell routing."""
    return _ivf_adc_chain(graft.load(spark, sf, "embeddings"))


def _ivf_adc_chain(emb):
    """The IVF-PQ serving chain over an embeddings DataFrame — the body of
    _q_ann_ivf_adc, parameterized on the input so the scaled correctness
    check can run the identical composition over k-replicated input
    (replicas carry offset vec_ids; centroid ids 0-7 and query id 9 exist
    only in replica 0, so the codebook/probe stages are scale-invariant)."""
    from plume_spark.operators.similarity import ivf_assign

    assigned, cents, cos = ivf_assign(emb, n_centroids=8)
    q = emb.filter(F.col("vec_id") == 9).select(F.col("embedding").alias("qvec"))
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select("cent_id", cos(F.col("cvec"), F.col("qvec")).alias("sim"))
        .orderBy(F.col("sim").desc(), "cent_id")
        .limit(2)
        .select("cent_id")
    )
    members = assigned.select("vec_id", "cent_id").join(F.broadcast(probe), "cent_id")
    # ADC over the probed members only: same LUT construction as ann_pq_adc
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e = emb.select("vec_id", vec_d.alias("v"))
    lut_cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("lut_cent"), F.col("v").alias("cvec")
    )
    qd = e.filter(F.col("vec_id") == 9).select(F.col("v").alias("qvec"))

    def subdist(j):
        return F.aggregate(
            F.zip_with(
                F.slice(F.col("qvec"), j * 16 + 1, 16),
                F.slice(F.col("cvec"), j * 16 + 1, 16),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    lut = lut_cents.crossJoin(F.broadcast(qd)).select(
        "lut_cent", *[subdist(j).alias(f"d{j}") for j in range(4)]
    )
    codes = members.join(_pq_codes(emb), "vec_id")
    for j in range(4):
        lj = lut.select(F.col("lut_cent").alias(f"code_{j}"), f"d{j}")
        codes = codes.join(F.broadcast(lj), f"code_{j}")
    return (
        codes.select(
            "vec_id",
            "cent_id",
            qround(
                F.col("d0") + F.col("d1") + F.col("d2") + F.col("d3"), 6
            ).alias("adc_dist"),
        )
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(10)
    )


def _q_corpus_decon_bloom(spark, sf):
    """Bloom-filter decontamination — the sub-linear production variant of
    corpus_decon_overlap: the eval suite's distinct 5-grams are folded into
    a 4-hash/8192-bit filter (a15_bloom's affine hash family over the
    portable poly-hash gram id), the filter is broadcast, and every train
    gram probes it with per-row arithmetic.  At 100 TB the exact eval gram
    set may be too wide to broadcast-join against every shard cheaply; the
    bit array is a fixed 1 KB regardless of eval size, and only
    bloom-positive grams would pay a real verification join.  Output per
    train doc: gram count, bloom-positive count, exact overlap count, and
    the no-false-negative contract (every exact hit is bloom-positive —
    guaranteed by construction, asserted per doc under the value gate;
    n_bloom - n_exact is the false-positive overhead the 1 KB buys)."""
    from plume_spark.operators.corpus import EVAL_MOD
    from plume_spark.operators.dedup import shingles

    d = graft.load(spark, sf, "documents")
    train = d.filter(F.col("doc_id") % EVAL_MOD != 0)
    ev = d.filter(F.col("doc_id") % EVAL_MOD == 0)
    tg = shingles(train, n=5)  # (doc_id, tok)
    # materialized once: feeds BOTH the driver-side filter build and the
    # broadcast exact-overlap join (eval grams are the SMALL side by
    # construction — the suite is a fixed-size probe set)
    eg = shingles(ev, n=5).select("tok").distinct().localCheckpoint(eager=True)

    # gram id: first 48 bits of SHA-256 reduced mod CMS_P — native codegen
    # on both engines (the interpreted poly-hash fold costs ~10x more here
    # because it runs once per TRAIN gram; same swap as the chunk
    # fingerprint).  Spark conv(hex,16,10) == DuckDB CAST('0x'||hex).
    def gram_id(tok):
        return (
            F.conv(F.substring(F.sha2(tok, 256), 1, 12), 16, 10).cast("long")
            % CMS_P
        )

    # Build the 8192-bit filter ONCE on the driver — a bounded O(BLOOM_M)
    # collect (1 KB of information regardless of eval-suite size; the eval
    # side's distinct-gram agg is the only shuffle the filter build pays) —
    # and ship it into the plan as an array<boolean> literal.  Every train
    # gram then evaluates all 4 probes in a single projection: a constant-
    # space membership probe costs a SCAN, not a shuffle (round-4 VERDICT
    # "What's wrong" #2 — the explode-x4 + (doc_id, tok) re-aggregation
    # probe shuffle, removed; the only remaining exchange is the final
    # per-doc partial agg).
    bit_rows = (
        eg.select(
            F.explode(
                F.array(*[
                    ((gram_id(F.col("tok")) * a + b) % CMS_P) % BLOOM_M
                    for a, b in CMS_SALTS
                ])
            ).alias("bit")
        )
        .distinct()
        .collect()
    )
    words = [0] * (BLOOM_M // 64)
    for r in bit_rows:
        words[r["bit"] // 64] |= 1 << (r["bit"] % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    # ONE parsed SQL array literal (constant-folded to a single Literal by
    # Catalyst — never 8192 Py4J column objects, which costs ~3 s of
    # driver time to construct) carried as a column the 4 probes index
    bm_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"

    def probe(a, b):
        bit = f"(((gid * {a} + {b}) % {CMS_P}) % {BLOOM_M})"
        return (
            f"((element_at(_bm, cast({bit} div 64 as int) + 1)"
            f" >> cast({bit} % 64 as int)) & 1) = 1"
        )

    bpos_sql = " AND ".join(probe(a, b) for a, b in CMS_SALTS)
    flagged = (
        tg.join(F.broadcast(eg.withColumn("_e", F.lit(1))), "tok", "left")
        .select(
            "doc_id",
            gram_id(F.col("tok")).alias("gid"),
            F.coalesce("_e", F.lit(0)).alias("exact"),
        )
        .withColumn("_bm", F.expr(bm_sql))
        .select(
            "doc_id",
            F.expr(bpos_sql).cast("int").alias("bpos"),
            "exact",
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("bpos").alias("n_bloom_hits"),
        F.sum("exact").alias("n_exact"),
        F.min((F.col("bpos") >= F.col("exact")).cast("int")).cast("boolean").alias(
            "no_false_neg"
        ),
    )


def _q_emb_matryoshka(spark, sf):
    """Matryoshka-truncation retrieval audit: rank the corpus by cosine on
    the FIRST 16 dimensions only (the cheap prefix a truncated-embedding
    index would store — 4x less memory and bandwidth) and report, for the
    prefix top-10, whether each hit is also in the full-64-dim exact top-10
    — the overlap@k reading that decides whether prefix truncation is safe
    for a given corpus before committing the index build.  Both rankings
    are deterministic (round(4) + vec_id tie-break), and the full-dim side
    reuses the exact ranking contract ann_cosine_topk pins."""
    emb = graft.load(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow[0]]

    def scored(dim):
        qs = qv[:dim]
        qn = math.sqrt(sum(x * x for x in qs))
        v = F.transform(
            F.slice(F.col("embedding"), 1, dim), lambda x: x.cast("double")
        )
        dot = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in qs]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        nrm = F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, z: a + z
            )
        )
        return emb.select(
            "vec_id", F.round(dot / (nrm * F.lit(qn)), 4).alias("cos_sim")
        ).orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(10)

    trunc = scored(16).withColumnRenamed("cos_sim", "trunc_cos")
    full = scored(64).select(F.col("vec_id").alias("f_id")).withColumn(
        "_hit", F.lit(1)
    )
    return trunc.join(
        F.broadcast(full), trunc["vec_id"] == full["f_id"], "left"
    ).select(
        "vec_id",
        "trunc_cos",
        (F.coalesce("_hit", F.lit(0)) == 1).alias("in_full_topk"),
    )


def _q_g14_ppr(spark, sf):
    """Personalized PageRank from a deterministic seed set (customers with
    custkey % 500 == 1) over the customer->order->part DAG — the "what is
    important NEAR these nodes" primitive behind KG neighborhood
    exploration and recommendation candidate generation (g1 is the global
    complement).  Same one-shuffle-per-iteration loop and ppm-exact output
    contract as g1; teleport mass confined to the seeds makes the result
    effectively sparse (rank_ppm > 0), which at web scale is the point —
    the output is neighborhood-sized, not graph-sized."""
    from plume_spark.operators.pagerank import personalized_pagerank

    o = graft.load(spark, sf, "orders")
    li = graft.load(spark, sf, "lineitem")
    e1 = o.select(
        F.col("o_custkey").alias("subj"),
        (F.lit(1000000) + F.col("o_orderkey")).alias("obj"),
    )
    e2 = li.select(
        (F.lit(1000000) + F.col("l_orderkey")).alias("subj"),
        (F.lit(2000000) + F.col("l_partkey")).alias("obj"),
    )
    seeds = (
        o.select(F.col("o_custkey").alias("node"))
        .filter(F.col("node") % 500 == 1)
        .distinct()
    )
    return personalized_pagerank(e1.unionByName(e2), seeds, n_iters=3)


def _q_emb_kmeans_step(spark, sf):
    """One Lloyd refinement step from the deterministic 8-centroid seeding:
    assign every vector to its nearest seed centroid (the ivf_assign stage
    the IVF queries pin), then recompute each cell's centroid as the
    per-dimension mean — the k-means building block (iterating this
    assignment/update pair IS k-means; one step exercises both halves and
    stays exactly oracle-checkable).  Means use the decimal-exact partial
    sum (emb_centroids' determinism pattern) so the result is identical
    under any partitioning; posexplode long form avoids any array
    reassembly shuffle."""
    from plume_spark.operators.similarity import ivf_assign

    emb = graft.load(spark, sf, "embeddings")
    assigned, _, _ = ivf_assign(emb, n_centroids=8)
    return (
        assigned.select("cent_id", F.posexplode("emb").alias("dim", "v"))
        .groupBy("cent_id", "dim")
        .agg(
            F.round(
                (F.sum(F.col("v").cast("decimal(27,12)")) / F.count("*")).cast(
                    "double"
                ),
                6,
            ).alias("centroid"),
            F.count("*").alias("n_members"),
        )
    )


def _q_kg_rule_confidence(spark, sf):
    """AMIE-style implication mining over the built KG: for every ordered
    predicate pair (p -> q, p != q), the support |{(s,o): p(s,o) AND
    q(s,o)}| and confidence support/|p| — the rule-quality read that
    surfaces redundant or entailed relations (e.g. 'works_at(s,o) usually
    implies visited(s,o)') before schema curation or KG-embedding
    training.  Runs on the VARIED substrate where subjects can hold
    multiple predicates toward the same object.  The self-join keys on the
    (subj, obj) pair both sides already carry — co-partitioned at scale —
    and everything downstream is predicate-pair-sized (bounded by the
    closed vocabulary squared)."""
    _, named = _kg_flagship(spark, sf, substrate="varied")
    d = named.select("subj_name", "pred", "obj_name").distinct()
    q = d.select(
        "subj_name", F.col("pred").alias("pred_q"), "obj_name"
    )
    pairs = (
        d.join(q, ["subj_name", "obj_name"])
        .filter(F.col("pred") != F.col("pred_q"))
        .groupBy(F.col("pred").alias("antecedent"), F.col("pred_q").alias("consequent"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    n_p = d.groupBy(F.col("pred").alias("antecedent")).agg(
        F.count(F.lit(1)).alias("n_antecedent")
    )
    return pairs.join(n_p, "antecedent").select(
        "antecedent",
        "consequent",
        "support",
        "n_antecedent",
        qround(
            F.col("support").cast("double") / F.col("n_antecedent"), 6
        ).alias("confidence"),
    )


def _q_a16_group_skewness(spark, sf):
    """Per-group third-moment skewness with a fully deterministic
    cross-engine contract: values are quantized to exact centi-unit int64
    (the source carries 2 decimals, so this is lossless), the three power
    sums are EXACT (iv^3 <= 1.8e14 fits int64 per row; sums accumulate in
    decimal(38,0), associative under any merge order), and the reported
    skewness is hash-portable: zero-variance groups guarded EXACTLY via
    min==max, the double expression is one fixed IEEE-754 op sequence
    identical on both engines, and the final quantization is
    floor(x*1e4 + 0.5) -> BIGINT (plain IEEE ops) rather than a decimal
    HALF_UP round whose knife-edge semantics differ between engines —
    the round-4 driver hash mismatch, closed.  The exact sums ride along
    in the output so the value gate pins THEM, not just the derived
    value.  Shape: ONE map-side-combinable partial agg; nothing global."""
    e = graft.load(spark, sf, "events")
    iv = F.round(F.col("value") * 100).cast("long")
    d = e.select(
        "event_type",
        iv.alias("x"),
        (iv * iv).alias("x2"),
        (iv * iv * iv).alias("x3"),
    )
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("x2").cast("decimal(38,0)")).alias("s2"),
        F.sum(F.col("x3").cast("decimal(38,0)")).alias("s3"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    t2 = F.col("s2").cast("double") / nd
    m2 = t2 - m1 * m1
    m3 = (
        F.col("s3").cast("double") / nd
        - F.lit(3.0) * m1 * t2
        + F.lit(2.0) * m1 * m1 * m1
    )
    sd = F.sqrt(m2)
    # Hash-portable final value: the double expression tree above is the
    # same IEEE-754 op sequence both engines run, and floor(x*1e4 + 0.5)
    # -> BIGINT quantizes it with plain IEEE ops (no engine-specific
    # decimal HALF_UP round on a double).  Zero-variance groups are
    # guarded EXACTLY via min==max (never a float m2 ~ 0 test).
    skew_e4 = F.when(
        F.col("mn") != F.col("mx"),
        F.floor(m3 / (sd * sd * sd) * F.lit(10000.0) + F.lit(0.5)).cast("long"),
    )
    return m.select(
        "event_type",
        "n",
        "s1",
        "s2",
        "s3",
        skew_e4.alias("skew_e4"),
    )


def _q_a19_user_entropy(spark, sf):
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity read (bots/loops score near 0, organic usage
    higher): H = ln(n) - sum(c*ln c)/n from EXACT per-type counts, the
    text_word_entropy contract shape over the events stream.  Two
    map-side-combinable partial aggs ((user, type) counts -> per-user
    fold); the ln terms carry word_entropy's accepted irrational-value
    policy (no exact-rational boundary exists for ln of integers > 1)."""
    e = graft.load(spark, sf, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    return c.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
        ).alias("entropy"),
    )


def _q_w22_ema(spark, sf):
    """Windowed exponential moving average (alpha=0.8 decay per step) over
    each user's last 8 events — the classic streaming feature-engineering
    smoother, made engine-portable by evaluating it as a FINITE window dot
    product: the ROWS frame collects the last 8 values in frame order
    (deterministic on both engines), and one left-to-right float fold
    weights them by alpha^(distance from newest) and normalizes by the
    weight sum.  The fold order is pinned by the array, never by
    partitioning, so the quantized value hashes identically everywhere.
    (The infinite-history EMA is the streaming form — applyInPandasWithState
    carries the running value; this bounded form is its batch/backfill
    twin and the one that needs no per-key state.)

    Scale: ONE (user_id) window shuffle; the fold is a per-row array
    expression over <= 8 elements — whole-stage codegen, no UDF."""
    e = graft.load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-7, Window.currentRow)
    )
    vals = F.collect_list(F.col("value")).over(w)  # frame order: oldest first
    # weight v_j by alpha^(n-1-j): newest (last) gets 1.  Left-to-right
    # folds over the same array on both engines -> identical IEEE sums.
    num = F.expr(
        "aggregate(vals, cast(0.0 as double),"
        " (acc, v) -> acc * 0.8 + cast(v as double))"
    )
    den = F.expr(
        "aggregate(vals, cast(0.0 as double), (acc, v) -> acc * 0.8 + 1.0)"
    )
    return (
        e.select("event_id", "user_id", vals.alias("vals"))
        .select(
            "event_id",
            "user_id",
            F.size("vals").alias("n_window"),
            F.floor(num / den * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("ema_e6"),
        )
    )


def _q_a17_group_kurtosis(spark, sf):
    """Per-group fourth-moment EXCESS KURTOSIS — the a16 quantize-then-
    exact-sum pattern extended to the 4th power sum.  Values are lossless
    centi-unit int64; x^2 fits int64 (|iv| <= 5.7e4 -> x2 <= 3.2e9) but
    x^4 does NOT (~9.8e18 vs int64 max 9.2e18), so the per-row 4th power
    is computed in decimal: x2 squared as decimal(19,0)*decimal(19,0),
    summed in decimal(38,0) (exact, associative under any merge order;
    the oracle's HUGEINT path is exact the same way).  The reported
    excess kurtosis m4/m2^2 - 3 is hash-portable: zero-variance groups
    guarded EXACTLY via min==max, one fixed IEEE-754 op sequence, final
    quantization floor(x*1e4 + 0.5) -> BIGINT.  Shape: ONE map-side-
    combinable partial agg; nothing global."""
    e = graft.load(spark, sf, "events")
    iv = F.round(F.col("value") * 100).cast("long")
    d = e.select(
        "event_type",
        iv.alias("x"),
        (iv * iv).alias("x2"),
        (iv * iv * iv).alias("x3"),
        (
            (iv * iv).cast("decimal(19,0)") * (iv * iv).cast("decimal(19,0)")
        ).alias("x4"),
    )
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("x2").cast("decimal(38,0)")).alias("s2"),
        F.sum(F.col("x3").cast("decimal(38,0)")).alias("s3"),
        F.sum(F.col("x4").cast("decimal(38,0)")).alias("s4"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    t2 = F.col("s2").cast("double") / nd
    t3 = F.col("s3").cast("double") / nd
    t4 = F.col("s4").cast("double") / nd
    m2 = t2 - m1 * m1
    m4 = (
        t4
        - F.lit(4.0) * m1 * t3
        + F.lit(6.0) * m1 * m1 * t2
        - F.lit(3.0) * m1 * m1 * m1 * m1
    )
    kurt_e4 = F.when(
        F.col("mn") != F.col("mx"),
        F.floor(
            (m4 / (m2 * m2) - F.lit(3.0)) * F.lit(10000.0) + F.lit(0.5)
        ).cast("long"),
    )
    return m.select(
        "event_type", "n", "s1", "s2", "s4", kurt_e4.alias("kurt_e4")
    )


def _q_corpus_dsir(spark, sf):
    """DSIR importance weights with src0 as the target domain — the
    domain-targeted data selection signal (see dsir_logratio's docstring
    for the hashed-feature scale path)."""
    return corpus.dsir_logratio(
        graft.load(spark, sf, "documents"), target_sources=("src0",)
    )


def _q_text_bpe_pairs(spark, sf):
    """Top-20 BPE merge candidates (adjacent within-word symbol pairs)
    over the documents corpus — the tokenizer-training first step as a
    bounded-key partial agg + top-k."""
    from plume_spark.operators.text import bpe_pair_counts

    return bpe_pair_counts(graft.load(spark, sf, "documents"), k=20)


def _q_emb_power_iter(spark, sf):
    """One power-iteration (von Mises) step toward the corpus's top
    principal direction: s = A^T (A v0) over the embedding matrix with the
    deterministic start v0 = 1 — the PCA/spectral building block that
    iterates to the dominant eigenvector of the uncentered Gram matrix.

    Determinism: embeddings quantize to integer micro-units (one
    round-to-bigint per value, identical on both engines); the row
    projection p_i = sum_d q_id is an int64 ARRAY fold (bounded by
    64 dims x ~1e6 — no overflow), and s_d = sum_i q_id * p_i accumulates
    exact decimal(38,0) — associative under any merge order.  The
    normalized component u_e6 divides by a 64-term double norm
    (dim-count-sized, not data-sized); its quantization carries the same
    accepted ~ulp risk as the repo's other derived floats, while the
    exact s rides along as the hashed contract.

    Scale: per-row projection is a zero-shuffle array fold (no self-join
    with a projection table); then ONE dim-keyed partial agg (64 keys) and
    a 64-row broadcast norm — the whole step is one pass over the matrix,
    which is why power iteration is THE scalable eigensolver shape."""
    emb = graft.load(spark, sf, "embeddings")
    t = emb.select(
        F.expr(
            "transform(embedding, v -> cast(round(cast(v as double) * 1000000)"
            " as bigint))"
        ).alias("q")
    ).withColumn("p", F.expr("aggregate(q, 0L, (acc, x) -> acc + x)"))
    x = t.select(F.posexplode("q").alias("dim", "qv"), "p")
    s = x.groupBy("dim").agg(
        F.sum((F.col("qv") * F.col("p")).cast("decimal(38,0)")).alias("s")
    ).localCheckpoint(eager=True)  # 64 rows, 2 consumers: norm, output
    nrm = s.agg(
        F.sqrt(F.sum(F.col("s").cast("double") * F.col("s").cast("double"))).alias(
            "nrm"
        )
    )
    return s.crossJoin(F.broadcast(nrm)).select(
        "dim",
        "s",
        F.floor(
            F.col("s").cast("double") / F.col("nrm") * F.lit(1000000.0) + F.lit(0.5)
        )
        .cast("long")
        .alias("u_e6"),
    )


def _q_corpus_bigram_logprob(spark, sf):
    """Interpolated bigram-LM quality score over documents (lam=0.7) —
    the KenLM-shaped gate one rung above corpus_unigram_logprob."""
    return corpus.bigram_logprob(graft.load(spark, sf, "documents"), lam=0.7)


def _q_text_pmi_bigrams(spark, sf):
    """Top-20 adjacent-word collocations by PMI over documents — exact
    slot counts, single-ln integer-pinned PMI (see pmi_bigrams)."""
    from plume_spark.operators.text import pmi_bigrams

    return pmi_bigrams(graft.load(spark, sf, "documents"), k=20)


def _q_w20_late_events(spark, sf):
    """Watermark lateness audit: replaying each user's events in arrival
    order (event_id), an event is LATE if its event time sits more than
    10 min behind the stream's high-water mark so far (max event time over
    preceding arrivals) — exactly the rows a Structured Streaming watermark
    of 10 min would drop.  Per event_type: arrival count, late count, and
    the worst lateness.  All values exact int64 (epoch microseconds), so
    the row is hash-portable by construction.

    Scale: one (user_id)-partitioned running-max window (the stream shard
    key — never a global order) + ONE map-side-combinable partial agg."""
    e = graft.load(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late_us = F.max(us).over(w) - F.lit(600000000) - us
    return (
        e.select("event_type", late_us.alias("late_us"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("late_us") > 0, 1)).alias("n_late"),
            F.max(F.when(F.col("late_us") > 0, F.col("late_us"))).alias(
                "max_late_us"
            ),
        )
    )


def _q_a18_group_corr(spark, sf):
    """Per-group Pearson correlation between event value and event time —
    the drift detector ("are values trending within this event class?") as
    the quantize-then-exact-sum pattern on TWO variables: x = centi-unit
    value (lossless int64), y = epoch seconds (exact int64), all five
    power/cross sums exact decimal(38,0) (x*y <= 5.7e4 * 1.8e9 ~ 1e14 and
    y*y ~ 3e18 both fit int64 per row; sums are associative under any merge
    order).  corr = (n*sxy - sx*sy) / sqrt((n*sxx - sx^2)(n*syy - sy^2))
    is one fixed IEEE op sequence over the exact sums with BOTH variances
    guarded exactly via min==max, quantized floor(x*1e6+0.5) — hash-
    portable.  Shape: ONE map-side-combinable partial agg."""
    e = graft.load(spark, sf, "events")
    x = F.round(F.col("value") * 100).cast("long")
    y = F.col("ts").cast("timestamp").cast("long")
    d = e.select(
        "event_type",
        x.alias("x"),
        y.alias("y"),
        (x * y).alias("xy"),
        (x * x).alias("xx"),
        (y * y).alias("yy"),
    )
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("xy").cast("decimal(38,0)")).alias("sxy"),
        F.sum(F.col("xx").cast("decimal(38,0)")).alias("sxx"),
        F.sum(F.col("yy").cast("decimal(38,0)")).alias("syy"),
        F.min("x").alias("mnx"),
        F.max("x").alias("mxx"),
        F.min("y").alias("mny"),
        F.max("y").alias("mxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    cov = F.col("sxy").cast("double") * nd - sxd * syd
    vx = F.col("sxx").cast("double") * nd - sxd * sxd
    vy = F.col("syy").cast("double") * nd - syd * syd
    corr_e6 = F.when(
        (F.col("mnx") != F.col("mxx")) & (F.col("mny") != F.col("mxy")),
        F.floor(cov / F.sqrt(vx * vy) * F.lit(1000000.0) + F.lit(0.5)).cast("long"),
    )
    return m.select(
        "event_type", "n", "sx", "sy", "sxy", corr_e6.alias("corr_e6")
    )


def _q_g16_modularity(spark, sf):
    """Newman modularity of the g6 label-propagation communities over the
    same transcript DAG (undirected reading) — the community-quality
    gate run before materializing a partition (sum of contrib_e10 = Q in
    1e-10 units).  Pure composition: g6's labels (the already-pinned
    2-round synchronous propagation) + one canonical edge set + two
    partial aggs; the edge count joins as a broadcast scalar."""
    from plume_spark.operators.graph_metrics import label_propagation, modularity

    edges = graft.dag_edges(spark, sf)
    labels = label_propagation(edges, n_iters=2, a="subj", b="obj")
    return modularity(edges, labels, a="subj", b="obj")


def _q_g15_component_profile(spark, sf):
    """Per-component structure profile over g2's multi-component DAG: node
    count, edge count, and the tree test (n_edges == n_nodes - 1) — the
    "know your graph before you process it" read that sizes the CC loop's
    skew exposure (one giant component -> salting; many small trees ->
    per-component driver kernels are safe).  Pure composition: the CC
    labels feed one edge-side equi-join (an edge's component is its
    subject's label — equal to the object's by definition of CC) and two
    partial aggs; everything after the CC loop is component-count-sized.
    All outputs exact int64/bool."""
    labels = _q_g2_components(spark, sf)  # (node, component)
    o = graft.load(spark, sf, "orders")
    li = graft.load(spark, sf, "lineitem")
    e1 = o.select(
        F.col("o_custkey").alias("subj"),
        (F.lit(graft.NODE_ORDER_OFFSET) + F.col("o_orderkey")).alias("obj"),
    )
    e2 = li.select(
        (F.lit(graft.NODE_ORDER_OFFSET) + F.col("l_orderkey")).alias("subj"),
        (F.lit(graft.NODE_PART_OFFSET) + F.col("l_partkey")).alias("obj"),
    ).filter(F.col("obj") % 23 == 0)
    edges = e1.unionByName(e2).distinct()
    nodes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("n_nodes"))
    edge_comp = edges.join(
        labels.withColumnRenamed("node", "subj"), "subj"
    ).groupBy("component").agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        nodes.join(edge_comp, "component", "left")
        .select(
            "component",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            (F.coalesce("n_edges", F.lit(0)) == F.col("n_nodes") - 1).alias(
                "is_tree"
            ),
        )
    )


def _q_ann_lsh_recall(spark, sf):
    """LSH retrieval-quality audit: for each of the exact cosine top-10
    (ann_cosine_topk's pinned ranking, query vec 0), whether the hit shares
    the query's sign-hyperplane bucket — i.e. whether single-probe LSH
    WOULD have retrieved it.  The recall@k reading that decides n_planes /
    multi-probe settings before committing an index layout, sibling of
    emb_matryoshka's truncation audit (each grades one approximation
    against the same exact contract).  The bucket dimension rows here are
    1 (query bucket) + candidates — broadcast joins only; the exact side
    is the TakeOrderedAndProject top-k."""
    emb = graft.load(spark, sf, "embeddings")
    top = similarity.brute_force_topk(emb, query_vec_id=0, k=10)
    b = similarity.lsh_buckets(emb).select("vec_id", "bucket")
    qb = b.filter(F.col("vec_id") == 0).select(F.col("bucket").alias("qbucket"))
    cand = b.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket")).select(
        F.col("vec_id").alias("c_id")
    )
    return top.join(
        F.broadcast(cand), top["vec_id"] == F.col("c_id"), "left"
    ).select(
        "vec_id", "cos_sim", F.col("c_id").isNotNull().alias("in_query_bucket")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registration order matters: the driver's correctness sweep samples the
    # FIRST ~50 entries.  Union of CORRECTNESS_r01-r04 covers 101 of the 163
    # names; this round the dict leads with the 62-name residue that has
    # never had a driver-green row (VERDICT r04 "Next round" #2 / the
    # SURVEY round-5 rotation plan), in prior registration order, followed
    # by the 101 already-driver-proven names.  The residue past the ~50-row
    # window is additionally pinned by the committed full-run artifact
    # CORRECTNESS_full_r05.json (scripts/check_oracle.py --emit).
    return {
        # --- new in round 5 (never checked by anything before this round) --
        "ann_multiprobe_topk": _q_ann_multiprobe_topk,
        "dedup_lsh_recall": _q_dedup_lsh_recall,
        "a17_group_kurtosis": _q_a17_group_kurtosis,
        "g16_modularity": _q_g16_modularity,
        "corpus_dsir": _q_corpus_dsir,
        "text_bpe_pairs": _q_text_bpe_pairs,
        "text_pmi_bigrams": _q_text_pmi_bigrams,
        "w20_late_events": _q_w20_late_events,
        "emb_power_iter": _q_emb_power_iter,
        "a18_group_corr": _q_a18_group_corr,
        "corpus_bigram_logprob": _q_corpus_bigram_logprob,
        "ann_filtered_topk": _q_ann_filtered_topk,
        "ann_batch_topk": _q_ann_batch_topk,
        "stream_dedup": _q_stream_dedup,
        "w22_ema": _q_w22_ema,
        "ann_recall_curve": _q_ann_recall_curve,
        "a19_user_entropy": _q_a19_user_entropy,
        # --- never driver-checked (rounds 1-4) — rotation lead block ----
        "w10_zscore_outliers": _q_w10_zscore_outliers,
        "text_word_entropy": _q_text_word_entropy,
        "corpus_length_hist": _q_corpus_length_hist,
        "kg_schema_induce": _q_kg_schema_induce,
        "kg_pred_cardinality": _q_kg_pred_cardinality,
        "kg_entity_cooccur": _q_kg_entity_cooccur,
        "w7_retention_cohorts": _q_w7_retention_cohorts,
        "t5_interval_overlap": _q_t5_interval_overlap,
        "a7_percentiles": _q_a7_percentiles,
        "a8_rollup": _q_a8_rollup,
        "g2_components": _q_g2_components,
        "g3_triangles": _q_g3_triangles,
        "g4_cooccur": _q_g4_cooccur,
        "g6_label_prop": _q_g6_label_prop,
        "g7_kcore": _q_g7_kcore,
        "g8_common_neighbors": _q_g8_common_neighbors,
        "w3_sessionize": _q_w3_sessionize,
        "w4_sliding_rate": _q_w4_sliding_rate,
        "w5_funnel": _q_w5_funnel,
        "w6_event_runs": _q_w6_event_runs,
        "diag_hot_keys": _q_diag_hot_keys,
        "t1_asof_join": _q_t1_asof_join,
        "t2_range_join": _q_t2_range_join,
        "t3_ohlc_downsample": _q_t3_ohlc_downsample,
        "t4_resample_gapfill": _q_t4_resample_gapfill,
        "dedup_minhash_incr": _q_dedup_incr,
        "dedup_minhash_groups": _q_dedup_groups,
        "corpus_decon_overlap": _q_corpus_decon,
        "corpus_boilerplate": _q_corpus_boilerplate,
        "corpus_train_val_split": _q_corpus_split,
        "corpus_tfidf_topk": _q_corpus_tfidf,
        "corpus_pack_chunks": _q_corpus_pack,
        "corpus_select": _q_corpus_select,
        "corpus_unigram_logprob": _q_corpus_logprob,
        "corpus_repetition": _q_corpus_repetition,
        "corpus_mix_sample": _q_corpus_mix_sample,
        "corpus_dupe_ngrams": _q_corpus_dupe_ngrams,
        "corpus_quality_tiers": _q_corpus_quality_tiers,
        "a9_pivot": _q_a9_pivot,
        "emb_centroids": _q_emb_centroids,
        "emb_quantize": _q_emb_quantize,
        "f11_levenshtein": _q_f11_levenshtein,
        "f5_json_payload": _q_f5_json_payload,
        "text_pii_scrub": _q_text_pii_scrub,
        "text_quality_logreg": _q_text_quality_logreg,
        "ann_knn_graph": _q_ann_knn_graph,
        "stream_sessionize": _q_stream_sessionize,
        "stream_kg_build": _q_stream_kg_build,
        "stream_turn_counts": _q_stream_turn_counts,
        "kg_build_incr": _q_kg_build_incr,
        "kg_entities": _q_kg_entities,
        "kg_entity_degrees": _q_kg_entity_degrees,
        "kg_path2": _q_kg_path2,
        "kg_triple_support": _q_kg_triple_support,
        "g9_assortativity": _q_g9_assortativity,
        "corpus_ngram_novelty": _q_corpus_ngram_novelty,
        "g10_clustering_coeff": _q_g10_clustering,
        "ann_range_search": _q_ann_range_search,
        "kg_conflicts": _q_kg_conflicts,
        "w8_transition_matrix": _q_w8_transition_matrix,
        "corpus_keep_best": _q_corpus_keep_best,
        "text_readability": _q_text_readability,
        # --- driver-green in r01-r04 (trailing block) -----------------------
        "ann_rerank": _q_ann_rerank,
        "g13_linkpred_ra": _q_g13_linkpred_ra,
        "kg_neg_samples": _q_kg_neg_samples,
        "corpus_chunk_windows": _q_corpus_chunk_windows,
        "text_zipf_slope": _q_text_zipf_slope,
        "w19_attribution": _q_w19_attribution,
        "ann_ivf_adc": _q_ann_ivf_adc,
        "corpus_decon_bloom": _q_corpus_decon_bloom,
        "emb_matryoshka": _q_emb_matryoshka,
        "g14_ppr": _q_g14_ppr,
        "emb_kmeans_step": _q_emb_kmeans_step,
        "kg_rule_confidence": _q_kg_rule_confidence,
        "a16_group_skewness": _q_a16_group_skewness,
        "g15_component_profile": _q_g15_component_profile,
        "ann_lsh_recall": _q_ann_lsh_recall,
        "a15_bloom": _q_a15_bloom,
        "kg_star_join": _q_kg_star_join,
        "ann_pq_adc": _q_ann_pq_adc,
        "w18_streaks": _q_w18_streaks,
        "t6_scd2": _q_t6_scd2,
        "w13_rolling_active": _q_w13_rolling_active,
        "a12_cube": _q_a12_cube,
        "w14_rfm": _q_w14_rfm,
        "kg_sym_preds": _q_kg_sym_preds,
        "kg_current_facts": _q_kg_current_facts,
        "g12_hits": _q_g12_hits,
        "kg_degree_hist": _q_kg_degree_hist,
        "corpus_ccnet_cut": _q_corpus_ccnet_cut,
        "w15_interarrival": _q_w15_interarrival,
        "corpus_decon_fuzzy": _q_corpus_decon_fuzzy,
        "corpus_gopher_rules": _q_corpus_gopher_rules,
        "a13_mad": _q_a13_mad,
        "corpus_dup_cluster_stats": _q_corpus_dup_cluster_stats,
        "emb_pq_codes": _q_emb_pq_codes,
        "kg_alias_merge": _q_kg_alias_merge,
        "w16_gini": _q_w16_gini,
        "a14_countmin": _q_a14_countmin,
        "w17_rank_family": _q_w17_rank_family,
        "t7_asof_tolerance": _q_t7_asof_tolerance,
        "a10_approx_distinct": _q_a10_approx_distinct,
        "a11_approx_quantile": _q_a11_approx_quantile,
        "w9_peak_concurrency": _q_w9_peak_concurrency,
        "g11_edge_lift": _q_g11_edge_lift,
        "corpus_containment": _q_corpus_containment,
        "kg_fact_recency": _q_kg_fact_recency,
        "corpus_weighted_sample": _q_corpus_weighted_sample,
        "w11_week_over_week": _q_w11_week_over_week,
        "emb_outliers": _q_emb_outliers,
        "corpus_vocab_growth": _q_corpus_vocab_growth,
        "w12_time_to_convert": _q_w12_time_to_convert,
        "u3_except_intersect": _q_u3_except_intersect,
        "w1_turn_ordering": _q_w1,
        "w2_lag_context": _q_w2,
        "w1_reassemble": _q_w1_reassemble,
        "o1_topk": _q_o1,
        "a1_group_sum": _q_a1,
        "a2_filtered_count": _q_a2,
        "a5_collect_set": _q_a5,
        "u1_union_distinct": _q_u1,
        "p1_projection_defaults": _q_p1,
        "j1_edge_endpoint_join": _q_j1,
        "p2_bulk_exists": _q_p2,
        "p3_edge_exists": _q_p3,
        "p7_roots": _q_p7,
        "j6_out_neighbors": _q_j6,
        "j7_two_hop": _q_j7,
        "j7_reachable": _q_j7r,
        "g5_bfs_dist": _q_g5_bfs,
        "j4_point_lookup": _q_j4,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_ngram_jaccard": _q_dedup_ngram,
        "dedup_embedding_cosine": _q_dedup_embedding,
        "p5_property_presence": _q_p5,
        "p6_theta_filter": _q_p6,
        "p9_role_filter": _q_p9,
        "a3_node_count": _q_a3,
        "j5_scan_lookup": _q_j5,
        "f2_list_csv": _q_f2,
        "f8_content_hash": _q_f8,
        "j8_constraint_check": _q_j8,
        "text_token_stats": _q_text_stats,
        "text_quality": _q_text_quality,
        "text_langid": _q_text_langid,
        "text_fingerprint": _q_text_fingerprint,
        "ann_cosine_topk": _q_ann_topk,
        "ann_lsh_buckets": _q_ann_lsh,
        "ann_blocked_pairs": _q_ann_blocked,
        "ann_ivf_topk": _q_ann_ivf,
        "kg_extract_raw": _q_kg_extract_raw,
        "kg_build_triples": _q_kg_build,
        "mm_feature_extract": _q_mm_features,
        "j8b_kind_constraints": _q_j8b_kind_constraints,
        "j7_parent_walk": _q_parent_walk,
        "a1_order_sum": _q_order_sum,
        "a2_order_count": _q_order_count,
        "a4_map_merge": _q_a4_map_merge,
        "stream_ordered_release": _q_stream_ordered_release,
        "mm_frame_sample": _q_mm_frame_sample,
        "g1_pagerank": _q_g1_pagerank,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB) — same names, same column names, same values
# --------------------------------------------------------------------------

_TRANSCRIPTS_CTE = """
WITH transcripts AS (
  SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         event_type AS role,
         concat_ws(' ', event_type, props) AS text
  FROM events)
"""

# the oracle SQL below hardcodes the node-id offsets as literals; fail at
# import if graft's constants ever move so the strings can't silently drift
assert graft.NODE_ORDER_OFFSET == 1_000_000 and graft.NODE_PART_OFFSET == 2_000_000

_EDGES_CTE = """
WITH edges AS (
  SELECT o_custkey AS subj, 1000000 + o_orderkey AS obj FROM orders
  UNION ALL
  SELECT 1000000 + l_orderkey, 2000000 + l_partkey FROM lineitem)
"""

# portable token ids: polynomial rolling hash over character codes mod P —
# mirrors dedup.portable_token_ids exactly (fold(acc*131 + ascii(c)) mod P);
# the CAST(0 AS BIGINT) seed forces 64-bit accumulation (acc*131 overflows
# INT32).  No dictionary, no global sort — on either engine.
_POLY_ID = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split_regex(tok, ''), c -> ascii(c))), "
    f"(a, b) -> (a * {dedup.POLY_MUL} + b) % {dedup.MINHASH_P})"
)

_TOK_CTE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
ids AS (SELECT DISTINCT doc_id, {_POLY_ID} AS tok_id FROM tok)
"""

# word-3-gram shingle units for minhash (order-sensitive near-dup unit)
_SHINGLE_CTE = f"""
WITH t0 AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 3),
tok AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tok
  FROM t0, (SELECT unnest(range(1, (SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) + 1 FROM documents))) AS i)
  WHERE i <= len(toks) - 2),
ids AS (SELECT DISTINCT doc_id, {_POLY_ID} AS tok_id FROM tok)
"""

_MINHASH_PARAMS = ", ".join(
    f"({i}, {dedup.MINHASH_A[i]}, {dedup.MINHASH_B[i]})" for i in range(dedup.MINHASH_K)
)


def _minhash_oracle_body(
    verify_table: str, verify_col: str, pair_where: str = "", round_digits: int = 4
) -> str:
    q_scale = float(10**round_digits)
    """Banding/cap/star/verify SQL shared by the full and incremental minhash
    oracles — one source of truth so a banding change cannot desynchronize
    them.  ``verify_table``/``verify_col``: the exact-Jaccard substrate
    ("tok"/"tok" for raw shingles — the full path; "idd"/"tok_id" for the
    persisted-index token ids — the incremental path)."""
    return f""",
        params(h, a, b) AS (VALUES {_MINHASH_PARAMS}),
        sig AS (
          SELECT doc_id, h, min((a * tok_id + b) % 2147483647) AS minhash
          FROM ids CROSS JOIN params GROUP BY doc_id, h),
        bands AS (
          SELECT doc_id, h // {dedup.BAND_ROWS} AS band,
                 string_agg(CAST(minhash AS VARCHAR), '-' ORDER BY h) AS band_sig
          FROM sig GROUP BY doc_id, h // {dedup.BAND_ROWS}),
        okb AS (
          SELECT band, band_sig FROM bands
          GROUP BY band, band_sig HAVING count(*) <= {dedup.MAX_BUCKET_SIZE}),
        bandsok AS (
          SELECT bands.* FROM bands
          JOIN okb ON bands.band = okb.band AND bands.band_sig = okb.band_sig),
        cand0 AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bandsok a JOIN bandsok b ON a.band = b.band AND a.band_sig = b.band_sig
          WHERE a.doc_id < b.doc_id),
        idd AS (SELECT DISTINCT doc_id, tok_id FROM ids),
        gsets AS (
          SELECT doc_id, string_agg(CAST(tok_id AS VARCHAR), ',' ORDER BY tok_id) AS gset
          FROM idd GROUP BY doc_id),
        starg AS (
          SELECT gset, min(doc_id) AS mn FROM gsets
          GROUP BY gset HAVING count(*) > 1),
        star AS (
          SELECT g.mn AS doc_a, s.doc_id AS doc_b
          FROM gsets s JOIN starg g ON s.gset = g.gset AND s.doc_id <> g.mn),
        cand AS (
          SELECT doc_a, doc_b FROM
            (SELECT doc_a, doc_b FROM cand0 UNION SELECT doc_a, doc_b FROM star)
          {pair_where}),
        sizes AS (SELECT doc_id, count(*) AS sz FROM {verify_table} GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS i
          FROM cand c
          JOIN {verify_table} ta ON ta.doc_id = c.doc_a
          JOIN {verify_table} tb ON tb.doc_id = c.doc_b
            AND tb.{verify_col} = ta.{verify_col}
          GROUP BY c.doc_a, c.doc_b)
        SELECT doc_a, doc_b,
               CAST(floor((i * 1.0 / (sa.sz + sb.sz - i))
                          * {q_scale} + 0.5) / {q_scale} AS DOUBLE)
                 AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = inter.doc_a
        JOIN sizes sb ON sb.doc_id = inter.doc_b
        WHERE i * 1.0 / (sa.sz + sb.sz - i) >= {dedup.JACCARD_TAU}"""


def oracle_sql() -> dict[str, str]:
    sql = {}
    sql["w1_turn_ordering"] = (
        _TRANSCRIPTS_CTE
        + "SELECT conv_id, turn_idx, role, text FROM transcripts WHERE turn_idx < 3"
    )
    sql["w2_lag_context"] = (
        _TRANSCRIPTS_CTE
        + """
        SELECT conv_id, turn_idx, prev_text FROM (
          SELECT conv_id, turn_idx,
                 lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_text
          FROM transcripts)
        WHERE turn_idx < 3"""
    )
    sql["w1_reassemble"] = (
        _TRANSCRIPTS_CTE
        + """
        SELECT conv_id,
               string_agg(text, chr(10) ORDER BY turn_idx) AS joined_text
        FROM transcripts GROUP BY conv_id"""
    )
    sql["o1_topk"] = (
        "SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 100"
    )
    sql["a1_group_sum"] = """
        SELECT user_id,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               count(*) AS n
        FROM events GROUP BY user_id"""
    sql["a2_filtered_count"] = "SELECT count(*) AS n FROM events WHERE value > 100"
    sql["a5_collect_set"] = """
        SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types
        FROM events GROUP BY user_id"""
    sql["u1_union_distinct"] = """
        SELECT event_type FROM events WHERE value > 150
        UNION
        SELECT event_type FROM events WHERE value < 50"""
    sql["p1_projection_defaults"] = """
        SELECT c_custkey, coalesce(c_mktsegment, '<empty>') AS segment,
               coalesce(c_acctbal, -1.0) AS acctbal
        FROM customer"""
    sql["j1_edge_endpoint_join"] = """
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey"""
    sql["p2_bulk_exists"] = """
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)"""
    sql["p3_edge_exists"] = """
        SELECT (EXISTS(SELECT 1 FROM orders WHERE o_custkey = 1)) AS fwd,
               (EXISTS(SELECT 1 FROM lineitem WHERE l_orderkey = -5)) AS missing"""
    sql["p7_roots"] = (
        _EDGES_CTE
        + """SELECT DISTINCT subj AS node FROM edges e
             WHERE NOT EXISTS (SELECT 1 FROM edges i WHERE i.obj = e.subj)"""
    )
    sql["j6_out_neighbors"] = """
        SELECT DISTINCT 1000000 + o_orderkey AS node FROM orders WHERE o_custkey < 5"""
    sql["j7_two_hop"] = """
        SELECT DISTINCT 2000000 + l_partkey AS node
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_custkey < 10"""
    sql["j7_reachable"] = """
        SELECT c_custkey AS node FROM customer WHERE c_custkey < 3
        UNION
        SELECT 1000000 + o_orderkey FROM orders WHERE o_custkey < 3
        UNION
        SELECT 2000000 + l_partkey
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_custkey < 3"""
    sql["g5_bfs_dist"] = """
        SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
          SELECT c_custkey AS node, 0 AS dist FROM customer WHERE c_custkey < 3
          UNION ALL
          SELECT 1000000 + o_orderkey, 1 FROM orders WHERE o_custkey < 3
          UNION ALL
          SELECT 2000000 + l_partkey, 2
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          WHERE o_custkey < 3
        ) GROUP BY node"""
    names = ", ".join(f"'{n}'" for n in LOOKUP_NAMES)
    sql["j4_point_lookup"] = (
        f"SELECT c_custkey, c_name FROM customer WHERE c_name IN ({names})"
    )
    sql["dedup_exact"] = """
        SELECT doc_id,
               CASE WHEN text IS NULL THEN doc_id
                    ELSE min(doc_id) OVER (PARTITION BY text) END AS keeper_id,
               CASE WHEN text IS NULL THEN 1
                    ELSE count(*) OVER (PARTITION BY text) END AS group_size
        FROM documents"""
    sql["dedup_minhash_lsh"] = _SHINGLE_CTE + _minhash_oracle_body("tok", "tok")
    # the streamed index stores round(jaccard, 6); otherwise identical to
    # the offline full-run pair set — that equality IS the contract
    sql["stream_dedup"] = _SHINGLE_CTE + _minhash_oracle_body(
        "tok", "tok", round_digits=6
    )
    # fuzzy decon = the SAME verified pair set, filtered to cross-split
    # links — one source of truth with the dedup oracle
    sql["corpus_decon_fuzzy"] = f"""
        WITH p AS ({sql['dedup_minhash_lsh']})
        SELECT CASE WHEN doc_b % {corpus.EVAL_MOD} = 0 THEN doc_a
                    ELSE doc_b END AS train_doc,
               CASE WHEN doc_b % {corpus.EVAL_MOD} = 0 THEN doc_b
                    ELSE doc_a END AS eval_doc,
               jaccard
        FROM p
        WHERE (doc_a % {corpus.EVAL_MOD} = 0) <> (doc_b % {corpus.EVAL_MOD} = 0)"""
    sql["corpus_gopher_rules"] = """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents),
        s AS (
          SELECT doc_id, len(toks) AS n_tokens,
                 CAST(list_aggregate(list_transform(toks, x -> length(x)),
                                     'sum') AS DOUBLE) / len(toks) AS mwl,
                 CAST(len(list_filter(toks,
                        x -> x IN ('the', 'a', 'of', 'to', 'and')))
                      AS DOUBLE) / len(toks) AS sf
          FROM t),
        f AS (
          SELECT doc_id, n_tokens, mwl, sf,
                 n_tokens >= 20 AS ok_len,
                 mwl >= 4.0 AND mwl <= 5.0 AS ok_mwl,
                 sf >= 0.03 AS ok_stop
          FROM s)
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
               floor((mwl) * 1000000.0 + 0.5) / 1000000.0 AS mean_word_len,
               floor((sf) * 1000000.0 + 0.5) / 1000000.0 AS stop_frac,
               ok_len AND ok_mwl AND ok_stop AS passed,
               coalesce(array_to_string(list_filter(
                 [CASE WHEN NOT ok_len THEN 'short' END,
                  CASE WHEN NOT ok_mwl THEN 'wordlen' END,
                  CASE WHEN NOT ok_stop THEN 'stopwords' END],
                 x -> x IS NOT NULL), ','), '') AS fail_reasons
        FROM f"""
    sql["dedup_simhash"] = (
        _TOK_CTE
        + f""",
        s AS (SELECT doc_id, (tok_id * {dedup.SIMHASH_SCRAMBLE}) % 4294967296 AS s FROM ids),
        bits AS (
          SELECT doc_id, j, sum(((s // (1::BIGINT << j)) % 2) * 2 - 1) AS sm
          FROM s CROSS JOIN (SELECT unnest(range(0, {dedup.SIMHASH_BITS})) AS j)
          GROUP BY doc_id, j)
        SELECT doc_id,
               CAST(sum(CASE WHEN sm >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id"""
    )
    sql["dedup_ngram_jaccard"] = """
        WITH t AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents
          WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 3),
        sh AS (
          SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
          FROM t, (SELECT unnest(range(1, (SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) + 1 FROM documents))) AS i)
          WHERE i <= len(toks) - 2),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b,
               CAST(floor((i * 1.0 / (sa.sz + sb.sz - i)) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5"""
    sql["dedup_lsh_recall"] = f"""
        WITH ex AS ({sql['dedup_ngram_jaccard']}),
        ap AS (SELECT doc_a, doc_b FROM ({sql['dedup_minhash_lsh']})),
        h AS (
          SELECT ex.doc_a, ex.doc_b, ex.jaccard,
                 EXISTS (SELECT 1 FROM ap
                         WHERE ap.doc_a = ex.doc_a AND ap.doc_b = ex.doc_b)
                   AS lsh_found
          FROM ex)
        SELECT doc_a, doc_b, jaccard, lsh_found,
               count(*) OVER () AS n_exact,
               CAST(sum(CASE WHEN lsh_found THEN 1 ELSE 0 END) OVER ()
                    AS BIGINT) AS n_found,
               CAST(sum(CASE WHEN lsh_found THEN 1 ELSE 0 END) OVER ()
                    AS BIGINT) * 5 >= count(*) OVER () * 4 AS recall_ok
        FROM h"""
    sql["text_token_stats"] = """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS toks,
                 list_filter(
                   string_split(
                     regexp_replace(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+)', '\\1' || chr(31), 'g'),
                     chr(31)),
                   x -> trim(x) <> '') AS subtoks
          FROM documents)
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct_tokens,
               CAST(floor((list_aggregate(list_transform(toks, x -> length(x)), 'sum') * 1.0 / greatest(len(toks), 1)) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS avg_token_len,
               len(subtoks) AS n_subtokens
        FROM t"""
    stop_list = ", ".join(f"'{s}'" for s in text.STOPWORDS)
    def _quality_select() -> str:
        return f"""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split(text, ' '), x -> x <> '') AS toks,
                 length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
          FROM documents),
        m AS (
          SELECT doc_id, text, n_punct,
                 greatest(len(toks), 1) AS n_tok,
                 len(list_filter(toks, x -> list_contains([{stop_list}], lower(x)))) AS n_stop
          FROM t)
        SELECT doc_id,
               CAST(floor((n_stop * 1.0 / n_tok) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS stopword_ratio,
               CAST(floor((n_punct * 1.0 / greatest(length(text), 1)) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS punct_ratio,
               CAST(floor(((CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 0.4 ELSE 0.0 END) + least(n_stop * 1.0 / n_tok, 0.3) + (CASE WHEN n_punct * 1.0 / greatest(length(text), 1) < 0.1 THEN 0.3 ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS quality
        FROM m"""

    sql["text_quality"] = _quality_select()
    def _langid_select() -> str:
        marker_cases = []
        for i, lang in enumerate(sorted(text.LANG_MARKERS)):
            arr = ", ".join(f"'{m}'" for m in text.LANG_MARKERS[lang])
            marker_cases.append(
                f"len(list_filter(toks, x -> list_contains([{arr}], x))) AS s_{lang}"
            )
        langs = sorted(text.LANG_MARKERS)
        when_chain = " ".join(
            f"WHEN s_{lang} = m THEN '{lang}'" for lang in langs[:-1]
        )
        return f"""
            WITH t AS (
              SELECT doc_id, text,
                     list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
              FROM documents),
            s AS (SELECT doc_id, text, {', '.join(marker_cases)} FROM t),
            m AS (SELECT *, greatest({', '.join('s_' + la for la in langs)}) AS m FROM s)
            SELECT doc_id,
                   CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                        WHEN m = 0 THEN 'und'
                        {when_chain}
                        ELSE '{langs[-1]}' END AS pred_lang
            FROM m"""

    sql["text_langid"] = _langid_select()
    sql["corpus_select"] = f"""
        WITH q AS ({_quality_select()}),
        l AS ({_langid_select()}),
        k AS (SELECT doc_id,
                     CASE WHEN text IS NULL THEN doc_id
                          ELSE min(doc_id) OVER (PARTITION BY text) END AS keeper_id
              FROM documents)
        SELECT d.doc_id, q.quality, l.pred_lang
        FROM documents d
        JOIN q USING (doc_id) JOIN l USING (doc_id) JOIN k USING (doc_id)
        WHERE q.quality >= 0.5 AND l.pred_lang = 'en' AND d.doc_id = k.keeper_id"""
    sql["text_fingerprint"] = """
        WITH t AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents),
        e AS (
          SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
          FROM t)
        SELECT doc_id,
               CAST(sum((pos * (((length(tok) * 131 + ascii(tok)) * 131 + ascii(reverse(tok)))
                                % 1000000007)) % 1000000007)
                    % 1000000007 AS BIGINT) AS fingerprint
        FROM e GROUP BY doc_id"""
    sql["ann_cosine_topk"] = """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               CAST(round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qe), 4) AS DOUBLE) AS cos_sim
        FROM embeddings, q
        ORDER BY cos_sim DESC, vec_id LIMIT 10"""
    sql["ann_batch_topk"] = """
        WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < 5),
        scored AS (
          SELECT q.q_id, e.vec_id,
                 CAST(round(list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[]), q.qe), 4) AS DOUBLE)
                   AS cos_sim
          FROM embeddings e CROSS JOIN q),
        ranked AS (
          SELECT q_id, vec_id, cos_sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos_sim DESC, vec_id ASC) AS rank
          FROM scored)
        SELECT q_id, rank, vec_id, cos_sim FROM ranked WHERE rank <= 3"""
    sql["ann_filtered_topk"] = """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               CAST(round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qe), 4) AS DOUBLE) AS cos_sim
        FROM embeddings, q
        WHERE label % 3 = 0
        ORDER BY cos_sim DESC, vec_id LIMIT 10"""
    sql["ann_range_search"] = """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               CAST(round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qe), 4) AS DOUBLE) AS cos_sim
        FROM embeddings, q
        WHERE round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qe), 4) >= 0.2"""
    bucket_cte = f"""
        WITH e AS (
          SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings),
        proj AS (
          SELECT vec_id, p,
                 sum(x * (((i * {similarity._W_MUL_I} + (p+1) * {similarity._W_MUL_P})
                           % {similarity._W_MOD}) - {similarity._W_OFF})) AS s
          FROM e CROSS JOIN (SELECT unnest(range(0, {similarity.N_PLANES})) AS p)
          GROUP BY vec_id, p),
        buckets AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
          FROM proj GROUP BY vec_id)"""
    sql["ann_lsh_buckets"] = bucket_cte + "\nSELECT vec_id, bucket FROM buckets"
    sql["dedup_embedding_cosine"] = (
        bucket_cte
        + """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                                 CAST(eb.embedding AS DOUBLE[])), 4) AS DOUBLE) AS cos_sim
        FROM buckets a
        JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
        WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                           CAST(eb.embedding AS DOUBLE[])), 4) >= 0.35"""
    )
    sql["ann_knn_graph"] = (
        bucket_cte
        + """,
        pairs AS (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 CAST(round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                                   CAST(eb.embedding AS DOUBLE[])), 4) AS DOUBLE) AS cos_sim
          FROM buckets a
          JOIN buckets b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings eb ON eb.vec_id = b.vec_id)
        SELECT src, dst, cos_sim + 0.0 AS cos_sim FROM (
          SELECT src, dst, cos_sim,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY cos_sim DESC, dst ASC) AS rn
          FROM pairs)
        WHERE rn <= 5"""
    )
    sql["p5_property_presence"] = """
        SELECT event_id, event_type FROM events
        WHERE props IS NOT NULL AND props <> ''"""
    sql["p6_theta_filter"] = "SELECT event_id, value FROM events WHERE value > 2"
    sql["p9_role_filter"] = (
        _TRANSCRIPTS_CTE
        + "SELECT conv_id, turn_idx, role FROM transcripts WHERE role IN ('click', 'purchase')"
    )
    sql["a3_node_count"] = "SELECT count(*) AS n FROM customer"
    sql["j5_scan_lookup"] = (
        f"SELECT c_custkey, c_name FROM customer WHERE c_name IN ({names})"
    )
    sql["f2_list_csv"] = """
        WITH t AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents)
        SELECT doc_id,
               array_to_string(toks, ',') AS csv,
               len(toks) AS n_items,
               string_split(array_to_string(toks, ','), ',')[1] AS first_item
        FROM t"""
    sql["f8_content_hash"] = """
        SELECT c_custkey, sha256('customer|' || c_name) AS content_hash
        FROM customer"""
    sql["j8_constraint_check"] = (
        _EDGES_CTE
        + """
        SELECT count(*) AS n_violations FROM edges e
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.subj)"""
    )
    sql["ann_blocked_pairs"] = """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(b.embedding AS DOUBLE[])), 4) AS DOUBLE) AS cos_sim
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) >= 0.35"""
    subj_norm = NORM_SQL.format(col="c_name")
    obj_norm = NORM_SQL.format(col="n_name")
    sql["kg_extract_raw"] = f"""
        WITH t AS (
          SELECT c.c_custkey, c.c_name, n.n_name, o.o_orderkey,
                 CAST(row_number() OVER (PARTITION BY c.c_custkey
                                         ORDER BY o.o_orderdate, o.o_orderkey) - 1 AS INT) AS turn_idx
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN orders o ON o.o_custkey = c.c_custkey)
        SELECT 'conv-' || CAST(c_custkey AS VARCHAR) AS conv_id, turn_idx,
               {subj_norm} AS subj_norm,
               CASE WHEN o_orderkey % 2 = 0 THEN 'works_at' ELSE 'visited' END AS pred,
               {obj_norm} AS obj_norm
        FROM t"""
    # the stateful release is exactly-once and in-order, so its output set is
    # the transcript set itself (same derivation as kg_extract_raw's CTE)
    sql["stream_ordered_release"] = """
        WITH t AS (
          SELECT c.c_custkey, c.c_name, n.n_name, o.o_orderkey,
                 CAST(row_number() OVER (PARTITION BY c.c_custkey
                                         ORDER BY o.o_orderdate, o.o_orderkey) - 1 AS INT) AS turn_idx
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN orders o ON o.o_custkey = c.c_custkey)
        SELECT 'conv-' || CAST(c_custkey AS VARCHAR) AS conv_id, turn_idx,
               'user' AS role,
               c_name || (CASE WHEN o_orderkey % 2 = 0 THEN ' works at ' ELSE ' visited ' END) || n_name AS text
        FROM t"""
    sql["ann_ivf_topk"] = """
        WITH cents AS (
          SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cvec
          FROM embeddings WHERE vec_id < 8),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0),
        assigned AS (
          SELECT vec_id, embedding, cent_id FROM (
            SELECT e.vec_id, e.embedding, c.cent_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
                              c.cent_id) AS rk
            FROM embeddings e CROSS JOIN cents c)
          WHERE rk = 1),
        probe AS (
          SELECT cent_id FROM cents, q
          ORDER BY list_cosine_similarity(cvec, qvec) DESC, cent_id LIMIT 2)
        SELECT a.vec_id,
               CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), q.qvec), 4) AS DOUBLE) AS cos_sim
        FROM assigned a JOIN probe USING (cent_id), q
        ORDER BY cos_sim DESC, a.vec_id LIMIT 10"""
    _ivf_curve_cte = """
        WITH cents AS (
          SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cvec
          FROM embeddings WHERE vec_id < 8),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0),
        assigned AS (
          SELECT vec_id, embedding, cent_id FROM (
            SELECT e.vec_id, e.embedding, c.cent_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
                              c.cent_id) AS rk
            FROM embeddings e CROSS JOIN cents c)
          WHERE rk = 1),
        exact10 AS (
          SELECT vec_id FROM (
            SELECT vec_id,
                   CAST(round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qvec), 4) AS DOUBLE) AS cs
            FROM embeddings, q ORDER BY cs DESC, vec_id LIMIT 10)),"""

    def _ivf_curve_level(np_: int) -> str:
        return f"""
        probe{np_} AS (
          SELECT cent_id FROM cents, q
          ORDER BY list_cosine_similarity(cvec, qvec) DESC, cent_id LIMIT {np_}),
        cand{np_} AS (
          SELECT a.vec_id, a.embedding FROM assigned a JOIN probe{np_} USING (cent_id)),
        top{np_} AS (
          SELECT vec_id FROM (
            SELECT c.vec_id,
                   CAST(round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), q.qvec), 4) AS DOUBLE) AS cs
            FROM cand{np_} c, q ORDER BY cs DESC, c.vec_id LIMIT 10))"""

    sql["ann_recall_curve"] = (
        _ivf_curve_cte
        + ",".join(_ivf_curve_level(n) for n in (1, 2, 4))
        + """
        SELECT * FROM ("""
        + " UNION ALL ".join(
            f"""
        SELECT {n} AS n_probe,
               (SELECT count(*) FROM cand{n}) AS n_candidates,
               (SELECT count(*) FROM top{n} t JOIN exact10 e USING (vec_id))
                 AS n_hit"""
            for n in (1, 2, 4)
        )
        + ")"
    )
    sql["ann_multiprobe_topk"] = """
        WITH cents AS (
          SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cvec
          FROM embeddings WHERE vec_id < 8),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0),
        assigned AS (
          SELECT vec_id, embedding, cent_id FROM (
            SELECT e.vec_id, e.embedding, c.cent_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
                              c.cent_id) AS rk
            FROM embeddings e CROSS JOIN cents c)
          WHERE rk = 1),
        probe AS (
          SELECT cent_id FROM cents, q
          ORDER BY list_cosine_similarity(cvec, qvec) DESC, cent_id LIMIT 3),
        top AS (
          SELECT a.vec_id,
                 CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), q.qvec), 4) AS DOUBLE) AS cos_sim
          FROM assigned a JOIN probe USING (cent_id), q
          ORDER BY cos_sim DESC, a.vec_id LIMIT 10),
        ex AS (
          SELECT vec_id FROM (
            SELECT e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec), 4) AS c
            FROM embeddings e, q ORDER BY c DESC, e.vec_id LIMIT 10)),
        h AS (
          SELECT t.vec_id, t.cos_sim,
                 EXISTS (SELECT 1 FROM ex WHERE ex.vec_id = t.vec_id) AS in_exact_topk
          FROM top t)
        SELECT vec_id, cos_sim, in_exact_topk,
               CAST(sum(CASE WHEN in_exact_topk THEN 1 ELSE 0 END) OVER ()
                    AS DOUBLE) / 10.0 AS recall_at_10,
               (CAST(sum(CASE WHEN in_exact_topk THEN 1 ELSE 0 END) OVER ()
                     AS DOUBLE) / 10.0) >= 0.8 AS recall_ok
        FROM h"""
    # Flagship oracle.  At tau=0.95 on this norm population every verified
    # pair has IDENTICAL distinct-3-gram sets (checked empirically at sf0.001
    # and sf0.01: a one-gram difference over <=19-gram unions caps J at
    # ~0.88) — so canonical groups are exactly the equivalence classes of the
    # gram-set fingerprint, reproducible in SQL without LSH.  If the engine
    # ever emitted a 0.95<=J<1 link here the hashes would visibly diverge —
    # the check fails loudly, never silently passes.  All norms here are
    # >=3 chars (customer/nation names), so no short-string padding needed.
    sql["kg_build_triples"] = f"""
        WITH t0 AS (
          SELECT c.c_custkey, c.c_name, n.n_name, o.o_orderkey,
                 CAST(row_number() OVER (PARTITION BY c.c_custkey
                                         ORDER BY o.o_orderdate, o.o_orderkey) - 1 AS INT) AS turn_idx
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN orders o ON o.o_custkey = c.c_custkey),
        t AS (
          SELECT 'conv-' || CAST(c_custkey AS VARCHAR) AS conv_id, turn_idx,
                 {subj_norm} AS subj_norm,
                 CASE WHEN o_orderkey % 2 = 0 THEN 'works_at' ELSE 'visited' END AS pred,
                 {obj_norm} AS obj_norm
          FROM t0),
        norms AS (
          SELECT DISTINCT subj_norm AS norm FROM t
          UNION SELECT DISTINCT obj_norm FROM t),
        fp AS (
          SELECT norm, string_agg(DISTINCT g, '|' ORDER BY g) AS gramset
          FROM (SELECT norm, substr(norm, i, 3) AS g
                FROM norms, (SELECT unnest(range(1, (SELECT CAST(max(length(norm)) AS BIGINT) + 1 FROM norms))) AS i)
                WHERE i <= length(norm) - 2)
          GROUP BY norm),
        canon AS (SELECT norm, min(norm) OVER (PARTITION BY gramset) AS cname FROM fp)
        SELECT t.conv_id, t.turn_idx,
               cs.cname AS subj_name, t.pred, co.cname AS obj_name
        FROM t
        JOIN canon cs ON cs.norm = t.subj_norm
        JOIN canon co ON co.norm = t.obj_norm"""
    # degree analytics over the SAME canonicalized triple set as the flagship
    # oracle: wrap its full query as a CTE and aggregate
    sql["kg_entity_degrees"] = f"""
        WITH kg AS ({sql['kg_build_triples']}),
        o AS (SELECT subj_name AS name, count(*) AS out_deg,
                     count(DISTINCT pred) AS n_preds
              FROM kg GROUP BY subj_name),
        i AS (SELECT obj_name AS name, count(*) AS in_deg FROM kg GROUP BY obj_name)
        SELECT coalesce(o.name, i.name) AS name,
               coalesce(o.out_deg, 0) AS out_deg,
               coalesce(i.in_deg, 0) AS in_deg,
               coalesce(o.n_preds, 0) AS n_preds
        FROM o FULL JOIN i ON o.name = i.name"""
    # the streaming persist path must converge to the SAME triple set as the
    # batch flagship — one oracle string, two execution paths
    sql["stream_kg_build"] = sql["kg_build_triples"]
    # incremental batch build must converge to the same triple set too
    sql["kg_build_incr"] = sql["kg_build_triples"]
    # watermarked streaming agg == batch GROUP BY over the same derivation
    # (complete mode: every window retained in state across epochs)
    sql["stream_turn_counts"] = """
        WITH t AS (
          SELECT 'conv-' || CAST(c.c_custkey AS VARCHAR) AS conv_id,
                 CAST(row_number() OVER (PARTITION BY c.c_custkey
                                         ORDER BY o.o_orderdate, o.o_orderkey) - 1 AS INT) AS turn_idx,
                 CAST(o.o_orderdate AS TIMESTAMP) AS ts
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN orders o ON o.o_custkey = c.c_custkey)
        SELECT date_trunc('hour', ts) AS window_start, conv_id,
               count(*) AS n_turns, CAST(max(turn_idx) AS INT) AS max_turn_idx
        FROM t GROUP BY 1, 2"""
    # entity-side oracle: same canonicalization CTE as the flagship, plus the
    # kind-hint rule (min non-'entity' kind over a cluster's member norms; in
    # this substrate subj mentions carry 'person', obj mentions 'org')
    _subj_n = NORM_SQL.format(col="c_name")
    _obj_n = NORM_SQL.format(col="n_name")
    sql["kg_entities"] = f"""
        WITH t0 AS (
          SELECT c.c_custkey, c.c_name, n.n_name, o.o_orderkey
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN orders o ON o.o_custkey = c.c_custkey),
        t AS (
          SELECT {_subj_n} AS subj_norm, {_obj_n} AS obj_norm FROM t0),
        norms AS (
          SELECT DISTINCT subj_norm AS norm FROM t
          UNION SELECT DISTINCT obj_norm FROM t),
        fp AS (
          SELECT norm, string_agg(DISTINCT g, '|' ORDER BY g) AS gramset
          FROM (SELECT norm, substr(norm, i, 3) AS g
                FROM norms, (SELECT unnest(range(1, (SELECT CAST(max(length(norm)) AS BIGINT) + 1 FROM norms))) AS i)
                WHERE i <= length(norm) - 2)
          GROUP BY norm),
        canon AS (SELECT norm, min(norm) OVER (PARTITION BY gramset) AS cname FROM fp),
        nk AS (
          SELECT subj_norm AS norm, 'person' AS kind FROM t
          UNION ALL SELECT obj_norm, 'org' FROM t),
        nk1 AS (SELECT norm, min(kind) AS kind_hint FROM nk GROUP BY norm)
        SELECT c.cname AS canonical_name,
               coalesce(min(k.kind_hint), 'entity') AS kind,
               count(DISTINCT c.norm) AS n_aliases,
               string_agg(DISTINCT c.norm, ',' ORDER BY c.norm) AS alias_csv
        FROM canon c LEFT JOIN nk1 k ON k.norm = c.norm
        GROUP BY c.cname"""
    # temporal scoping: the SAME canonicalized triple set re-attached to the
    # transcript timestamps via its (conv_id, turn_idx) provenance
    sql["kg_fact_recency"] = f"""
        WITH kg AS ({sql['kg_build_triples']}),
        tt AS (
          SELECT 'conv-' || CAST(c.c_custkey AS VARCHAR) AS conv_id,
                 CAST(row_number() OVER (PARTITION BY c.c_custkey
                                         ORDER BY o.o_orderdate, o.o_orderkey) - 1 AS INT) AS turn_idx,
                 CAST(o.o_orderdate AS TIMESTAMP) AS ts
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN orders o ON o.o_custkey = c.c_custkey)
        SELECT kg.subj_name, kg.pred, kg.obj_name,
               min(tt.ts) AS first_seen, max(tt.ts) AS last_seen,
               count(*) AS n_mentions,
               CAST(date_diff('day', CAST(min(tt.ts) AS DATE),
                              CAST(max(tt.ts) AS DATE)) AS BIGINT) AS span_days
        FROM kg JOIN tt USING (conv_id, turn_idx)
        GROUP BY kg.subj_name, kg.pred, kg.obj_name"""
    # Varied-substrate KG (graft.kg_transcripts_varied): the same gram-set
    # canonicalization CTE as the flagship oracle (identical surface
    # vocabulary, so the tau=0.95 LSH == exact-gramset argument carries
    # over verbatim), over the richer turn derivation with non-functional
    # 'visited' and partially-symmetric 'met'.
    _vnorm_s = NORM_SQL.format(col="subj_surface")
    _vnorm_o = NORM_SQL.format(col="obj_surface")
    kg_varied = f"""
        WITH dims AS (SELECT count(*) AS ncust FROM customer),
        b AS (SELECT c.c_custkey, c.c_name, c.c_nationkey,
                     o.o_orderkey, o.o_orderdate, n.n_name
              FROM customer c
              JOIN orders o ON o.o_custkey = c.c_custkey
              JOIN nation n ON n.n_nationkey = c.c_nationkey),
        raw AS (
          SELECT b.c_custkey, b.o_orderdate, b.o_orderkey, 0 AS rev,
                 b.c_name AS subj_surface,
                 CASE WHEN b.o_orderkey % 2 = 0 THEN 'works_at'
                      ELSE 'visited' END AS pred,
                 CASE WHEN b.o_orderkey % 2 = 0 THEN b.n_name
                      ELSE nv.n_name END AS obj_surface
          FROM b JOIN nation nv
            ON nv.n_nationkey = (b.c_nationkey + (b.o_orderkey % 3) * 7) % 25
          UNION ALL
          SELECT b.c_custkey, b.o_orderdate, b.o_orderkey, 1,
                 b.c_name, 'met', cb.c_name
          FROM b CROSS JOIN dims
          JOIN customer cb
            ON cb.c_custkey = (b.c_custkey + b.o_orderkey) % dims.ncust
          WHERE b.o_orderkey % 5 = 0 AND cb.c_custkey <> b.c_custkey
          UNION ALL
          SELECT b.c_custkey, b.o_orderdate, b.o_orderkey, 2,
                 cb.c_name, 'met', b.c_name
          FROM b CROSS JOIN dims
          JOIN customer cb
            ON cb.c_custkey = (b.c_custkey + b.o_orderkey) % dims.ncust
          WHERE b.o_orderkey % 10 = 0 AND cb.c_custkey <> b.c_custkey),
        t AS (
          SELECT 'conv-' || CAST(c_custkey AS VARCHAR) AS conv_id,
                 CAST(row_number() OVER (PARTITION BY c_custkey
                        ORDER BY o_orderdate, o_orderkey, rev) - 1 AS INT)
                   AS turn_idx,
                 CAST(o_orderdate AS TIMESTAMP) AS ts,
                 {_vnorm_s} AS subj_norm, pred, {_vnorm_o} AS obj_norm
          FROM raw),
        norms AS (
          SELECT DISTINCT subj_norm AS norm FROM t
          UNION SELECT DISTINCT obj_norm FROM t),
        fp AS (
          SELECT norm, string_agg(DISTINCT g, '|' ORDER BY g) AS gramset
          FROM (SELECT norm, substr(norm, i, 3) AS g
                FROM norms, (SELECT unnest(range(1, (SELECT CAST(max(length(norm)) AS BIGINT) + 1 FROM norms))) AS i)
                WHERE i <= length(norm) - 2)
          GROUP BY norm),
        canon AS (SELECT norm, min(norm) OVER (PARTITION BY gramset) AS cname
                  FROM fp)
        SELECT t.conv_id, t.turn_idx, t.ts,
               cs.cname AS subj_name, t.pred, co.cname AS obj_name
        FROM t
        JOIN canon cs ON cs.norm = t.subj_norm
        JOIN canon co ON co.norm = t.obj_norm"""
    sql["kg_degree_hist"] = f"""
        WITH kg AS ({sql['kg_build_triples']}),
        d AS (SELECT DISTINCT subj_name, pred, obj_name FROM kg),
        ends AS (SELECT subj_name AS name FROM d
                 UNION ALL SELECT obj_name FROM d),
        deg AS (SELECT name, count(*) AS deg FROM ends GROUP BY name),
        g AS (SELECT CAST(length(bin(CAST(deg AS INT))) AS INT) AS bucket,
                     count(*) AS n_entities, CAST(sum(deg) AS BIGINT) AS total_deg
              FROM deg GROUP BY 1)
        SELECT bucket, n_entities, total_deg,
               floor((n_entities * 1.0 / sum(n_entities) OVER ()) * 1000000.0 + 0.5) / 1000000.0 AS share
        FROM g"""
    sql["w15_interarrival"] = """
        WITH g AS (
          SELECT event_type,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   AS gap_us
          FROM events)
        SELECT event_type, count(*) AS n_gaps,
               round(quantile_cont(gap_us, 0.5), 6) AS p50_us,
               round(quantile_cont(gap_us, 0.9), 6) AS p90_us
        FROM g WHERE gap_us IS NOT NULL GROUP BY event_type"""
    # alias-substrate canonicalization: the same gram-fingerprint CTE over
    # the padded/plain surface pairs — the merge path, value-checked
    _anorm_s = NORM_SQL.format(col="subj_surface")
    _anorm_o = NORM_SQL.format(col="obj_surface")
    sql["kg_alias_merge"] = f"""
        WITH raw AS (
          SELECT CASE WHEN o.o_orderkey % 2 = 1
                      THEN replace(c.c_name, '#', '#0')
                      ELSE c.c_name END AS subj_surface,
                 n.n_name AS obj_surface
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN orders o ON o.o_custkey = c.c_custkey),
        norms AS (
          SELECT DISTINCT {_anorm_s} AS norm FROM raw
          UNION SELECT DISTINCT {_anorm_o} FROM raw),
        fp AS (
          SELECT norm, string_agg(DISTINCT g, '|' ORDER BY g) AS gramset
          FROM (SELECT norm, substr(norm, i, 3) AS g
                FROM norms, (SELECT unnest(range(1, (SELECT CAST(max(length(norm)) AS BIGINT) + 1 FROM norms))) AS i)
                WHERE i <= length(norm) - 2)
          GROUP BY norm),
        canon AS (SELECT norm, min(norm) OVER (PARTITION BY gramset) AS cname
                  FROM fp)
        SELECT cname AS canonical_name, count(*) AS n_aliases,
               string_agg(norm, ',' ORDER BY norm) AS alias_csv
        FROM canon GROUP BY cname HAVING count(*) >= 2"""
    sql["kg_sym_preds"] = f"""
        WITH kg AS ({kg_varied}),
        d AS (SELECT DISTINCT subj_name, pred, obj_name FROM kg),
        a AS (SELECT pred, count(*) AS n_triples FROM d GROUP BY pred),
        s AS (SELECT d.pred, count(*) AS n_sym FROM d
              WHERE EXISTS (SELECT 1 FROM d d2
                            WHERE d2.subj_name = d.obj_name
                              AND d2.pred = d.pred
                              AND d2.obj_name = d.subj_name)
              GROUP BY d.pred)
        SELECT a.pred, a.n_triples, coalesce(s.n_sym, 0) AS n_sym,
               floor((CAST(coalesce(s.n_sym, 0) AS DOUBLE) / a.n_triples) * 1000000.0 + 0.5) / 1000000.0
                 AS sym_ratio
        FROM a LEFT JOIN s ON s.pred = a.pred"""
    sql["kg_current_facts"] = f"""
        WITH kg AS ({kg_varied}),
        facts AS (SELECT subj_name, pred, obj_name, max(ts) AS last_seen
                  FROM kg GROUP BY subj_name, pred, obj_name),
        r AS (SELECT subj_name, pred, obj_name, last_seen,
                     row_number() OVER (PARTITION BY subj_name, pred
                       ORDER BY last_seen DESC, obj_name DESC) AS rn,
                     count(*) OVER (PARTITION BY subj_name, pred)
                       AS n_alternatives
              FROM facts)
        SELECT subj_name, pred, obj_name AS obj_current, last_seen,
               n_alternatives
        FROM r WHERE rn = 1"""
    # implicit-schema induction: the SAME canonicalized triple set and the
    # SAME kind-rule entity table, joined and aggregated by triple pattern
    sql["kg_schema_induce"] = f"""
        WITH kg AS ({sql['kg_build_triples']}),
        ents AS ({sql['kg_entities']}),
        d AS (SELECT DISTINCT subj_name, pred, obj_name FROM kg)
        SELECT es.kind AS subj_kind, d.pred, eo.kind AS obj_kind,
               count(*) AS n_triples,
               count(DISTINCT d.subj_name) AS n_subj,
               count(DISTINCT d.obj_name) AS n_obj
        FROM d
        JOIN ents es ON es.canonical_name = d.subj_name
        JOIN ents eo ON eo.canonical_name = d.obj_name
        GROUP BY 1, 2, 3"""
    # kg_path2's oracle is the NAIVE path self-join (the definition); the
    # engine runs the degree-product rewrite — counts must agree exactly
    _nation_norm = NORM_SQL.format(col="n_name")
    _region_norm = NORM_SQL.format(col="r_name")
    sql["kg_path2"] = f"""
        WITH kg AS ({sql['kg_build_triples']}),
        t1 AS (SELECT DISTINCT subj_name, pred, obj_name FROM kg),
        t2 AS (SELECT DISTINCT {_nation_norm} AS subj_name,
                      'located_in' AS pred, {_region_norm} AS obj_name
               FROM nation JOIN region ON n_regionkey = r_regionkey),
        d AS (SELECT * FROM t1 UNION SELECT * FROM t2)
        SELECT a.pred AS pred1, b.pred AS pred2, count(*) AS n_paths
        FROM d a JOIN d b ON a.obj_name = b.subj_name
        GROUP BY a.pred, b.pred"""
    sql["kg_triple_support"] = f"""
        WITH kg AS ({sql['kg_build_triples']})
        SELECT subj_name, pred, obj_name, count(*) AS n_mentions,
               count(DISTINCT conv_id) AS n_convs,
               CAST(min(turn_idx) AS INT) AS first_turn
        FROM kg GROUP BY subj_name, pred, obj_name"""
    sql["kg_pred_cardinality"] = f"""
        WITH kg AS ({sql['kg_build_triples']}),
        d AS (SELECT DISTINCT pred, subj_name, obj_name FROM kg),
        base AS (SELECT pred, count(*) AS n_pairs,
                        count(DISTINCT subj_name) AS n_subj,
                        count(DISTINCT obj_name) AS n_obj
                 FROM d GROUP BY pred),
        mo AS (SELECT pred, max(o) AS max_obj_per_subj
               FROM (SELECT pred, subj_name, count(*) AS o
                     FROM d GROUP BY pred, subj_name) GROUP BY pred),
        ms AS (SELECT pred, max(s) AS max_subj_per_obj
               FROM (SELECT pred, obj_name, count(*) AS s
                     FROM d GROUP BY pred, obj_name) GROUP BY pred)
        SELECT base.pred, n_pairs, n_subj, n_obj,
               max_obj_per_subj, max_subj_per_obj,
               max_obj_per_subj = 1 AS functional
        FROM base JOIN mo ON base.pred = mo.pred
                  JOIN ms ON base.pred = ms.pred"""
    sql["kg_entity_cooccur"] = f"""
        WITH kg AS ({sql['kg_build_triples']}),
        m AS (SELECT DISTINCT conv_id, subj_name AS name FROM kg
              UNION SELECT DISTINCT conv_id, obj_name FROM kg)
        SELECT a.name AS name_a, b.name AS name_b, count(*) AS n_convs
        FROM m a JOIN m b ON a.conv_id = b.conv_id AND a.name < b.name
        GROUP BY a.name, b.name"""
    sql["kg_conflicts"] = f"""
        WITH kg AS ({sql['kg_build_triples']}),
        d AS (SELECT DISTINCT subj_name, pred, obj_name FROM kg)
        SELECT subj_name, pred, count(*) AS n_objs,
               string_agg(obj_name, ',' ORDER BY obj_name) AS obj_csv
        FROM d GROUP BY subj_name, pred HAVING count(*) >= 2"""
    sql["w8_transition_matrix"] = """
        WITH t AS (
          SELECT lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS from_type,
                 event_type AS to_type
          FROM events),
        c AS (SELECT from_type, to_type, count(*) AS n FROM t
              WHERE from_type IS NOT NULL GROUP BY from_type, to_type)
        SELECT from_type, to_type, n,
               floor((n * 1.0 / sum(n) OVER (PARTITION BY from_type)) * 10000.0 + 0.5) / 10000.0 AS p
        FROM c"""
    sql["text_readability"] = """
        WITH t AS (
          SELECT doc_id,
                 greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1) AS n_words,
                 greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
                 len(regexp_extract_all(lower(text), '[aeiou]+')) AS n_syllables
          FROM documents)
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               -- floor-quantize (not round): see operators/text.py
               -- readability — the 85.165 half-boundary knife edge
               floor((206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                              - 84.6 * (n_syllables * 1.0 / n_words))
                     * 100.0 + 0.5) / 100.0 AS flesch
        FROM t"""
    sql["w7_retention_cohorts"] = """
        WITH f AS (SELECT user_id,
                          CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
                   FROM events GROUP BY user_id),
        a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
              FROM events)
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT) AS week_offset,
               count(DISTINCT a.user_id) AS n_users
        FROM a JOIN f ON a.user_id = f.user_id
        GROUP BY f.cohort_week, week_offset"""
    sql["w6_event_runs"] = """
        WITH runs AS (
          SELECT user_id, event_type, count(*) AS run_len
          FROM (SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC)
                     - row_number() OVER (PARTITION BY user_id, event_type
                         ORDER BY ts ASC, event_id ASC) AS grp
                FROM events)
          GROUP BY user_id, event_type, grp)
        SELECT user_id, event_type, max(run_len) AS max_run,
               count(*) AS n_runs
        FROM runs GROUP BY user_id, event_type"""
    sql["t4_resample_gapfill"] = """
        WITH h AS (
          SELECT user_id, date_trunc('hour', ts) AS bucket_ts, count(*) AS n,
                 max(CASE WHEN rd = 1 THEN value END) AS v_close
          FROM (SELECT user_id, ts, event_id, value,
                       row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                         ORDER BY ts DESC, event_id DESC) AS rd
                FROM events)
          GROUP BY user_id, date_trunc('hour', ts)),
        spine AS (
          SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
          FROM (SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
                FROM h GROUP BY user_id))
        SELECT s.user_id, s.bucket_ts,
               coalesce(h.n, 0) AS n,
               round(last_value(h.v_close IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.bucket_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_fill
        FROM spine s LEFT JOIN h ON h.user_id = s.user_id AND h.bucket_ts = s.bucket_ts"""
    from plume_spark.schemas import EDGE_CONSTRAINTS

    rules_values = ", ".join(
        f"('{p}', '{s}', '{o}')"
        for p, (ss, oo) in EDGE_CONSTRAINTS.items()
        for s in ss
        for o in oo
    )
    sql["j8b_kind_constraints"] = f"""
        WITH t AS (
          SELECT o.o_orderkey,
                 CAST(row_number() OVER (PARTITION BY c.c_custkey
                                         ORDER BY o.o_orderdate, o.o_orderkey) - 1 AS INT) AS turn_idx
          FROM customer c
          JOIN orders o ON o.o_custkey = c.c_custkey),
        typed AS (
          SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'works_at' ELSE 'visited' END AS pred,
                 'person' AS subj_kind,
                 CASE WHEN turn_idx % 7 = 0 THEN 'tool' ELSE 'org' END AS obj_kind
          FROM t),
        rules(pred, r_subj, r_obj) AS (VALUES {rules_values})
        SELECT pred, count(*) AS n_violations
        FROM typed ty
        WHERE NOT EXISTS (
          SELECT 1 FROM rules r
          WHERE r.pred = ty.pred
            AND (r.r_subj = '*' OR r.r_subj = ty.subj_kind)
            AND (r.r_obj = '*' OR r.r_obj = ty.obj_kind))
        GROUP BY pred"""
    sql["j7_parent_walk"] = """
        SELECT DISTINCT 2000000 + l_partkey AS node FROM lineitem WHERE l_partkey < 3
        UNION
        SELECT DISTINCT 1000000 + l_orderkey FROM lineitem WHERE l_partkey < 3
        UNION
        SELECT DISTINCT o_custkey
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_partkey < 3"""
    sql["a1_order_sum"] = (
        "SELECT CAST(sum(l_linenumber) AS BIGINT) AS order_sum FROM lineitem"
    )
    sql["a2_order_count"] = "SELECT count(*) AS n FROM lineitem WHERE l_linenumber > 2"
    sql["a4_map_merge"] = """
        WITH firsts AS (
          SELECT user_id, event_type, props FROM (
            SELECT user_id, event_type, coalesce(props, '') AS props,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY event_id) AS rk
            FROM events)
          WHERE rk = 1)
        SELECT user_id,
               string_agg(event_type || '=' || props, ';' ORDER BY event_type) AS props_csv
        FROM firsts GROUP BY user_id"""
    # mm_feature_extract IS oracle-checkable on this fixture: the payload is
    # the utf-8 encoding of `text` (graft.documents_media), and sf0.01 text is
    # pure ASCII (verified: octet_length(encode(text)) == length(text) for all
    # rows), so byte values == character codes.  The real binary-decode path
    # stays non-SQL (multimodal.decode_*); only the deterministic fixture is.
    sql["mm_feature_extract"] = """
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
               END AS modality,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(coalesce(list_aggregate(
                      list_transform(string_split_regex(text, ''), c -> ascii(c)),
                      'sum'), 0) % 4611686018427387904 AS BIGINT) AS checksum
        FROM documents"""
    # Spark: sequence(0, greatest(duration_ms-1, 0), 1000) — inclusive end;
    # DuckDB range is exclusive-end, so range(0, max(duration, 1), 1000) is
    # the exact equivalent (duration 0 still emits frame 0 on both engines).
    sql["mm_frame_sample"] = """
        SELECT doc_id AS media_id,
               CAST(unnest(range(0, CASE WHEN n_chars * 10 > 1 THEN n_chars * 10 ELSE 1 END, 1000)) AS BIGINT) AS frame_ts_ms
        FROM documents WHERE doc_id % 3 = 2"""
    # unrolled-CTE PageRank generated by the operator module itself, so the
    # iteration count / damping can never drift between the two engines
    from plume_spark.operators.pagerank import pagerank_oracle_sql

    sql["g1_pagerank"] = pagerank_oracle_sql(
        """SELECT o_custkey AS subj, 1000000 + o_orderkey AS obj FROM orders
           UNION ALL
           SELECT 1000000 + l_orderkey, 2000000 + l_partkey FROM lineitem"""
    )
    from plume_spark.operators.pagerank import ppr_oracle_sql

    sql["g14_ppr"] = ppr_oracle_sql(
        """SELECT o_custkey AS subj, 1000000 + o_orderkey AS obj FROM orders
           UNION ALL
           SELECT 1000000 + l_orderkey, 2000000 + l_partkey FROM lineitem""",
        "SELECT o_custkey AS node FROM orders WHERE o_custkey % 500 = 1",
        n_iters=3,
    )
    from plume_spark.operators.pagerank import hits_oracle_sql

    sql["g12_hits"] = hits_oracle_sql(
        """SELECT o_custkey AS subj, 1000000 + o_orderkey AS obj FROM orders
           UNION ALL
           SELECT 1000000 + l_orderkey, 2000000 + l_partkey FROM lineitem""",
        n_iters=2,
    )
    sql["corpus_repetition"] = """
        WITH t AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                i -> toks[i] || ' ' || toks[i + 1]) AS grams
          FROM t)
        SELECT doc_id, len(grams) AS n_ngrams,
               CASE WHEN len(grams) > 0
                    THEN floor(((len(grams) - len(list_distinct(grams))) / CAST(len(grams) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
                    ELSE 0.0 END AS rep_frac
        FROM g"""
    sql["corpus_unigram_logprob"] = """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        freq AS (SELECT tok, count(*) AS n_tok FROM tk GROUP BY tok),
        tot AS (SELECT sum(n_tok) AS n_total FROM freq)
        SELECT doc_id, count(*) AS n_tokens,
               round(avg(ln(n_tok / CAST(n_total AS DOUBLE))), 6) AS avg_logprob
        FROM tk JOIN freq USING (tok) CROSS JOIN tot
        GROUP BY doc_id"""
    sql["corpus_ccnet_cut"] = f"""
        WITH lp AS ({sql['corpus_unigram_logprob']}),
        thr AS (SELECT quantile_cont(avg_logprob, 0.25) AS p25,
                       quantile_cont(avg_logprob, 0.75) AS p75 FROM lp),
        b AS (SELECT lp.n_tokens, lp.avg_logprob,
                     CASE WHEN avg_logprob <= p25 THEN 'tail'
                          WHEN avg_logprob > p75 THEN 'head'
                          ELSE 'middle' END AS bucket
              FROM lp, thr)
        SELECT bucket, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
               floor((CAST(sum(CAST(avg_logprob AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS mean_logprob
        FROM b GROUP BY bucket"""
    sql["corpus_quality_tiers"] = f"""
        WITH lp AS ({sql['corpus_unigram_logprob']})
        SELECT CASE WHEN avg_logprob > -3.401 THEN 'head'
                    WHEN avg_logprob > -3.404 THEN 'middle'
                    ELSE 'tail' END AS tier,
               count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total
        FROM lp GROUP BY 1"""
    sql["f5_json_payload"] = """
        WITH j AS (SELECT event_id,
                          to_json(struct_pack(t := event_type, v := value)) AS doc
                   FROM events)
        SELECT event_id,
               json_extract_string(doc, '$.t') AS t,
               CAST(json_extract(doc, '$.v') AS DOUBLE) AS v
        FROM j"""
    sql["f11_levenshtein"] = """
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 2"""
    sql["emb_centroids"] = """
        WITH d AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        x AS (SELECT label, CAST(i - 1 AS INT) AS dim, e[i] AS v
              FROM d, (SELECT unnest(range(1, (SELECT max(len(CAST(embedding AS DOUBLE[]))) + 1 FROM embeddings))) AS i)
              WHERE i <= len(e))
        SELECT label, dim,
               round(CAST(sum(CAST(v AS DECIMAL(27,12))) / count(*) AS DOUBLE), 6)
                 AS centroid,
               count(*) AS n_vecs
        FROM x GROUP BY label, dim"""
    sql["emb_outliers"] = """
        WITH d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        x AS (SELECT vec_id, label, CAST(i - 1 AS INT) AS dim, e[i] AS v
              FROM d, (SELECT unnest(range(1, (SELECT max(len(CAST(embedding AS DOUBLE[]))) + 1 FROM embeddings))) AS i)
              WHERE i <= len(e)),
        cent AS (SELECT label, dim,
                        round(CAST(sum(CAST(v AS DECIMAL(27,12))) / count(*)
                                   AS DOUBLE), 6) AS c
                 FROM x GROUP BY label, dim),
        sq AS (SELECT x.vec_id, x.label,
                      CAST((x.v - cent.c) * (x.v - cent.c) AS DECIMAL(38,18)) AS sq
               FROM x JOIN cent ON cent.label = x.label AND cent.dim = x.dim),
        d2 AS (SELECT vec_id, label, CAST(sum(sq) AS DOUBLE) AS d2x
               FROM sq GROUP BY vec_id, label),
        r AS (SELECT label, vec_id, d2x,
                     row_number() OVER (PARTITION BY label
                                        ORDER BY d2x DESC, vec_id ASC) AS rank
              FROM d2)
        SELECT label, vec_id, CAST(floor((d2x) * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE) AS dist2, rank
        FROM r WHERE rank <= 10"""
    sql["w4_sliding_rate"] = """
        SELECT event_id, user_id,
               count(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
        FROM events"""
    sql["a9_pivot"] = """
        SELECT user_id,
               count(*) FILTER (event_type = 'click') AS n_click,
               count(*) FILTER (event_type = 'view') AS n_view,
               count(*) FILTER (event_type = 'purchase') AS n_purchase,
               count(*) FILTER (event_type = 'signup') AS n_signup,
               count(*) FILTER (event_type = 'error') AS n_error
        FROM events GROUP BY user_id"""
    sql["u3_except_intersect"] = """
        WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
             e AS (SELECT user_id FROM events WHERE event_type = 'error')
        SELECT DISTINCT user_id, 'purchase_only' AS kind FROM p
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.user_id = p.user_id)
        UNION ALL
        SELECT DISTINCT user_id, 'both' AS kind FROM p
        WHERE EXISTS (SELECT 1 FROM e WHERE e.user_id = p.user_id)"""
    sql["a7_percentiles"] = """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type"""
    # a10/a11: the sketch estimates are engine-specific, so the oracle pins
    # the EXACT columns and the literal truth of the error-contract boolean
    # (the Spark side computes the bound for real; see the query docstrings)
    # w13's oracle is the NAIVE day-range join (the definition); the engine
    # runs the explode rewrite over the distinct pair set instead
    sql["w13_rolling_active"] = """
        WITH pairs AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                       FROM events),
        days AS (SELECT DISTINCT day FROM pairs)
        SELECT d.day, count(DISTINCT p.user_id) AS active_7d
        FROM days d JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day"""
    sql["a12_cube"] = """
        SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY CUBE(event_type, CAST(date_part('dow', ts) AS INT))"""
    sql["w14_rfm"] = """
        WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_day
                     FROM orders),
        per AS (
          SELECT o_custkey AS custkey,
                 max(CAST(o_orderdate AS DATE)) AS last_day,
                 count(*) AS frequency,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS monetary
          FROM orders GROUP BY o_custkey)
        SELECT custkey,
               CAST(date_diff('day', last_day, ref.ref_day) AS BIGINT)
                 AS recency_days,
               frequency, monetary,
               CAST(CASE WHEN date_diff('day', last_day, ref.ref_day) <= 365
                         THEN 3
                         WHEN date_diff('day', last_day, ref.ref_day) <= 730
                         THEN 2 ELSE 1 END AS INT) AS r_score,
               CAST(CASE WHEN frequency >= 15 THEN 3
                         WHEN frequency >= 8 THEN 2 ELSE 1 END AS INT)
                 AS f_score,
               CAST(CASE WHEN monetary >= 2000000.0 THEN 3
                         WHEN monetary >= 1000000.0 THEN 2 ELSE 1 END AS INT)
                 AS m_score
        FROM per, ref"""
    sql["a10_approx_distinct"] = """
        SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS hll_ok
        FROM events GROUP BY event_type"""
    sql["a11_approx_quantile"] = """
        SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50_exact,
               TRUE AS gk_ok
        FROM events GROUP BY event_type"""
    sql["a8_rollup"] = """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY ROLLUP(event_type)"""
    sql["w3_sessionize"] = """
        SELECT event_id, user_id,
               CAST(sum(new_sess) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS session_idx
        FROM (
          SELECT event_id, user_id, ts,
                 CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_sess
          FROM (
            SELECT event_id, user_id, ts,
                   epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id
                     ORDER BY ts ASC, event_id ASC) AS gap
            FROM events))"""
    # t5's oracle is the NAIVE quadratic interval theta-join (the definition);
    # the engine runs the grid-blocked form — pairs must agree exactly
    sql["t5_interval_overlap"] = f"""
        WITH sx AS ({sql['w3_sessionize']}),
        s AS (SELECT sx.user_id, sx.session_idx,
                     min(e.ts) AS s_start, max(e.ts) AS s_end
              FROM sx JOIN events e ON sx.event_id = e.event_id
              GROUP BY sx.user_id, sx.session_idx)
        SELECT a.user_id AS user_id_a, a.session_idx AS session_idx_a,
               b.user_id AS user_id_b, b.session_idx AS session_idx_b,
               epoch_us(least(a.s_end, b.s_end))
                 - epoch_us(greatest(a.s_start, b.s_start)) AS overlap_us
        FROM s a JOIN s b
          ON (a.user_id, a.session_idx) < (b.user_id, b.session_idx)
         AND a.s_start <= b.s_end AND b.s_start <= a.s_end"""
    from plume_spark.operators.temporal import peak_concurrency_oracle_sql

    # same gap-sessionized spans as t5; the sweep SQL is generated next to
    # the operator so the day clip and tie rule stay in lockstep
    sql["w12_time_to_convert"] = """
        WITH fv AS (SELECT user_id, min(ts) AS first_view FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        fp AS (SELECT p.user_id, fv.first_view, min(p.ts) AS first_purchase
               FROM events p JOIN fv ON fv.user_id = p.user_id
               WHERE p.event_type = 'purchase' AND p.ts >= fv.first_view
               GROUP BY p.user_id, fv.first_view)
        SELECT user_id, first_view, first_purchase,
               epoch_us(first_purchase) - epoch_us(first_view) AS convert_us
        FROM fp"""
    sql["w11_week_over_week"] = """
        WITH a AS (
          SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
                 count(*) AS n
          FROM events GROUP BY event_type, date_trunc('week', ts))
        SELECT event_type, week, n,
               lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n,
               floor(((n - lag(n) OVER (PARTITION BY event_type ORDER BY week))
                          / CAST(lag(n) OVER (PARTITION BY event_type ORDER BY week)
                                 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS wow_change
        FROM a"""
    sql["w9_peak_concurrency"] = peak_concurrency_oracle_sql(
        f"""WITH sx AS ({sql['w3_sessionize']}),
            s AS (SELECT sx.user_id, sx.session_idx,
                         min(e.ts) AS s_start, max(e.ts) AS s_end
                  FROM sx JOIN events e ON sx.event_id = e.event_id
                  GROUP BY sx.user_id, sx.session_idx)
            SELECT s_start, s_end FROM s"""
    )
    sql["text_word_entropy"] = """
        WITH toks AS (
          SELECT doc_id, t AS tok
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents)
          WHERE t <> ''),
        cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct_tokens,
               CAST(round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS DOUBLE)
                 AS entropy
        FROM cnt GROUP BY doc_id"""
    sql["corpus_length_hist"] = """
        WITH a AS (
          SELECT source AS grp, coalesce(n_chars, 0) AS len,
                 CASE WHEN coalesce(n_chars, 0) > 0
                      THEN CAST(length(bin(coalesce(n_chars, 0))) AS INT)
                      ELSE 0 END AS bucket
          FROM documents),
        g AS (SELECT grp, bucket, count(*) AS n_docs, sum(len) AS total_chars
              FROM a GROUP BY grp, bucket)
        SELECT grp, bucket, n_docs, CAST(total_chars AS BIGINT) AS total_chars,
               CAST(floor((n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY grp)) * 1000000.0 + 0.5) / 1000000.0
                    AS DOUBLE) AS share
        FROM g"""
    from plume_spark.operators.graph_metrics import triangle_oracle_sql

    sql["g3_triangles"] = triangle_oracle_sql(
        "SELECT l_orderkey AS grp, l_partkey AS item FROM lineitem"
    )
    from plume_spark.operators.graph_metrics import clustering_oracle_sql

    sql["g10_clustering_coeff"] = clustering_oracle_sql(
        "SELECT l_orderkey AS grp, l_partkey AS item FROM lineitem"
    )
    from plume_spark.operators.graph_metrics import cooccur_oracle_sql

    sql["g4_cooccur"] = cooccur_oracle_sql(
        "SELECT l_orderkey AS grp, l_partkey AS item FROM lineitem"
    )
    from plume_spark.operators.graph_metrics import label_prop_oracle_sql

    sql["g6_label_prop"] = label_prop_oracle_sql(
        """SELECT o_custkey AS a, 1000000 + o_orderkey AS b FROM orders
           UNION ALL
           SELECT 1000000 + l_orderkey, 2000000 + l_partkey FROM lineitem""",
        n_iters=2,
    )
    from plume_spark.operators.graph_metrics import (
        common_neighbors_oracle_sql,
        kcore_oracle_sql,
    )

    # same co-purchase pair derivation as g3/g4, then the unrolled peel /
    # wedge SQL generated next to the operators (caps + rules in lockstep)
    _copurchase = cooccur_oracle_sql(
        "SELECT l_orderkey AS grp, l_partkey AS item FROM lineitem"
    )
    sql["g7_kcore"] = kcore_oracle_sql(
        f"SELECT a, b FROM ({_copurchase})", k=3, n_iters=8
    )
    sql["g8_common_neighbors"] = common_neighbors_oracle_sql(
        f"SELECT a, b FROM ({_copurchase}) WHERE n_groups >= 2", max_degree=64
    )
    from plume_spark.operators.graph_metrics import resource_allocation_oracle_sql

    sql["g13_linkpred_ra"] = resource_allocation_oracle_sql(
        f"SELECT a, b FROM ({_copurchase}) WHERE n_groups >= 2", max_degree=64
    )
    from plume_spark.operators.graph_metrics import edge_lift_oracle_sql

    sql["g11_edge_lift"] = edge_lift_oracle_sql(
        "SELECT l_orderkey AS grp, l_partkey AS item FROM lineitem", min_groups=2
    )
    sql["w10_zscore_outliers"] = """
        WITH a AS (
          SELECT user_id, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_d,
                 CAST(sum(CAST(value AS DECIMAL(18,6))
                          * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sumsq_d
          FROM events GROUP BY user_id HAVING count(*) >= 2),
        s AS (
          SELECT user_id, sum_d / n AS mean,
                 sqrt(greatest(sumsq_d / n - (sum_d / n) * (sum_d / n), 0.0)) AS std
          FROM a)
        SELECT e.event_id, e.user_id, e.value,
               CAST(round((e.value - s.mean) / s.std, 4) AS DOUBLE) AS z
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE s.std > 0 AND abs((e.value - s.mean) / s.std) >= 3.0"""
    from plume_spark.operators.graph_metrics import assortativity_oracle_sql

    sql["g9_assortativity"] = assortativity_oracle_sql(
        f"SELECT a, b FROM ({_copurchase}) WHERE n_groups >= 2"
    )
    from plume_spark.operators.components import components_oracle_sql

    sql["g2_components"] = components_oracle_sql(
        """SELECT o_custkey AS subj, 1000000 + o_orderkey AS obj FROM orders
           UNION ALL
           SELECT 1000000 + l_orderkey, 2000000 + l_partkey FROM lineitem
           WHERE (2000000 + l_partkey) % 23 = 0""",
        n_iters=32,
    )
    sql["diag_hot_keys"] = """
        SELECT CAST(user_id AS VARCHAR) AS key_value,
               COUNT(*) AS cnt,
               CAST(ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM events), 6) AS DOUBLE) AS share
        FROM events GROUP BY user_id HAVING COUNT(*) >= 2
        ORDER BY cnt DESC, key_value LIMIT 20"""
    # ties at one right timestamp are collapsed to MAX(event_id) on BOTH
    # engines — as-of over tied timestamps is otherwise nondeterministic
    sql["t1_asof_join"] = """
        WITH r AS (SELECT user_id, ts, MAX(event_id) AS mv FROM events
                   WHERE event_type = 'view' GROUP BY user_id, ts),
             l AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase')
        SELECT l.event_id, l.user_id, r.mv AS matched_view
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts"""
    sql["t7_asof_tolerance"] = """
        WITH r AS (SELECT user_id, ts, MAX(event_id) AS mv FROM events
                   WHERE event_type = 'view' GROUP BY user_id, ts),
             l AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             m AS (SELECT l.event_id, l.user_id, r.mv, r.ts AS rts, l.ts AS lts
                   FROM l ASOF LEFT JOIN r
                     ON l.user_id = r.user_id AND l.ts >= r.ts)
        SELECT event_id, user_id,
               CASE WHEN rts IS NOT NULL
                     AND epoch_us(lts) - epoch_us(rts) <= 600 * 1000000
                    THEN mv END AS matched_view,
               CASE WHEN rts IS NOT NULL
                     AND epoch_us(lts) - epoch_us(rts) <= 600 * 1000000
                    THEN epoch_us(lts) - epoch_us(rts) END AS age_us
        FROM m"""
    sql["t2_range_join"] = """
        SELECT l.event_id, l.user_id,
               (SELECT COUNT(*) FROM events r
                WHERE r.event_type = 'click' AND r.user_id = l.user_id
                  AND r.ts >= l.ts - INTERVAL 3600 SECOND AND r.ts <= l.ts) AS n_in_range
        FROM events l WHERE l.event_type = 'purchase'"""
    # near-dup clusters: the minhash-pair oracle body feeds the unrolled
    # min-label-propagation oracle — composition of the two generators
    pair_edges = (
        _SHINGLE_CTE.replace("WITH ", "", 1)
        + _minhash_oracle_body("tok", "tok")
    )
    sql["dedup_minhash_groups"] = components_oracle_sql(
        f"SELECT doc_a AS subj, doc_b AS obj FROM (WITH {pair_edges}) pe",
        n_iters=10,
        node_col="doc_id",
        comp_col="keeper_id",
    )
    # cluster-size profile over the SAME component assignment
    sql["corpus_dup_cluster_stats"] = f"""
        WITH g AS ({sql['dedup_minhash_groups']}),
        sz AS (SELECT keeper_id, count(*) AS cluster_size FROM g
               GROUP BY keeper_id)
        SELECT cluster_size, count(*) AS n_clusters,
               CAST(count(*) * cluster_size AS BIGINT) AS n_docs
        FROM sz GROUP BY cluster_size"""
    sql["emb_pq_codes"] = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        cents AS (SELECT vec_id AS cent_id, v AS cvec FROM e WHERE vec_id < 8),
        sub AS (
          SELECT e.vec_id, js.j, cents.cent_id,
                 list_aggregate(list_transform(range(1, 17),
                   i -> (e.v[js.j * 16 + i] - cents.cvec[js.j * 16 + i])
                      * (e.v[js.j * 16 + i] - cents.cvec[js.j * 16 + i])),
                   'sum') AS d
          FROM e
          CROSS JOIN (SELECT unnest(range(0, 4)) AS j) js
          CROSS JOIN cents),
        best AS (
          SELECT vec_id, j, cent_id, d,
                 row_number() OVER (PARTITION BY vec_id, j
                                    ORDER BY d ASC, cent_id ASC) AS rk
          FROM sub)
        SELECT vec_id,
               max(CASE WHEN j = 0 THEN cent_id END) AS code_0,
               max(CASE WHEN j = 1 THEN cent_id END) AS code_1,
               max(CASE WHEN j = 2 THEN cent_id END) AS code_2,
               max(CASE WHEN j = 3 THEN cent_id END) AS code_3,
               floor((max(CASE WHEN j = 0 THEN d END) + max(CASE WHEN j = 1 THEN d END) + max(CASE WHEN j = 2 THEN d END) + max(CASE WHEN j = 3 THEN d END)) * 1000000.0 + 0.5) / 1000000.0 AS qerr
        FROM best WHERE rk = 1 GROUP BY vec_id"""
    # CMS oracle generated from the SAME geometry constants as the query
    _cms_b = " UNION ALL ".join(
        f"SELECT user_id, {j} AS j, ((user_id * {a} + {b}) % {CMS_P}) % {CMS_W} AS bucket FROM events"
        for j, (a, b) in enumerate(CMS_SALTS)
    )
    sql["w17_rank_family"] = """
        WITH rev AS (
          SELECT c.c_custkey AS custkey, c.c_nationkey AS nationkey,
                 CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY c.c_custkey, c.c_nationkey)
        SELECT custkey, nationkey, revenue,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               percent_rank() OVER w AS prnk,
               cume_dist() OVER w AS cume,
               ntile(4) OVER w AS quartile
        FROM rev
        WINDOW w AS (PARTITION BY nationkey
                     ORDER BY revenue DESC, custkey ASC)"""
    sql["a14_countmin"] = f"""
        WITH b AS ({_cms_b}),
        cms AS (SELECT j, bucket, count(*) AS cnt FROM b GROUP BY j, bucket),
        top AS (SELECT user_id, count(*) AS n_exact FROM events
                GROUP BY user_id
                ORDER BY n_exact DESC, user_id ASC LIMIT 20),
        est AS (SELECT t.user_id, t.n_exact, min(c.cnt) AS n_cms
                FROM top t
                JOIN b ON b.user_id = t.user_id
                JOIN cms c ON c.j = b.j AND c.bucket = b.bucket
                GROUP BY t.user_id, t.n_exact)
        SELECT user_id, n_exact, n_cms, n_cms >= n_exact AS cms_ok FROM est"""
    sql["w16_gini"] = """
        WITH per AS (SELECT user_id, count(*) AS n FROM events
                     GROUP BY user_id),
        r AS (SELECT n, row_number() OVER (ORDER BY n ASC, user_id ASC) AS i
              FROM per)
        SELECT count(*) AS n_users, CAST(sum(n) AS BIGINT) AS total_events,
               floor((CAST(2.0 AS DOUBLE) * sum(i * n)
                       / (count(*) * sum(n))
                     - (count(*) + CAST(1.0 AS DOUBLE)) / count(*)) * 1000000.0 + 0.5) / 1000000.0
                 AS gini
        FROM r"""
    sql["a13_mad"] = """
        WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                     FROM events GROUP BY event_type)
        SELECT e.event_type, round(any_value(med.med), 6) AS median,
               round(quantile_cont(abs(e.value - med.med), 0.5), 6) AS mad
        FROM events e JOIN med ON med.event_type = e.event_type
        GROUP BY e.event_type"""
    # canonical-doc selection: the cluster oracle above joined to the
    # quality oracle, best (quality DESC, doc_id ASC) member per cluster —
    # pure composition of the two already-checked derivations
    sql["corpus_keep_best"] = f"""
        WITH comp AS (SELECT * FROM ({sql['dedup_minhash_groups']}) c),
        q AS (SELECT doc_id, quality FROM ({_quality_select()}) qq),
        m AS (SELECT c.keeper_id, c.doc_id, q.quality
              FROM comp c JOIN q ON q.doc_id = c.doc_id),
        r AS (SELECT keeper_id, doc_id, quality,
                     row_number() OVER (PARTITION BY keeper_id
                                        ORDER BY quality DESC, doc_id ASC) AS rn,
                     count(*) OVER (PARTITION BY keeper_id) AS n_members
              FROM m)
        SELECT keeper_id, doc_id AS best_doc, quality AS best_quality,
               CAST(n_members AS BIGINT) AS n_members
        FROM r WHERE rn = 1"""
    # incremental near-dup: identical banding/cap/star pipeline to
    # dedup_minhash_lsh, restricted to pairs touching the "new batch"
    # (doc_id % 4 == 0) and verified over token-id sets (the engine's
    # persisted-index substrate — raw shingle strings are not stored).
    sql["dedup_minhash_incr"] = _SHINGLE_CTE + _minhash_oracle_body(
        "idd", "tok_id", pair_where="WHERE doc_a % 4 = 0 OR doc_b % 4 = 0"
    )
    # word-5-gram shingle CTE over documents (decontamination unit)
    gram5 = """
        WITH g AS (
          SELECT DISTINCT doc_id,
                 toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                 toks[i+3] || ' ' || toks[i+4] AS tok
          FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
                FROM documents
                WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 5),
               (SELECT unnest(range(1, (SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) + 1 FROM documents))) AS i)
          WHERE i <= len(toks) - 4)
    """
    sql["corpus_decon_overlap"] = (
        gram5
        + f""",
        eg AS (SELECT DISTINCT tok FROM g WHERE doc_id % {corpus.EVAL_MOD} = 0),
        tg AS (SELECT doc_id, tok FROM g WHERE doc_id % {corpus.EVAL_MOD} <> 0),
        sizes AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY doc_id),
        hits AS (SELECT doc_id, count(*) AS n_overlap
                 FROM tg JOIN eg USING (tok) GROUP BY doc_id)
        SELECT h.doc_id, s.n_grams, h.n_overlap,
               floor((h.n_overlap / CAST(s.n_grams AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS overlap_frac
        FROM hits h JOIN sizes s USING (doc_id)"""
    )
    sql["corpus_mix_sample"] = f"""
        WITH r AS (SELECT source,
                          (CAST(substr(source, 4, 10) AS INT) % 4 + 1) * 0.25 AS rate
                   FROM (SELECT DISTINCT source FROM documents))
        SELECT d.doc_id, d.source
        FROM documents d JOIN r USING (source)
        WHERE ((d.doc_id % {corpus.MIX_P}) * {corpus.MIX_A} + {corpus.MIX_B})
                % {corpus.MIX_P} < r.rate * {corpus.MIX_P}"""
    sql["corpus_vocab_growth"] = """
        WITH toks AS (
          SELECT doc_id, t AS tok
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents)
          WHERE t <> ''),
        first AS (SELECT tok, min(doc_id) AS doc_id FROM toks GROUP BY tok),
        news AS (SELECT doc_id, count(*) AS n_new_tokens FROM first GROUP BY doc_id),
        alldocs AS (SELECT DISTINCT doc_id FROM documents),
        nd AS (SELECT a.doc_id, coalesce(n.n_new_tokens, 0) AS n_new_tokens
               FROM alldocs a LEFT JOIN news n USING (doc_id))
        SELECT doc_id, CAST(n_new_tokens AS BIGINT) AS n_new_tokens,
               CAST(sum(n_new_tokens) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS vocab_size
        FROM nd"""
    sql["corpus_containment"] = """
        WITH g AS (
          SELECT DISTINCT doc_id,
                 toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                 toks[i+3] || ' ' || toks[i+4] AS tok
          FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
                FROM documents
                WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 5),
               (SELECT unnest(range(1, (SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) + 1 FROM documents))) AS i)
          WHERE i <= len(toks) - 4),
        rare AS (SELECT tok FROM (SELECT tok, count(*) AS dfc FROM g GROUP BY tok)
                 WHERE dfc <= 64),
        gg AS (SELECT g.doc_id, g.tok FROM g JOIN rare USING (tok)),
        sizes AS (SELECT doc_id, count(*) AS n_grams_a FROM gg GROUP BY doc_id),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM gg a JOIN gg b ON a.tok = b.tok AND a.doc_id <> b.doc_id
              GROUP BY a.doc_id, b.doc_id)
        SELECT p.doc_a, p.doc_b, s.n_grams_a, p.n_common,
               CAST(floor((p.n_common / CAST(s.n_grams_a AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
                 AS containment
        FROM p JOIN sizes s ON s.doc_id = p.doc_a
        WHERE p.n_common >= 0.5 * s.n_grams_a"""
    sql["corpus_dupe_ngrams"] = """
        WITH g AS (
          SELECT DISTINCT doc_id,
                 toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                 toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
                 toks[i+6] || ' ' || toks[i+7] AS tok
          FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
                FROM documents
                WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 8),
               (SELECT unnest(range(1, (SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) + 1 FROM documents))) AS i)
          WHERE i <= len(toks) - 7),
        gdf AS (SELECT tok, count(*) AS n_docs FROM g GROUP BY tok)
        SELECT doc_id, count(*) AS n_ngrams,
               floor((sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
        FROM g JOIN gdf USING (tok) GROUP BY doc_id"""
    # novelty shares dupe_ngrams' gram CTE; first occurrence = min doc_id
    sql["corpus_ngram_novelty"] = """
        WITH g AS (
          SELECT DISTINCT doc_id,
                 toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                 toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
                 toks[i+6] || ' ' || toks[i+7] AS tok
          FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
                FROM documents
                WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 8),
               (SELECT unnest(range(1, (SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) + 1 FROM documents))) AS i)
          WHERE i <= len(toks) - 7),
        gmin AS (SELECT tok, min(doc_id) AS first_doc FROM g GROUP BY tok)
        SELECT doc_id, count(*) AS n_ngrams,
               CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               floor((sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS novelty_frac
        FROM g JOIN gmin USING (tok) GROUP BY doc_id"""
    from plume_spark.operators.text import PII_DIGITS, PII_EMAIL

    sql["text_pii_scrub"] = f"""
        WITH w AS (SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@mail.example.org or ref '
                          || CAST(doc_id * 7919 + 100000 AS VARCHAR) AS text
                   FROM documents),
        s1 AS (SELECT doc_id, text,
                      regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
               FROM w)
        SELECT doc_id,
               regexp_replace(t1, '{PII_DIGITS}', '<NUM>', 'g') AS text,
               CAST((len(string_split_regex(text, '{PII_EMAIL}')) - 1)
                  + (len(string_split_regex(t1, '{PII_DIGITS}')) - 1) AS BIGINT)
                 AS n_redactions
        FROM s1"""
    from plume_spark.operators.text import LOGREG_BIAS, LOGREG_W, STOPWORDS

    _stoplist = ", ".join(f"'{s}'" for s in STOPWORDS)
    sql["text_quality_logreg"] = f"""
        WITH t AS (SELECT doc_id, text,
                          list_filter(string_split(text, ' '), x -> x <> '') AS toks
                   FROM documents),
        f AS (SELECT doc_id,
                     least(length(text) / 500.0, 1.0) AS f_len,
                     len(list_filter(toks, x -> x IN ({_stoplist})))
                       / CAST(greatest(len(toks), 1) AS DOUBLE) AS f_stop,
                     coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
                       / CAST(greatest(len(toks), 1) AS DOUBLE) / 10.0 AS f_word
              FROM t)
        SELECT doc_id,
               floor((f_len) * 1000000.0 + 0.5) / 1000000.0 AS f_len,
               floor((f_stop) * 1000000.0 + 0.5) / 1000000.0 AS f_stop,
               floor((f_word) * 1000000.0 + 0.5) / 1000000.0 AS f_word,
               round(1.0 / (1.0 + exp(-({LOGREG_BIAS}
                     + {LOGREG_W['f_len']} * f_len
                     + {LOGREG_W['f_stop']} * f_stop
                     + {LOGREG_W['f_word']} * f_word))), 6) AS score
        FROM f"""
    sql["stream_sessionize"] = """
        SELECT event_id, user_id,
               CAST(sum(new_sess) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS session_idx
        FROM (
          SELECT event_id, user_id, ts,
                 CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_sess
          FROM (
            SELECT event_id, user_id, ts,
                   epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id
                     ORDER BY ts ASC, event_id ASC) AS gap
            FROM events))"""
    sql["w5_funnel"] = """
        WITH c AS (SELECT user_id, min(ts) AS t_click FROM events
                   WHERE event_type = 'click' GROUP BY user_id),
        v AS (SELECT e.user_id, min(e.ts) AS t_view
              FROM events e JOIN c USING (user_id)
              WHERE e.event_type = 'view' AND e.ts > c.t_click
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS t_purchase
              FROM events e JOIN v USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > v.t_view
              GROUP BY e.user_id)
        SELECT c.user_id, c.t_click, v.t_view, p.t_purchase,
               1 + CAST(v.t_view IS NOT NULL AS INT)
                 + CAST(p.t_purchase IS NOT NULL AS INT) AS stage
        FROM c LEFT JOIN v USING (user_id) LEFT JOIN p USING (user_id)"""
    sql["t3_ohlc_downsample"] = """
        WITH r AS (
          SELECT user_id, date_trunc('hour', ts) AS bucket_ts, value,
                 row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts ASC, event_id ASC) AS ra,
                 row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rd
          FROM events)
        SELECT user_id, bucket_ts, count(*) AS n,
               max(CASE WHEN ra = 1 THEN value END) AS v_open,
               max(value) AS v_high,
               min(value) AS v_low,
               max(CASE WHEN rd = 1 THEN value END) AS v_close
        FROM r GROUP BY user_id, bucket_ts"""
    sql["emb_quantize"] = """
        WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        s AS (SELECT vec_id, e,
                     list_max(list_transform(e, x -> abs(x))) AS scale
              FROM d)
        SELECT vec_id, round(scale, 6) AS scale,
               CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
                    ELSE list_transform(e, x -> CAST(floor(x / scale * 127.0) AS INT))
               END AS q
        FROM s"""
    sql["corpus_boilerplate"] = """
        WITH sh AS (
          SELECT DISTINCT doc_id,
                 toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tok
          FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
                FROM documents
                WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 3),
               (SELECT unnest(range(1, (SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) + 1 FROM documents))) AS i)
          WHERE i <= len(toks) - 2),
        common AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM sh GROUP BY tok)
                   WHERE c >= 10),
        marked AS (SELECT doc_id, count(*) AS n_common
                   FROM sh JOIN common USING (tok) GROUP BY doc_id),
        sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id)
        SELECT s.doc_id, s.n_shingles,
               coalesce(m.n_common, 0) AS n_common,
               floor((coalesce(m.n_common, 0) / CAST(s.n_shingles AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
                 AS boilerplate_frac
        FROM sizes s LEFT JOIN marked m USING (doc_id)"""
    _poly_docid = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split_regex(CAST(doc_id AS VARCHAR), ''), c -> ascii(c))), "
        f"(a, b) -> (a * {dedup.POLY_MUL} + b) % {dedup.MINHASH_P})"
    )
    sql["corpus_train_val_split"] = f"""
        SELECT doc_id, bucket,
               CASE WHEN bucket < 10 THEN 'val' ELSE 'train' END AS split
        FROM (SELECT doc_id, CAST({_poly_docid} % 100 AS INT) AS bucket
              FROM documents)"""
    sql["corpus_weighted_sample"] = f"""
        WITH keyed AS (
          SELECT source AS grp, doc_id,
                 greatest(CAST(n_chars AS DOUBLE), 1.0) AS w,
                 ln((({_poly_docid} % 1048576) + 1) / 1048577.0)
                   / greatest(CAST(n_chars AS DOUBLE), 1.0) AS k
          FROM documents),
        ranked AS (
          SELECT grp, doc_id, w, k,
                 row_number() OVER (PARTITION BY grp
                                    ORDER BY k DESC, doc_id ASC) AS rank
          FROM keyed)
        SELECT grp, doc_id, CAST(w AS BIGINT) AS w,
               CAST(round(k, 9) AS DOUBLE) AS samp_key, rank
        FROM ranked WHERE rank <= 20"""
    sql["corpus_tfidf_topk"] = """
        WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
               WHERE tok <> '' GROUP BY doc_id, tok),
        dfreq AS (SELECT tok, count(*) AS df_docs FROM tf GROUP BY tok),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
        SELECT doc_id, tok, tf, df_docs,
               round(tf * ln(n_docs / CAST(df_docs AS DOUBLE)), 6) AS score
        FROM (SELECT tf.*, dfreq.df_docs, n.n_docs,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY tf DESC, df_docs ASC, tok ASC) AS rnk
              FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
        WHERE rnk <= 3"""
    sql["corpus_pack_chunks"] = f"""
        WITH base AS (
          SELECT doc_id,
                 CAST({_poly_docid} % 8 AS INT) AS shard,
                 len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
          FROM documents),
        offs AS (
          SELECT doc_id, shard,
                 CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS tok_offset
          FROM base)
        SELECT doc_id, shard, tok_offset,
               CAST(tok_offset // 256 AS BIGINT) AS chunk FROM offs"""
    sql["w18_streaks"] = """
        WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                      FROM events),
        anchored AS (
          SELECT user_id,
                 day - CAST(row_number() OVER (PARTITION BY user_id
                                               ORDER BY day ASC) AS INT)
                   AS anchor
          FROM days),
        runs AS (SELECT user_id, anchor, count(*) AS len FROM anchored
                 GROUP BY user_id, anchor)
        SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
               count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS longest_streak
        FROM runs GROUP BY user_id"""
    sql["t6_scd2"] = """
        WITH marked AS (
          SELECT user_id, event_id, event_type AS state, ts AS valid_from,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC) AS prev
          FROM events),
        changes AS (SELECT user_id, event_id, state, valid_from FROM marked
                    WHERE prev IS NULL OR prev <> state)
        SELECT user_id, event_id AS change_event, state, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY valid_from ASC, event_id ASC)
                 AS valid_to,
               lead(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY valid_from ASC, event_id ASC)
                 IS NULL AS is_current
        FROM changes"""
    # Bloom oracle generated from the SAME salt constants and geometry as
    # the Spark query (the CMS pattern): one UNION ALL branch per hash
    _bloom_k = len(CMS_SALTS)
    _bloom_member_bits = " UNION ALL ".join(
        f"SELECT ((user_id * {a} + {b}) % {CMS_P}) % {BLOOM_M} AS bit FROM members"
        for a, b in CMS_SALTS
    )
    _bloom_probe_bits = " UNION ALL ".join(
        f"SELECT user_id, ((user_id * {a} + {b}) % {CMS_P}) % {BLOOM_M} AS bit FROM probe"
        for a, b in CMS_SALTS
    )
    sql["a15_bloom"] = f"""
        WITH members AS (SELECT DISTINCT user_id FROM events
                         WHERE event_type = 'purchase'),
        bits AS (SELECT DISTINCT bit FROM ({_bloom_member_bits})),
        probe AS (SELECT DISTINCT user_id FROM events),
        pb AS ({_bloom_probe_bits}),
        hits AS (SELECT user_id, count(*) AS k_hit FROM pb
                 WHERE bit IN (SELECT bit FROM bits) GROUP BY user_id)
        SELECT p.user_id,
               m.user_id IS NOT NULL AS is_member,
               coalesce(h.k_hit, 0) = {_bloom_k} AS bloom_hit,
               (coalesce(h.k_hit, 0) = {_bloom_k}) OR m.user_id IS NULL
                 AS no_false_neg
        FROM probe p
        LEFT JOIN hits h ON h.user_id = p.user_id
        LEFT JOIN members m ON m.user_id = p.user_id"""
    sql["kg_star_join"] = f"""
        WITH kg AS ({kg_varied}),
        d AS (SELECT DISTINCT subj_name, pred, obj_name FROM kg)
        SELECT w.subj_name AS who, w.obj_name AS workplace,
               v.obj_name AS visited_place
        FROM d w JOIN d v ON v.subj_name = w.subj_name AND v.pred = 'visited'
        WHERE w.pred = 'works_at'"""
    # ADC lookup-table oracle: one column per sub-space, same fixed-order
    # 16-dim fold as the emb_pq_codes oracle it composes with
    _adc_d = ", ".join(
        "list_aggregate(list_transform(range(1, 17), "
        f"i -> (q.qvec[{j} * 16 + i] - cents.cvec[{j} * 16 + i])"
        f" * (q.qvec[{j} * 16 + i] - cents.cvec[{j} * 16 + i])), 'sum') AS d{j}"
        for j in range(4)
    )
    sql["ann_pq_adc"] = f"""
        WITH codes AS ({sql['emb_pq_codes']}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cents AS (SELECT vec_id AS cent_id, v AS cvec FROM e WHERE vec_id < 8),
        q AS (SELECT v AS qvec FROM e WHERE vec_id = 9),
        lut AS (SELECT cent_id, {_adc_d} FROM cents CROSS JOIN q)
        SELECT c.vec_id,
               floor((l0.d0 + l1.d1 + l2.d2 + l3.d3) * 1000000.0 + 0.5) / 1000000.0 AS adc_dist
        FROM codes c
        JOIN lut l0 ON l0.cent_id = c.code_0
        JOIN lut l1 ON l1.cent_id = c.code_1
        JOIN lut l2 ON l2.cent_id = c.code_2
        JOIN lut l3 ON l3.cent_id = c.code_3
        ORDER BY adc_dist ASC, c.vec_id ASC LIMIT 20"""
    sql["ann_rerank"] = f"""
        WITH adc AS ({sql['ann_pq_adc']}),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
              WHERE vec_id = 9)
        SELECT a.vec_id, a.adc_dist,
               CAST(round(list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]), q.qe), 4) AS DOUBLE)
                 AS cos_sim
        FROM adc a JOIN embeddings e ON e.vec_id = a.vec_id, q
        ORDER BY cos_sim DESC, a.vec_id ASC LIMIT 5"""

    # portable poly hash over an arbitrary string SQL expression — the same
    # fold as dedup.poly_hash / _POLY_ID, parameterized for reuse below
    def _poly_expr(expr):
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(string_split_regex({expr}, ''), c -> ascii(c))), "
            f"(a, b) -> (a * {dedup.POLY_MUL} + b) % {dedup.MINHASH_P})"
        )

    sql["kg_neg_samples"] = f"""
        WITH kg AS ({sql['kg_build_triples']}),
        ents AS ({sql['kg_entities']}),
        pos AS (SELECT DISTINCT subj_name, pred, obj_name FROM kg),
        pool AS (
          SELECT kind, {_poly_expr('canonical_name')} % 64 AS bucket,
                 min(canonical_name) AS neg_obj
          FROM ents GROUP BY 1, 2),
        picked AS (
          SELECT p.subj_name, p.pred, p.obj_name, pool.neg_obj
          FROM pos p
          JOIN ents k ON k.canonical_name = p.obj_name
          JOIN pool ON pool.kind = k.kind
           AND pool.bucket =
               {_poly_expr("concat_ws('|', p.subj_name, p.pred, p.obj_name)")} % 64
          WHERE pool.neg_obj <> p.obj_name)
        SELECT subj_name, pred, obj_name, neg_obj FROM picked pk
        WHERE NOT EXISTS (SELECT 1 FROM pos t
                          WHERE t.subj_name = pk.subj_name
                            AND t.pred = pk.pred
                            AND t.obj_name = pk.neg_obj)"""
    sql["corpus_chunk_windows"] = f"""
        WITH tk AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents),
        nn AS (SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) > 0),
        ix AS (SELECT doc_id, toks,
                      unnest(range(0, ((n - 1) // 48) + 1)) AS chunk_idx
               FROM nn),
        ch AS (SELECT doc_id, chunk_idx,
                      toks[(chunk_idx * 48 + 1):(chunk_idx * 48 + 64)] AS chunk
               FROM ix)
        SELECT doc_id, chunk_idx, len(chunk) AS n_tokens,
               sha256(array_to_string(chunk, ' ')) AS chunk_fp
        FROM ch"""
    sql["text_zipf_slope"] = """
        WITH tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        freq AS (SELECT source, tok, count(*) AS freq FROM tok
                 WHERE tok <> '' GROUP BY source, tok),
        top AS (SELECT source, freq,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY freq DESC, tok ASC) AS rank
                FROM freq QUALIFY rank <= 100),
        m AS (SELECT source, count(*) AS n_ranks,
                     sum(ln(CAST(rank AS DOUBLE))) AS sx,
                     sum(ln(CAST(freq AS DOUBLE))) AS sy,
                     sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(freq AS DOUBLE))) AS sxy,
                     sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))) AS sxx
              FROM top GROUP BY source)
        SELECT source, n_ranks,
               CAST(round((n_ranks * sxy - sx * sy)
                          / NULLIF(n_ranks * sxx - sx * sx, 0), 6) AS DOUBLE)
                 AS zipf_slope
        FROM m"""
    sql["w19_attribution"] = """
        WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
                   FROM events WHERE event_type = 'purchase'),
        v AS (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view')
        SELECT p.purchase_id, count(*) AS n_touches,
               1000000 // count(*) AS credit_ppm,
               min(v.v_ts) AS first_view_ts, max(v.v_ts) AS last_view_ts
        FROM p JOIN v ON v.user_id = p.user_id
         AND v.v_ts <= p.p_ts AND v.v_ts >= p.p_ts - INTERVAL 7 DAY
        GROUP BY p.purchase_id"""
    # IVF-PQ composition: the ann_ivf_topk assignment/probe CTEs (query
    # vec 9) feed the ann_pq_adc LUT — _adc_d reused verbatim (same q/cents
    # aliases), so the two oracles cannot drift apart
    sql["ann_ivf_adc"] = f"""
        WITH codes AS ({sql['emb_pq_codes']}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cents AS (SELECT vec_id AS cent_id, v AS cvec FROM e WHERE vec_id < 8),
        q AS (SELECT v AS qvec FROM e WHERE vec_id = 9),
        assigned AS (
          SELECT vec_id, cent_id FROM (
            SELECT e.vec_id, c.cent_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.v, c.cvec) DESC,
                              c.cent_id) AS rk
            FROM e CROSS JOIN cents c)
          WHERE rk = 1),
        probe AS (
          SELECT cent_id FROM cents, q
          ORDER BY list_cosine_similarity(cvec, qvec) DESC, cent_id LIMIT 2),
        lut AS (SELECT cent_id AS lut_cent, {_adc_d} FROM cents CROSS JOIN q),
        m AS (SELECT a.vec_id, a.cent_id
              FROM assigned a JOIN probe p USING (cent_id))
        SELECT m.vec_id, m.cent_id,
               floor((l0.d0 + l1.d1 + l2.d2 + l3.d3) * 1000000.0 + 0.5) / 1000000.0 AS adc_dist
        FROM m JOIN codes c ON c.vec_id = m.vec_id
        JOIN lut l0 ON l0.lut_cent = c.code_0
        JOIN lut l1 ON l1.lut_cent = c.code_1
        JOIN lut l2 ON l2.lut_cent = c.code_2
        JOIN lut l3 ON l3.lut_cent = c.code_3
        ORDER BY adc_dist ASC, m.vec_id ASC LIMIT 10"""
    _eval_bits = " UNION ALL ".join(
        f"SELECT ((gid * {a} + {b}) % {CMS_P}) % {BLOOM_M} AS bit FROM egid"
        for a, b in CMS_SALTS
    )
    sql["corpus_decon_bloom"] = (
        gram5
        + f""",
        eg AS (SELECT DISTINCT tok FROM g WHERE doc_id % {corpus.EVAL_MOD} = 0),
        tg AS (SELECT doc_id, tok FROM g WHERE doc_id % {corpus.EVAL_MOD} <> 0),
        egid AS (SELECT CAST('0x' || substr(sha256(tok), 1, 12) AS BIGINT)
                          % {CMS_P} AS gid FROM eg),
        bits AS (SELECT DISTINCT bit FROM ({_eval_bits})),
        tgid AS (SELECT doc_id, tok,
                        CAST('0x' || substr(sha256(tok), 1, 12) AS BIGINT)
                          % {CMS_P} AS gid FROM tg),
        tbits AS (
          SELECT doc_id, tok, bit FROM (
            {" UNION ALL ".join(
                f"SELECT doc_id, tok, ((gid * {a} + {b}) % {CMS_P}) % {BLOOM_M}"
                f" AS bit FROM tgid" for a, b in CMS_SALTS)})),
        kh AS (SELECT doc_id, tok, count(*) AS k
               FROM tbits JOIN bits USING (bit) GROUP BY doc_id, tok),
        fl AS (SELECT t.doc_id,
                      CASE WHEN coalesce(kh.k, 0) = {len(CMS_SALTS)}
                           THEN 1 ELSE 0 END AS bpos,
                      CASE WHEN eg.tok IS NOT NULL THEN 1 ELSE 0 END AS exact
               FROM tg t
               LEFT JOIN kh ON kh.doc_id = t.doc_id AND kh.tok = t.tok
               LEFT JOIN eg ON eg.tok = t.tok)
        SELECT doc_id, count(*) AS n_grams,
               CAST(sum(bpos) AS BIGINT) AS n_bloom_hits,
               CAST(sum(exact) AS BIGINT) AS n_exact,
               min(CASE WHEN bpos >= exact THEN 1 ELSE 0 END) = 1 AS no_false_neg
        FROM fl GROUP BY doc_id"""
    )
    sql["emb_matryoshka"] = """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
                   WHERE vec_id = 0),
        tr AS (SELECT vec_id,
                      CAST(round(list_cosine_similarity(
                             CAST(embedding AS DOUBLE[])[1:16], q.qe[1:16]), 4)
                        AS DOUBLE) AS trunc_cos
               FROM embeddings, q
               ORDER BY trunc_cos DESC, vec_id LIMIT 10),
        fl AS (SELECT vec_id FROM (
                 SELECT vec_id,
                        round(list_cosine_similarity(
                          CAST(embedding AS DOUBLE[]), q.qe), 4) AS c
                 FROM embeddings, q ORDER BY c DESC, vec_id LIMIT 10))
        SELECT t.vec_id, t.trunc_cos,
               EXISTS (SELECT 1 FROM fl WHERE fl.vec_id = t.vec_id)
                 AS in_full_topk
        FROM tr t"""
    sql["emb_kmeans_step"] = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        cents AS (SELECT vec_id AS cent_id, v AS cvec FROM e WHERE vec_id < 8),
        assigned AS (
          SELECT vec_id, v, cent_id FROM (
            SELECT e.vec_id, e.v, c.cent_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.v, c.cvec) DESC,
                              c.cent_id) AS rk
            FROM e CROSS JOIN cents c)
          WHERE rk = 1),
        x AS (SELECT cent_id, CAST(i - 1 AS INT) AS dim, v[i] AS val
              FROM assigned,
                   (SELECT unnest(range(1, (SELECT max(len(v)) + 1 FROM e))) AS i)
              WHERE i <= len(v))
        SELECT cent_id, dim,
               round(CAST(sum(CAST(val AS DECIMAL(27,12))) / count(*) AS DOUBLE), 6)
                 AS centroid,
               count(*) AS n_members
        FROM x GROUP BY cent_id, dim"""
    sql["kg_rule_confidence"] = f"""
        WITH kg AS ({kg_varied}),
        d AS (SELECT DISTINCT subj_name, pred, obj_name FROM kg),
        pairs AS (
          SELECT a.pred AS antecedent, b.pred AS consequent,
                 count(*) AS support
          FROM d a JOIN d b ON b.subj_name = a.subj_name
                           AND b.obj_name = a.obj_name
                           AND b.pred <> a.pred
          GROUP BY a.pred, b.pred),
        np AS (SELECT pred AS antecedent, count(*) AS n_antecedent
               FROM d GROUP BY pred)
        SELECT p.antecedent, p.consequent, p.support, np.n_antecedent,
               floor((CAST(p.support AS DOUBLE) / np.n_antecedent) * 1000000.0 + 0.5) / 1000000.0
                 AS confidence
        FROM pairs p JOIN np USING (antecedent)"""
    sql["a16_group_skewness"] = """
        WITH q AS (
          SELECT event_type,
                 CAST(round(value * 100) AS BIGINT) AS x
          FROM events),
        m AS (SELECT event_type, count(*) AS n,
                     CAST(sum(x) AS DECIMAL(38,0)) AS s1,
                     CAST(sum(x * x) AS DECIMAL(38,0)) AS s2,
                     CAST(sum(x * x * x) AS DECIMAL(38,0)) AS s3,
                     min(x) AS mn, max(x) AS mx
              FROM q GROUP BY event_type),
        w AS (SELECT event_type, n, s1, s2, s3, mn, mx,
                     CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                     CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS t2,
                     CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS t3
              FROM m),
        z AS (SELECT event_type, n, s1, s2, s3, mn, mx,
                     t3 - 3.0 * m1 * t2 + 2.0 * m1 * m1 * m1 AS m3,
                     sqrt(t2 - m1 * m1) AS sd
              FROM w)
        SELECT event_type, n, s1, s2, s3,
               CASE WHEN mn <> mx
                    THEN CAST(floor(m3 / (sd * sd * sd) * 10000.0 + 0.5)
                              AS BIGINT)
               END AS skew_e4
        FROM z"""
    sql["a19_user_entropy"] = """
        WITH c AS (
          SELECT user_id, event_type, count(*) AS c
          FROM events GROUP BY user_id, event_type)
        SELECT user_id,
               CAST(sum(c) AS BIGINT) AS n_events,
               count(*) AS n_types,
               CAST(round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS DOUBLE)
                 AS entropy
        FROM c GROUP BY user_id"""
    sql["w22_ema"] = """
        WITH w AS (
          SELECT event_id, user_id,
                 list(value) OVER (PARTITION BY user_id
                     ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vals
          FROM events)
        SELECT event_id, user_id, CAST(len(vals) AS INT) AS n_window,
               -- Horner fold: acc*0.8 + v.  list_reduce seeds with the
               -- first element, Spark's aggregate with 0.0 — identical
               -- IEEE sequences because 0.0*0.8 + v1 == v1 exactly
               CAST(floor(list_reduce(vals,
                            (a, b) -> a * CAST(0.8 AS DOUBLE) + b)
                          / list_reduce(list_transform(vals,
                                          x -> CAST(1.0 AS DOUBLE)),
                            (a, b) -> a * CAST(0.8 AS DOUBLE) + b)
                          * 1000000.0 + 0.5) AS BIGINT) AS ema_e6
        FROM w"""
    sql["a17_group_kurtosis"] = """
        WITH q AS (
          SELECT event_type,
                 CAST(round(value * 100) AS BIGINT) AS x
          FROM events),
        m AS (SELECT event_type, count(*) AS n,
                     CAST(sum(x) AS DECIMAL(38,0)) AS s1,
                     CAST(sum(x * x) AS DECIMAL(38,0)) AS s2,
                     CAST(sum(x * x * x) AS DECIMAL(38,0)) AS s3,
                     CAST(sum(CAST(x * x AS HUGEINT) * (x * x))
                          AS DECIMAL(38,0)) AS s4,
                     min(x) AS mn, max(x) AS mx
              FROM q GROUP BY event_type),
        w AS (SELECT event_type, n, s1, s2, s3, s4, mn, mx,
                     CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                     CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS t2,
                     CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS t3,
                     CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS t4
              FROM m),
        z AS (SELECT event_type, n, s1, s2, s4, mn, mx,
                     t4 - 4.0 * m1 * t3 + 6.0 * m1 * m1 * t2
                        - 3.0 * m1 * m1 * m1 * m1 AS m4,
                     t2 - m1 * m1 AS m2
              FROM w)
        SELECT event_type, n, s1, s2, s4,
               CASE WHEN mn <> mx
                    THEN CAST(floor((m4 / (m2 * m2) - 3.0) * 10000.0 + 0.5)
                              AS BIGINT)
               END AS kurt_e4
        FROM z"""
    sql["corpus_dsir"] = """
        WITH toks AS (
          SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        tk AS (SELECT doc_id, source, tok FROM toks WHERE tok <> ''),
        raw AS (SELECT tok, count(*) AS c_r FROM tk GROUP BY tok),
        tgt AS (SELECT tok, count(*) AS c_t FROM tk
                WHERE source IN ('src0') GROUP BY tok),
        stats AS (SELECT raw.tok, raw.c_r, coalesce(tgt.c_t, 0) AS c_t
                  FROM raw LEFT JOIN tgt ON tgt.tok = raw.tok),
        tot AS (SELECT sum(c_r) AS n_raw, sum(c_t) AS n_tgt,
                       count(*) AS v
                FROM stats)
        SELECT doc_id, count(*) AS n_tokens,
               round(avg(ln(CAST(c_t + 1 AS DOUBLE)
                              / CAST(n_tgt + v AS DOUBLE))
                         - ln(CAST(c_r + 1 AS DOUBLE)
                                / CAST(n_raw + v AS DOUBLE))), 6) + 0.0
                 AS avg_logratio
        FROM tk JOIN stats USING (tok) CROSS JOIN tot
        GROUP BY doc_id"""
    sql["corpus_bigram_logprob"] = """
        WITH base AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS ts
          FROM documents),
        pos AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
                FROM base, unnest(range(1, len(ts))) AS t(i)
                WHERE len(ts) >= 2),
        uni AS (SELECT w, count(*) AS c FROM (
                  SELECT unnest(ts) AS w FROM base) GROUP BY w),
        big AS (SELECT w1, w2, count(*) AS c12 FROM pos GROUP BY w1, w2),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uni)
        SELECT doc_id, count(*) AS n_bigrams,
               round(avg(ln(0.7 * (CAST(c12 AS DOUBLE) / CAST(u1.c AS DOUBLE))
                            + 0.30000000000000004
                              * (CAST(u2.c AS DOUBLE)
                                 / CAST(n_tok AS DOUBLE)))), 6) AS avg_logprob
        FROM pos
        JOIN big USING (w1, w2)
        JOIN uni u1 ON u1.w = pos.w1
        JOIN uni u2 ON u2.w = pos.w2
        CROSS JOIN tot
        GROUP BY doc_id"""
    sql["a18_group_corr"] = """
        WITH q AS (
          SELECT event_type,
                 CAST(round(value * 100) AS BIGINT) AS x,
                 -- floor matches Spark's timestamp->long truncation on
                 -- fractional-second events (DuckDB's double cast rounds)
                 CAST(floor(epoch(ts)) AS BIGINT) AS y
          FROM events),
        m AS (SELECT event_type, count(*) AS n,
                     CAST(sum(x) AS DECIMAL(38,0)) AS sx,
                     CAST(sum(y) AS DECIMAL(38,0)) AS sy,
                     CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
                     CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
                     CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy,
                     min(x) AS mnx, max(x) AS mxx,
                     min(y) AS mny, max(y) AS mxy
              FROM q GROUP BY event_type),
        z AS (SELECT event_type, n, sx, sy, sxy, mnx, mxx, mny, mxy,
                     CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
                     CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                     CAST(syy AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
              FROM m)
        SELECT event_type, n, sx, sy, sxy,
               CASE WHEN mnx <> mxx AND mny <> mxy
                    THEN CAST(floor(cov / sqrt(vx * vy) * 1000000.0 + 0.5)
                              AS BIGINT)
               END AS corr_e6
        FROM z"""
    sql["emb_power_iter"] = """
        WITH t AS (
          SELECT list_transform(CAST(embedding AS DOUBLE[]),
                                v -> CAST(round(v * 1000000) AS BIGINT)) AS q
          FROM embeddings),
        tp AS (SELECT q, CAST(list_sum(q) AS BIGINT) AS p FROM t),
        x AS (SELECT CAST(i - 1 AS INT) AS dim, q[i] AS qv, p
              FROM tp, (SELECT unnest(range(1,
                    (SELECT max(len(CAST(embedding AS DOUBLE[]))) + 1
                     FROM embeddings))) AS i)
              WHERE i <= len(q)),
        s AS (SELECT dim, CAST(sum(qv * p) AS DECIMAL(38,0)) AS s
              FROM x GROUP BY dim),
        n AS (SELECT sqrt(sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE))) AS nrm
              FROM s)
        SELECT dim, s,
               CAST(floor(CAST(s AS DOUBLE) / nrm * 1000000.0 + 0.5)
                    AS BIGINT) AS u_e6
        FROM s CROSS JOIN n"""
    sql["text_pmi_bigrams"] = """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS ts
          FROM documents),
        bg AS (SELECT ts[i] AS w1, ts[i+1] AS w2
               FROM toks, unnest(range(1, len(ts))) AS t(i)
               WHERE len(ts) >= 2),
        big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS l1 FROM big GROUP BY w1),
        rgt AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS r2 FROM big GROUP BY w2),
        tot AS (SELECT CAST(sum(c12) AS BIGINT) AS t_big FROM big)
        SELECT w1, w2, c12, l1, r2,
               CAST(floor(ln(CAST(c12 AS DOUBLE) * CAST(t_big AS DOUBLE)
                             / (CAST(l1 AS DOUBLE) * CAST(r2 AS DOUBLE)))
                          * 1000000.0 + 0.5) AS BIGINT) AS pmi_e6
        FROM big JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tot
        ORDER BY c12 DESC, w1 ASC, w2 ASC
        LIMIT 20"""
    sql["w20_late_events"] = """
        WITH x AS (
          SELECT event_type,
                 max(epoch_us(ts)) OVER (PARTITION BY user_id
                     ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   - 600000000 - epoch_us(ts) AS late_us
          FROM events)
        SELECT event_type, count(*) AS n_events,
               count(CASE WHEN late_us > 0 THEN 1 END) AS n_late,
               max(CASE WHEN late_us > 0 THEN late_us END) AS max_late_us
        FROM x GROUP BY event_type"""
    sql["text_bpe_pairs"] = """
        WITH words AS (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        pairs AS (
          SELECT unnest(list_transform(range(1, length(w)),
                                       i -> w[i:i+1])) AS pair
          FROM words WHERE length(w) >= 2)
        SELECT pair, count(*) AS n_pairs
        FROM pairs GROUP BY pair
        ORDER BY n_pairs DESC, pair ASC
        LIMIT 20"""
    from plume_spark.operators.graph_metrics import modularity_oracle_sql

    sql["g16_modularity"] = modularity_oracle_sql(
        """SELECT o_custkey AS a, 1000000 + o_orderkey AS b FROM orders
           UNION ALL
           SELECT 1000000 + l_orderkey, 2000000 + l_partkey FROM lineitem""",
        n_iters=2,
    )
    sql["g15_component_profile"] = f"""
        WITH lbl AS ({sql['g2_components']}),
        edges AS (
          SELECT DISTINCT subj, obj FROM (
            SELECT o_custkey AS subj, 1000000 + o_orderkey AS obj FROM orders
            UNION ALL
            SELECT 1000000 + l_orderkey, 2000000 + l_partkey FROM lineitem
            WHERE (2000000 + l_partkey) % 23 = 0)),
        nn AS (SELECT component, count(*) AS n_nodes FROM lbl GROUP BY component),
        ee AS (SELECT l.component, count(*) AS n_edges
               FROM edges e JOIN lbl l ON l.node = e.subj GROUP BY l.component)
        SELECT nn.component, nn.n_nodes,
               coalesce(ee.n_edges, 0) AS n_edges,
               coalesce(ee.n_edges, 0) = nn.n_nodes - 1 AS is_tree
        FROM nn LEFT JOIN ee ON ee.component = nn.component"""
    sql["ann_lsh_recall"] = (
        bucket_cte
        + """,
        q0 AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
               WHERE vec_id = 0),
        top AS (SELECT vec_id,
                       CAST(round(list_cosine_similarity(
                              CAST(embedding AS DOUBLE[]), q0.qe), 4) AS DOUBLE)
                         AS cos_sim
                FROM embeddings, q0
                ORDER BY cos_sim DESC, vec_id LIMIT 10),
        qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
        cand AS (SELECT b.vec_id FROM buckets b, qb WHERE b.bucket = qb.bucket)
        SELECT t.vec_id, t.cos_sim,
               EXISTS (SELECT 1 FROM cand c WHERE c.vec_id = t.vec_id)
                 AS in_query_bucket
        FROM top t"""
    )
    return sql
