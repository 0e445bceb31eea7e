"""Entity linking: MinHash/LSH-blocked candidate generation + exact verify.

Reference analog: Plume links call-sites to methods by exact full-name
(CHANGELOG.md:181 PlumeDynamicCallLinker; CHANGELOG.md:1154-1155 CHA/SPARK call
graphs).  The transcript graft replaces exact-name linking with near-duplicate
surface-form linking: MinHash over character 3-grams, LSH banding to block
candidates, exact 3-gram Jaccard verification of candidates.

Everything here is JVM-side DataFrame work — no Python in the loop:
* gram sets via substring/transform column expressions,
* minhash DATA-parallel (k literal hash params exploded to rows, min as a
  partial aggregate) — shared machinery with dedup.minhash_signatures.
  An expression-parallel variant (64-element array expression) was tried and
  abandoned: Catalyst inlines the tree into every consumer and the optimizer
  OOMs; a per-row 4-norm toy took 13s,
* exact verify via array_intersect over a gram dictionary join.

Scale design:
* linking runs over the DISTINCT-norm dictionary, not over mentions — at
  100 TB the dictionary is orders of magnitude smaller than the mention
  stream, so hashing + self-join touch only distinct strings;
* oversized band buckets are dropped (``max_bucket_size``): an oversized
  bucket is non-discriminative and quadratic — the skew-kill for dense
  similarity clusters;
* the candidate self-join is a plain equi-join on (band, band_sig); AQE
  splits whatever skew survives the cap;
* the verify join against the gram dictionary broadcasts when small
  (Catalyst decides), shuffle-hash otherwise.

Parameters (k=32 hashes, 16 bands x 2 rows) target recall at the default
verify threshold tau=0.55: a true pair at J=0.6 is missed with p≈(1-0.36)^16
≈ 0.08%; over-generation below tau is cheap because verification is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from plume_spark.operators import dedup as dedup_mod
from plume_spark.operators.dedup import MINHASH_P, minhash_signatures

N_HASHES = 32
ROWS_PER_BAND = 2
JACCARD_TAU = 0.55
# Max norms per band bucket before the bucket is dropped as non-discriminative.
# Candidate volume is bounded by cap * |dict| * bands / 2, so the cap is the
# linear knob against dense-cluster blowup; real alias groups are far smaller.
MAX_BUCKET_SIZE = 32


def driver_link_kernel(
    norms: list[str],
    tau: float = JACCARD_TAU,
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> list[tuple[str, str]]:
    """Driver-local replica of candidate_pairs + verified_pairs for
    dictionary-sized norm sets: same xxhash64 (functions/xxh64.py, validated
    bit-identical to Spark's), same minhash parameters, same banding, same
    bucket cap, same exact-Jaccard verify — so the output pair set equals the
    distributed path's exactly (asserted in tests).  ~20 distributed stages
    (each a shuffle + scheduling barrier, ~15 s of fixed latency at any data
    size) collapse into one vectorized numpy pass; entity vocabularies are
    scale-free, so on the 10^12-turn target this path still covers most jobs
    while `verified_pairs` remains the unbounded-dictionary fallback.
    """
    import numpy as np

    from plume_spark.functions.xxh64 import xxh64_ngrams

    if not norms:
        return []
    gram_sets = xxh64_ngrams(norms, 3)  # per-norm unique uint64 gram hashes
    # minhash substrate: tok_id = pmod(signed hash, MINHASH_P), as in _norm_dict
    n_bands = N_HASHES // ROWS_PER_BAND
    a = np.array(dedup_mod.MINHASH_A[:N_HASHES], dtype=np.int64)
    b = np.array(dedup_mod.MINHASH_B[:N_HASHES], dtype=np.int64)
    n = len(norms)
    # Signatures for ALL norms in one affine pass + segmented min — the
    # per-norm Python loop this replaces was ~1 s of the flagship's 4.7 s
    # at sf0.1 (15k norms); same ops, same values, ~10x less interpreter
    # time.  reduceat segments are the per-norm gram runs (all non-empty:
    # gram_array NUL-pads short strings, mirrored by xxh64_ngrams).
    lens = np.array([len(g) for g in gram_sets], dtype=np.int64)
    if lens.min(initial=1) == 0:
        raise ValueError("empty gram set in driver_link_kernel input")
    flat = np.concatenate(gram_sets).view(np.int64) % MINHASH_P  # floored mod == pmod
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    sig_all = (a[:, None] * flat[None, :] + b[:, None]) % MINHASH_P
    mins = np.minimum.reduceat(sig_all, offsets, axis=1)  # (N_HASHES, n)
    assert ROWS_PER_BAND == 2, "packed band key assumes 2 rows per band"
    # lexicographic rank (numpy '<U' compare == Python str compare, both
    # code-point order) orients pairs without per-pair string compares
    norms_arr = np.array(norms)
    rank = np.empty(n, dtype=np.int64)
    rank[np.argsort(norms_arr, kind="stable")] = np.arange(n, dtype=np.int64)
    pair_lo: list[np.ndarray] = []
    pair_hi: list[np.ndarray] = []
    for band in range(n_bands):
        # band key packed into ONE int64 (m0 * P + m1 is injective for
        # mins < P, and P^2 < 2^63): plain-integer np.unique groups ~10x
        # faster than structured/void-view compares.  Identical grouping
        # to the former dict-of-tuples banding — bands never merge.
        m0 = mins[band * ROWS_PER_BAND]
        m1 = mins[band * ROWS_PER_BAND + 1]
        keys = m0 * np.int64(MINHASH_P) + m1
        _, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
        order = np.argsort(inv, kind="stable")
        elig = (counts >= 2) & (counts <= max_bucket_size)
        sel = elig[inv[order]]
        mem = order[sel]  # eligible-bucket members, buckets contiguous
        if mem.size == 0:
            continue
        c = counts[elig].astype(np.int64)
        # ragged within-bucket pair expansion, zero per-bucket Python: the
        # entry at local position p pairs with the (c - 1 - p) entries
        # after it in its bucket (prefix-heavy dictionaries make ~400k
        # candidates from 2-row bands at sf0.1 — the nested Python loops
        # this replaces were ~0.7 s of the flagship build)
        gstart = np.zeros(len(c), dtype=np.int64)
        np.cumsum(c[:-1], out=gstart[1:])
        loc = np.arange(mem.size, dtype=np.int64) - np.repeat(gstart, c)
        reps = np.repeat(c, c) - 1 - loc
        xa = np.repeat(mem, reps)
        rstart = np.zeros(mem.size, dtype=np.int64)
        np.cumsum(reps[:-1], out=rstart[1:])
        incr = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(rstart, reps)
        ya = mem[np.repeat(np.arange(mem.size, dtype=np.int64), reps) + 1 + incr]
        swap = rank[xa] > rank[ya]
        pair_lo.append(np.where(swap, ya, xa))
        pair_hi.append(np.where(swap, xa, ya))
    # exact gram-set keys: one global lexsort + within-segment dedup
    # replaces 15k np.unique calls (same sorted-unique-token key per norm)
    seg_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
    order2 = np.lexsort((flat, seg_ids))
    fs, ss = flat[order2], seg_ids[order2]
    keep = np.ones(len(fs), dtype=bool)
    keep[1:] = (fs[1:] != fs[:-1]) | (ss[1:] != ss[:-1])
    fs, ss = fs[keep], ss[keep]
    seg_starts = np.searchsorted(ss, np.arange(n + 1, dtype=np.int64))
    gramset_groups: dict[bytes, list[int]] = {}
    for i in range(n):
        gramset_groups.setdefault(
            fs[seg_starts[i] : seg_starts[i + 1]].tobytes(), []
        ).append(i)
    # exact-duplicate rescue: norms with IDENTICAL gram sets are J=1
    # duplicates by definition, yet dense regions (e.g. zero-heavy ids) can
    # blow EVERY 2-row band bucket past the cap and silently lose them.
    # Grouping by the exact gram set is an equivalence relation, so star
    # edges (min member -> others) are sound: every pair verifies at J=1 and
    # the connected components are identical to all-pairs — at linear cost.
    # (Minhash FULL-signature grouping is NOT sound here: distinct gram sets
    # can share all 32 minhashes, and a star hub that fails verification
    # would orphan true member-member duplicates.)
    star_lo: list[int] = []
    star_hi: list[int] = []
    for members in gramset_groups.values():
        if len(members) > 1:
            hub = min(members, key=lambda i: rank[i])
            for m in members:
                if m != hub:
                    star_lo.append(hub)
                    star_hi.append(m)
    if star_lo:
        pair_lo.append(np.array(star_lo, dtype=np.int64))
        pair_hi.append(np.array(star_hi, dtype=np.int64))
    if not pair_lo:
        return []
    lo = np.concatenate(pair_lo)
    hi = np.concatenate(pair_hi)
    pk = np.unique(lo * np.int64(n) + hi)  # dedupe across bands/stars
    lo, hi = pk // n, pk % n
    # vectorized exact verify (same size prefilter + exact Jaccard over the
    # RAW uint64 gram sets as before, float64 compare unchanged): padded
    # gram matrix + validity mask, chunked so the (pairs x W x W) equality
    # broadcast stays in cache-friendly blocks
    sa, sb = lens[lo], lens[hi]
    pre = np.minimum(sa, sb) >= tau * np.maximum(sa, sb)
    lo, hi = lo[pre], hi[pre]
    if lo.size == 0:
        return []
    W = int(lens.max())
    raw = np.concatenate(gram_sets).view(np.int64)
    col = np.arange(len(raw), dtype=np.int64) - np.repeat(offsets, lens)
    gm = np.zeros((n, W), dtype=np.int64)
    valid = np.zeros((n, W), dtype=bool)
    gm[seg_ids, col] = raw
    valid[seg_ids, col] = True
    out: list[tuple[str, str]] = []
    for s in range(0, int(lo.size), 8192):
        l, h = lo[s : s + 8192], hi[s : s + 8192]
        eq = (
            (gm[l][:, :, None] == gm[h][:, None, :])
            & valid[l][:, :, None]
            & valid[h][:, None, :]
        )
        inter = eq.sum(axis=(1, 2))
        ok = inter / (lens[l] + lens[h] - inter) >= tau
        out.extend(
            (norms[int(i)], norms[int(j)])
            for i, j in zip(l[ok].tolist(), h[ok].tolist())
        )
    return out


def gram_array(c: Column | str) -> Column:
    """Distinct character 3-grams of a norm string (short strings padded with
    NUL, matching the test oracle's convention)."""
    c = F.col(c) if isinstance(c, str) else c
    padded = F.when(F.length(c) < 3, F.rpad(c, 3, "\x00")).otherwise(c)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(padded) - 2),
            lambda i: F.substring(padded, i, 3),
        )
    )


def _norm_dict(norms: DataFrame, norm: str) -> DataFrame:
    """The per-distinct-norm dictionary every linking stage derives from,
    computed and materialized ONCE: (norm, grams: xxhash64'd gram array,
    g_sz, toks: distinct pmod'd minhash token ids).  Fusing the dictionary
    collapses the former separate distinct-norms scans / gram-id distinct /
    gramset aggregation into one shuffle + pure projections — the fixed
    stage-count constant of the distributed path was the round-2 flag."""
    return (
        norms.select(norm)
        .distinct()
        .select(
            F.col(norm),
            F.transform(gram_array(norm), lambda g: F.xxhash64(g)).alias("grams"),
        )
        .withColumn("g_sz", F.size("grams"))
        .withColumn(
            "toks",
            F.array_distinct(
                F.transform("grams", lambda g: F.pmod(g, F.lit(MINHASH_P)))
            ),
        )
        .localCheckpoint(eager=True)
    )


def candidate_pairs(
    norms: DataFrame,
    norm: str = "norm",
    max_bucket_size: int = MAX_BUCKET_SIZE,
    dict_df: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs over the distinct-norm dictionary.

    Self-join on (band, band_sig); ``norm_a < norm_b`` keeps each unordered
    pair once; distinct BEFORE verify so each pair is verified exactly once
    even when it collides in several bands.  Buckets above ``max_bucket_size``
    are dropped (stop-shingle practice — see module docstring).  ``dict_df``
    (from _norm_dict) lets verified_pairs share one dictionary
    materialization across candidate generation and verify."""
    d = _norm_dict(norms, norm) if dict_df is None else dict_df
    # token ids straight off the dictionary's distinct array — no separate
    # gram-id distinct pass
    ids = d.select(F.col(norm).alias("doc_id"), F.explode("toks").alias("tok_id"))
    sig = minhash_signatures(ids, k=N_HASHES)
    bands = (
        sig.withColumn("band", (F.col("h") / ROWS_PER_BAND).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("h", "minhash"))).alias("rows"))
        .select("doc_id", "band", F.col("rows.minhash").alias("band_sig"))
    )
    # One window pass applies the bucket cap: count per (band, band_sig)
    # partition, drop rows of oversized buckets — replaces a checkpoint +
    # groupBy-count + semi-join (three stages, two materializations; same
    # rewrite as operators/dedup._capped_bands).  Dictionary-sized:
    # materialize once, the self-join reads it twice.
    from pyspark.sql import Window

    wb = Window.partitionBy("band", "band_sig")
    bands = (
        bands.withColumn("_bsz", F.count(F.lit(1)).over(wb))
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
        .localCheckpoint(eager=True)
    )
    a = bands.select(F.col("doc_id").alias("norm_a"), "band", "band_sig")
    b = bands.select(F.col("doc_id").alias("norm_b"), "band", "band_sig")
    banded = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("norm_a") < F.col("norm_b"))
        .select("norm_a", "norm_b")
    )
    # exact-duplicate rescue (mirrors driver_link_kernel): identical gram
    # SETS are J=1 duplicates by definition, yet dense regions can overflow
    # every 2-row band bucket and silently drop them.  The gram set is an
    # equivalence key, so star edges (min member -> others) are sound and
    # linear.  (Full minhash-signature grouping is NOT an equivalence over
    # true duplicates — distinct sets can share all 32 minhashes.)  The set
    # key is a projection of the dictionary (sorted distinct token array),
    # not an aggregation over exploded ids.
    gramsets = d.select(
        F.col(norm).alias("doc_id"), F.sort_array("toks").alias("gset")
    )
    star = (
        gramsets.groupBy("gset")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("members"))
        .filter(F.size("members") > 1)
        .select(
            F.element_at("members", 1).alias("norm_a"),
            F.explode(F.slice("members", 2, F.size("members"))).alias("norm_b"),
        )
    )
    return banded.unionByName(star).distinct()


def verified_pairs(
    norms: DataFrame,
    norm: str = "norm",
    tau: float = JACCARD_TAU,
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> DataFrame:
    """Candidate pairs surviving exact 3-gram Jaccard >= tau.

    Gram arrays are computed ONCE per distinct norm and joined to the pair
    stream (dictionary side broadcasts when small); the Jaccard itself is
    array_intersect arithmetic inside codegen.  A size prefilter removes
    pairs that cannot reach tau (|A∩B| <= min(|A|,|B|), so J >= tau requires
    min >= tau * max) before touching the arrays."""
    # ONE dictionary materialization feeds candidate generation AND both
    # verify sides: gram arrays are xxhash64'd longs (array<long> intersects
    # are ~10x cheaper than array<string> — no per-element string hashing in
    # the hot loop)
    d = _norm_dict(norms, norm)
    cands = candidate_pairs(norms, norm, max_bucket_size, dict_df=d)
    a = d.select(
        F.col(norm).alias("norm_a"), F.col("grams").alias("g_a"), F.col("g_sz").alias("sz_a")
    )
    b = d.select(
        F.col(norm).alias("norm_b"), F.col("grams").alias("g_b"), F.col("g_sz").alias("sz_b")
    )
    # size prefilter rides in the join; the array intersect is projected ONCE
    # after the join (in a join condition Catalyst would evaluate it per
    # conjunct use — measured 5x slower), then filtered.
    prefilter = F.least("sz_a", "sz_b") >= F.lit(tau) * F.greatest("sz_a", "sz_b")
    scored = (
        cands.join(a, "norm_a")
        .join(b, "norm_b")
        .filter(prefilter)
        .select(
            "norm_a",
            "norm_b",
            F.size(F.array_intersect("g_a", "g_b")).alias("inter"),
            "sz_a",
            "sz_b",
        )
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return scored.filter(jac >= F.lit(tau)).select("norm_a", "norm_b")
