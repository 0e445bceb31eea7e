"""Entity linking: MinHash/LSH-blocked candidate generation + exact verify.

Reference analog: Plume links call-sites to methods by exact full-name
(CHANGELOG.md:181 PlumeDynamicCallLinker; CHANGELOG.md:1154-1155 CHA/SPARK call
graphs).  The transcript graft replaces exact-name linking with near-duplicate
surface-form linking: MinHash over character 3-grams, LSH banding to block
candidates, exact Jaccard verification of candidates.

Scale design:
* linking runs over the DISTINCT-norm dictionary, not over mentions — at
  100 TB the dictionary is orders of magnitude smaller than the mention
  stream, so the expensive UDF + self-join touch only distinct strings;
* band keys are exploded JVM-side (posexplode) and the candidate self-join is
  a plain equi-join on (band_idx, band_hash) — Catalyst picks SMJ/BHJ and AQE
  splits skewed bands (a hot norm producing a fat bucket);
* hashing is vectorized numpy inside an Arrow-batched pandas UDF — no per-row
  Python.

Parameters (k=64 hashes, 32 bands x 2 rows) are chosen so a true pair at the
verify threshold (tau=0.55) is missed with probability < 1e-5 — candidate
over-generation is cheap because verification is exact, while a missed pair
is a recall loss.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

N_HASHES = 64
N_BANDS = 32
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_TAU = 0.55

_MERSENNE = np.uint64((1 << 61) - 1)
_rng = np.random.default_rng(1234)  # fixed seed: deterministic across runs
_A = _rng.integers(1, (1 << 61) - 1, size=N_HASHES, dtype=np.uint64)
_B = _rng.integers(0, (1 << 61) - 1, size=N_HASHES, dtype=np.uint64)


def _grams(s: str) -> np.ndarray:
    """Char 3-gram FNV-1a 64 hashes (unique) of a normalized string."""
    if len(s) < 3:
        s = s + "\x00" * (3 - len(s))
    seen = {s[i : i + 3] for i in range(len(s) - 2)}
    out = np.empty(len(seen), dtype=np.uint64)
    for j, g in enumerate(seen):
        h = np.uint64(0xCBF29CE484222325)
        for b in g.encode():
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[j] = h
    return out


def _minhash(s: str) -> np.ndarray:
    g = _grams(s) % _MERSENNE
    # (k, |g|) universal hashes -> row-wise min
    vals = (np.outer(_A, g) + _B[:, None]) % _MERSENNE
    return vals.min(axis=1)


@pandas_udf(T.ArrayType(T.LongType()))
def minhash_signature(norms: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Vectorized (Arrow-batched) minhash signature per norm string."""
    for batch in norms:
        yield batch.map(lambda s: [int(x) for x in _minhash(s)])


def band_keys(df: DataFrame, norm: str = "norm") -> DataFrame:
    """norm -> exploded (band_idx, band_hash) rows.  Band hash folds the
    band's rows JVM-side so the UDF output stays one array per norm."""
    sig = df.withColumn("sig", minhash_signature(F.col(norm)))
    bands = F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[F.element_at("sig", b * ROWS_PER_BAND + r + 1) for r in range(ROWS_PER_BAND)],
            )
            for b in range(N_BANDS)
        ]
    )
    return (
        sig.withColumn("band", bands)
        .select(norm, F.posexplode("band").alias("band_idx", "band_hash"))
    )


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("norm_a", T.StringType()),
        T.StructField("norm_b", T.StringType()),
        T.StructField("jaccard", T.DoubleType()),
    ]
)


def _verify_batch(pdf: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in pdf:
        if len(b) == 0:
            yield pd.DataFrame({"norm_a": [], "norm_b": [], "jaccard": []})
            continue
        cache: dict[str, set] = {}

        def gs(s: str) -> set:
            if s not in cache:
                if len(s) < 3:
                    s2 = s + "\x00" * (3 - len(s))
                else:
                    s2 = s
                cache[s] = {s2[i : i + 3] for i in range(len(s2) - 2)}
            return cache[s]

        jac = [
            len(gs(a) & gs(b)) / len(gs(a) | gs(b)) if gs(a) | gs(b) else 0.0
            for a, b in zip(b["norm_a"], b["norm_b"])
        ]
        yield pd.DataFrame({"norm_a": b["norm_a"], "norm_b": b["norm_b"], "jaccard": jac})


MAX_BUCKET_SIZE = 100


def candidate_pairs(
    norms: DataFrame, norm: str = "norm", max_bucket_size: int = MAX_BUCKET_SIZE
) -> DataFrame:
    """LSH candidate pairs over the distinct-norm dictionary.

    Self-join on band key; ``norm_a < norm_b`` keeps each unordered pair once.
    Distinct BEFORE verify so each pair is verified exactly once even when it
    collides in several bands.

    ``max_bucket_size``: band buckets larger than this are dropped before the
    self-join — standard LSH practice (an oversized bucket is a stop-shingle:
    non-discriminative, and its pair count is quadratic).  This is the
    skew-kill for dense similarity clusters: without it, a cluster of k
    mutually-similar norms costs O(k^2) candidates per band.  True alias
    groups are orders of magnitude smaller than the cap."""
    keys = band_keys(norms.select(norm).distinct(), norm)
    ok_buckets = (
        keys.groupBy("band_idx", "band_hash")
        .count()
        .filter(F.col("count") <= max_bucket_size)
        .select("band_idx", "band_hash")
    )
    keys = keys.join(ok_buckets, ["band_idx", "band_hash"], "left_semi")
    a = keys.select(F.col(norm).alias("norm_a"), "band_idx", "band_hash")
    b = keys.select(F.col(norm).alias("norm_b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("norm_a") < F.col("norm_b"))
        .select("norm_a", "norm_b")
        .distinct()
    )


def verified_pairs(norms: DataFrame, norm: str = "norm", tau: float = JACCARD_TAU) -> DataFrame:
    """Candidate pairs surviving exact 3-gram Jaccard >= tau."""
    cands = candidate_pairs(norms, norm)
    verified = cands.mapInPandas(_verify_batch, schema=_PAIR_SCHEMA)
    return verified.filter(F.col("jaccard") >= F.lit(tau)).select("norm_a", "norm_b")
