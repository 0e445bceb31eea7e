"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k against a query vector; the baseline.
  All arithmetic via F.zip_with/F.aggregate (JVM-side, codegen) — no UDF.
* lsh_buckets — random-hyperplane signs with integer pseudo-weights
  (deterministic, engine-portable); the blocking path for pairwise search.
* blocked_cosine_pairs — near-dup pairs within coarse blocks (label column or
  LSH bucket): the IVF-style scale path — at 100 TB you never all-pairs, you
  bucket then verify within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
# integer pseudo-random plane weights: w(p, i) = ((i+1)*2654435761 + (p+1)*40503) % 8191 - 4095
_W_MUL_I = 2654435761
_W_MUL_P = 40503
_W_MOD = 8191
_W_OFF = 4095


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the embedding of ``query_vec_id``.

    The 1-row query side is a broadcast cross join — every executor scores
    its partition locally; the only shuffle is the final top-k (TakeOrdered).
    """
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        _as_double(F.col(vec_col)).alias("qvec")
    )
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine(_as_double(F.col(vec_col)), F.col("qvec")), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(k)


def lsh_buckets(
    embeddings: DataFrame, n_planes: int = N_PLANES,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): sign bits against n_planes integer hyperplanes.

    Weights are a pure arithmetic function of (plane, dim) — no weight table
    to broadcast, no randomness to persist, identical across engines/runs.
    """
    v = _as_double(F.col(vec_col))
    bucket = None
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(1), F.size(vec_col)),
                lambda x, i: x
                * (((i * _W_MUL_I + (p + 1) * _W_MUL_P) % _W_MOD) - _W_OFF),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return embeddings.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def blocked_cosine_pairs(
    embeddings: DataFrame, block_col: str, tau: float = 0.9,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (cosine >= tau) within blocks — IVF-style:
    the pairwise join is confined to same-block vectors, so cost is
    sum(block^2) not total^2.  ``block_col`` may be a data column (label)
    or the output of lsh_buckets joined on."""
    a = embeddings.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("vec_a"),
        _as_double(F.col(vec_col)).alias("va"),
    )
    b = embeddings.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("vec_b"),
        _as_double(F.col(vec_col)).alias("vb"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= tau)
    )


def ivf_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 10, n_centroids: int = 8,
    n_probe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: centroids = the first ``n_centroids``
    vectors by id (deterministic seeding, KMeans-free); every vector is
    assigned to its nearest centroid; the query probes its ``n_probe``
    nearest cells and scores only those members.

    The centroid table is tiny -> broadcast; assignment is one map-side pass.
    """
    cents = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    assigned = (
        embeddings.crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("emb"),
            "cent_id",
            cosine(_as_double(F.col(vec_col)), F.col("cvec")).alias("sim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cent_id"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("vec_id", "emb", "cent_id")
    )
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        _as_double(F.col(vec_col)).alias("qvec")
    )
    probe_cells = (
        cents.crossJoin(F.broadcast(q))
        .select("cent_id", cosine(F.col("cvec"), F.col("qvec")).alias("sim"))
        .orderBy(F.col("sim").desc(), "cent_id")
        .limit(n_probe)
        .select("cent_id")
    )
    return (
        assigned.join(F.broadcast(probe_cells), "cent_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", F.round(cosine(_as_double(F.col("emb")), F.col("qvec")), 4).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )
