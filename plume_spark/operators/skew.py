"""Hot-key skew control for the iterative hash joins (north rule: "iterative
hash-join style, salted to kill skew").

Layered defense, cheapest first:
1. algebraic aggregations (min/count/sum) are partial (map-side combine) —
   a hot key receives pre-combined partials, never raw rows;
2. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
   session.py) re-plans oversized partitions at runtime;
3. explicit salting (this module) for the residual case AQE cannot fix:
   one key so hot its rows dwarf a partition on the PROBE side while the
   BUILD side must be replicated per salt.

``salted_join`` replicates the (small, possibly-hot-keyed) right side R ways
and scatters the left side's rows uniformly across the replicas, so a key
with 100M occurrences becomes R keys with 100M/R each — bounded by choosing
R ~ ceil(max_key_rows / target_partition_rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` with ``right`` on ``key`` with R-way salt scatter.

    ``right`` must be the smaller side (it is replicated ``n_salts`` times —
    build-side cost is R * |right|).  For the supported ``how`` values
    (inner / left / left_semi / left_anti) row-level semantics are identical
    to ``left.join(right, key, how)``: every left row joins the full right
    key-group because that group exists under every salt value, and an
    unmatched left row is emitted exactly once (it carries one salt).
    right / full / right_semi-style joins are NOT supported: replication
    would emit every unmatched right row ``n_salts`` times.

    The left salt is a DETERMINISTIC hash of the whole left row (not rand()):
    task retries re-derive the same salt, and distinct rows of a hot key
    scatter uniformly.  Exact-duplicate left rows share a salt — dedupe
    before salting if duplicates of one hot key dominate.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "the replicated right side would duplicate unmatched right rows"
        )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    right_rep = right.withColumn(SALT_COL, F.explode(salts))
    left_salted = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)).cast("int")
    )
    return left_salted.join(right_rep, [key, SALT_COL], how).drop(SALT_COL)


def hot_keys(df: DataFrame, key: str, top_n: int = 20, min_count: int = 2) -> DataFrame:
    """Skew diagnostic: the ``top_n`` heaviest values of ``key`` with their
    row counts and share of the table — what an operator inspects BEFORE
    choosing n_salts (R ~ ceil(max_key_rows / target_partition_rows)) or
    deciding a key needs AQE skew splitting.

    Cost shape: one partial-aggregated groupBy (hot keys arrive at the
    reducer as pre-combined partials) + a broadcast scalar for the total —
    safe to run on the full 100 TB fact table.

    Columns: key_value (string), cnt, share (fraction of all rows, 6dp).
    """
    # total rides in the plan as a broadcast one-row cross join: building
    # this DataFrame stays lazy (no driver-side count at construction time)
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        df.groupBy(F.col(key).cast("string").alias("key_value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("cnt") / F.col("_total"), 6))
        .drop("_total")
        .orderBy(F.col("cnt").desc(), F.col("key_value"))
        .limit(top_n)
    )
