"""Fixed-iteration PageRank over an edge list — the second iterative graph
algorithm beside connected components (operators/components.py), recasting the
reference's iterative whole-graph passes (PlumeForkJoinParallelCpgPass's
part-loop shape) as repeated hash joins.

Scale shape (the same playbook as the CC loop):
* one shuffle per iteration: contributions group by destination with a SUM —
  an algebraic aggregate, so hot entities (the north rule's skew case) arrive
  at the reducer as map-side-combined partials, never raw rows;
* the rank table is node-sized, orders of magnitude smaller than the edge
  list; the per-iteration join against edges shuffles ranks, not edges, once
  the edge list is hash-partitioned on ``src`` (AQE re-uses the exchange);
* ``localCheckpoint`` every ``checkpoint_every`` iterations truncates the
  lineage so plan size stays O(1) in the iteration count.

Variant: the "no dangling redistribution" formulation (a sink node's rank
leaks), which keeps every iteration a pure local join+agg — no global sum
barrier per step — and makes the result exactly expressible as unrolled SQL
CTEs for the DuckDB oracle.  Ranks are returned in parts-per-million so the
cross-engine comparison is integer-exact despite float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    n_iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Returns (node, rank_ppm): PageRank after ``n_iters`` synchronous
    iterations from a uniform start of 1.0, scaled to parts-per-million
    (BIGINT) for engine-exact comparison."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.withColumn("r", F.lit(1.0))
    for i in range(n_iters):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("node"), (F.col("r") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("r"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node", F.round(F.col("r") * 1_000_000).cast("long").alias("rank_ppm")
    )


def hits(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    n_iters: int = 2,
    checkpoint_every: int = 4,
) -> DataFrame:
    """HITS hubs/authorities after ``n_iters`` synchronous unnormalized
    iterations (a <- E^T h; h <- E a), normalized ONCE at the end by the
    max of each score — (node, hub_score, auth_score), rounded to 6dp.

    Skipping per-iteration normalization is the determinism trick: from the
    all-ones start every intermediate score is an integer-valued double
    (sums of integers are exact in binary64 far below 2^53), so the only
    float operation in the whole computation is the final division by the
    max — identical on every engine and under every partitioning.  The
    scale shape matches pagerank(): one map-side-combinable SUM shuffle per
    half-iteration, node-sized score tables joined against the (far larger,
    src/dst-hash-partitioned) edge list, localCheckpoint lineage
    truncation."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = nodes.withColumn("h", F.lit(1.0))
    a = None
    for i in range(n_iters):
        contrib_a = (
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("s"))
        )
        a = nodes.join(contrib_a, "node", "left").select(
            "node", F.coalesce(F.col("s"), F.lit(0.0)).alias("a")
        )
        contrib_h = (
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("s"))
        )
        h = nodes.join(contrib_h, "node", "left").select(
            "node", F.coalesce(F.col("s"), F.lit(0.0)).alias("h")
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iters:
            h = h.localCheckpoint(eager=True)
            a = a.localCheckpoint(eager=True)
    m = h.agg(F.max("h").alias("mh")).crossJoin(a.agg(F.max("a").alias("ma")))
    return (
        h.join(a, "node")
        .crossJoin(F.broadcast(m))
        .select(
            "node",
            F.round(F.col("h") / F.col("mh"), 6).alias("hub_score"),
            F.round(F.col("a") / F.col("ma"), 6).alias("auth_score"),
        )
    )


def hits_oracle_sql(edges_sql: str, n_iters: int = 2) -> str:
    """The exact computation above as unrolled SQL CTEs (DuckDB-runnable);
    ``edges_sql`` must select (subj, obj).  Kept next to the operator so the
    iteration count can never drift between engines."""
    parts = [
        f"WITH e AS (SELECT DISTINCT subj AS src, obj AS dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        # CAST keeps the whole chain in binary64 (a bare 1.0 literal is
        # DECIMAL in DuckDB; the final division must be double/double to
        # match Spark bit-for-bit before the 6dp round)
        "h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS h FROM nodes)",
    ]
    for i in range(n_iters):
        parts.append(
            f"a{i + 1} AS (SELECT n.node, COALESCE(SUM(h{i}.h), 0) AS a "
            f"FROM nodes n LEFT JOIN e ON e.dst = n.node "
            f"LEFT JOIN h{i} ON h{i}.node = e.src GROUP BY n.node)"
        )
        parts.append(
            f"h{i + 1} AS (SELECT n.node, COALESCE(SUM(a{i + 1}.a), 0) AS h "
            f"FROM nodes n LEFT JOIN e ON e.src = n.node "
            f"LEFT JOIN a{i + 1} ON a{i + 1}.node = e.dst GROUP BY n.node)"
        )
    k = n_iters
    return (
        ", ".join(parts)
        + f""" SELECT h{k}.node,
               CAST(round(h{k}.h / (SELECT max(h) FROM h{k}), 6) AS DOUBLE)
                 AS hub_score,
               CAST(round(a{k}.a / (SELECT max(a) FROM a{k}), 6) AS DOUBLE)
                 AS auth_score
        FROM h{k} JOIN a{k} ON a{k}.node = h{k}.node"""
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    n_iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Personalized PageRank: the teleport mass returns to the SEED set
    instead of spreading uniformly — the "entities related to X" primitive
    for KG exploration and recommendation candidate generation (global
    PageRank answers "what is important"; PPR answers "what is important
    NEAR these nodes").  ``seeds`` is a 1-column DataFrame of node ids;
    r0 = 1 on seeds / 0 elsewhere, r_{i+1} = (1-d)*seed_ind + d*push.

    Scale: the rank table stays SPARSE — teleport mass exists only on the
    seeds and pushed mass only on nodes within i hops of one, so each
    iteration's join touches the frontier, not the graph (global
    PageRank's node-sized rank table would be the wrong shape here: with a
    handful of seeds over 10^9 nodes, >99.999% of its rows would carry an
    exact 0.0 through every join).  Per iteration: one edges-to-frontier
    hash join + one map-side-combined sum — mass-carrying rows only.  A
    node never reached holds rank exactly 0.0 = 0 ppm, identical to what
    the dense recurrence would produce, so sparsity changes no output row
    (the rank_ppm > 0 filter is the contract either way)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # seeds outside the graph get teleport mass but can neither push nor
    # receive — the dense formulation iterates over graph nodes only, so
    # restrict the base the same way to stay value-identical
    base = (
        seeds.toDF("node")
        .distinct()
        .join(nodes, "node", "left_semi")
        .select("node", F.lit(1.0 - damping).alias("base"))
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # r0 = seed indicator (1.0 on seeds): expressed sparsely as base/(1-d)
    ranks = base.select("node", (F.col("base") / F.lit(1.0 - damping)).alias("r"))
    for i in range(n_iters):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("node"), (F.col("r") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        # (1-d)*ind + d*push, rows existing only where either term does;
        # 0.15*1.0 and 0.85*s are the exact same float products the dense
        # ind-join formulation computes, so values are bit-identical
        ranks = base.join(contribs, "node", "full").select(
            "node",
            (
                F.coalesce(F.col("base"), F.lit(0.0))
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("r"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iters:
            ranks = ranks.localCheckpoint(eager=True)
    # rank_ppm compared EXACTLY against the unrolled-CTE oracle — the same
    # contract g1_pagerank has carried green since round 2.  This works
    # (rather than flaking on float summation order) because both sides
    # run the identical float products in the identical order: the sparse
    # fold above reproduces the dense formulation's 0.15*1.0 / 0.85*s
    # term-by-term (see the loop comment), and the per-node contribution
    # sum has <= out-degree terms whose |error| stays far below the 0.5e-6
    # rounding boundary at every tested scale (the property test's ±1 ppm
    # headroom has never been consumed cross-engine).
    return ranks.select(
        "node", F.round(F.col("r") * 1_000_000).cast("long").alias("rank_ppm")
    ).filter(F.col("rank_ppm") > 0)


def ppr_oracle_sql(
    edges_sql: str, seeds_sql: str, n_iters: int = 3, damping: float = 0.85
) -> str:
    """Unrolled-CTE twin of :func:`personalized_pagerank` — ``edges_sql``
    selects (subj, obj), ``seeds_sql`` selects one column aliased ``node``."""
    d = damping
    parts = [
        f"WITH e AS (SELECT DISTINCT subj AS src, obj AS dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"s AS (SELECT DISTINCT node FROM ({seeds_sql}))",
        "ind AS (SELECT n.node, CASE WHEN EXISTS (SELECT 1 FROM s WHERE "
        "s.node = n.node) THEN 1.0 ELSE 0.0 END AS ind FROM nodes n)",
        "deg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src)",
        "r0 AS (SELECT node, ind AS r FROM ind)",
    ]
    for i in range(n_iters):
        parts.append(
            f"r{i + 1} AS (SELECT n.node, {1.0 - d} * n.ind + {d} * "
            f"COALESCE(SUM(r{i}.r / deg.out_deg), 0) AS r "
            f"FROM ind n LEFT JOIN e ON e.dst = n.node "
            f"LEFT JOIN deg ON deg.src = e.src "
            f"LEFT JOIN r{i} ON r{i}.node = e.src GROUP BY n.node, n.ind)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_ppm"
        f" FROM r{n_iters} WHERE ROUND(r * 1000000) > 0"
    )


def pagerank_oracle_sql(edges_sql: str, n_iters: int = 3, damping: float = 0.85) -> str:
    """The exact computation above as unrolled SQL CTEs (DuckDB-runnable):
    ``edges_sql`` must select columns (subj, obj).  Kept next to the operator
    so the iteration count / damping can never drift between engines."""
    d = damping
    parts = [
        f"WITH e AS (SELECT DISTINCT subj AS src, obj AS dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src)",
        "r0 AS (SELECT node, 1.0 AS r FROM nodes)",
    ]
    for i in range(n_iters):
        parts.append(
            f"r{i + 1} AS (SELECT n.node, {1.0 - d} + {d} * COALESCE(SUM(r{i}.r / deg.out_deg), 0) AS r "
            f"FROM nodes n LEFT JOIN e ON e.dst = n.node "
            f"LEFT JOIN deg ON deg.src = e.src "
            f"LEFT JOIN r{i} ON r{i}.node = e.src GROUP BY n.node)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_ppm FROM r{n_iters}"
    )
