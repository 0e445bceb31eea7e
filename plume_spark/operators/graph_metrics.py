"""Graph metrics over co-occurrence structure: edge generation + triangles.

Co-occurrence is the transcript-KG reading of the reference's implicit
entity relations (entities co-mentioned in one conversation ~ items sharing
a group); triangle counting is the standard cohesion metric over that graph.
Both are pure DataFrame algebra with exact SQL oracles.

Scale notes:
* co_occurrence_edges pairs items WITHIN a group — inherently quadratic in
  group size, so hub groups are dropped via a window-count cap (same
  degenerate-bucket policy as the LSH band cap in operators/dedup.py).
  Candidate volume is then bounded by cap * n_groups.
* triangle_count uses degree-ordered orientation: every edge points from
  the (degree, id)-lesser endpoint to the greater, each triangle is counted
  exactly once, and the wedge join's fan-out is bounded by the FORWARD
  degree (O(sqrt(m)) per node on skewed graphs) instead of the raw degree —
  the textbook trick that makes distributed triangle counting survive
  power-law hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# hub-group cap shared by the operator and its oracle generators — one
# constant so the SQL can never silently diverge from the engine default
DEFAULT_MAX_GROUP_SIZE = 30


def co_occurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int = DEFAULT_MAX_GROUP_SIZE,
) -> DataFrame:
    """Undirected co-occurrence edges (a, b, n_groups), a < b: item pairs
    sharing at least one group, weighted by how many groups they share.
    Groups larger than ``max_group_size`` are dropped as hubs."""
    items = df.select(
        F.col(group_col).alias("grp"), F.col(item_col).alias("item")
    ).distinct()
    if max_group_size:
        wg = Window.partitionBy("grp")
        items = (
            items.withColumn("_gsz", F.count(F.lit(1)).over(wg))
            .filter(F.col("_gsz") <= max_group_size)
            .drop("_gsz")
            # consumed by both sides of the self-join below (same shape and
            # reasoning as dedup._capped_bands)
            .localCheckpoint(eager=True)
        )
    a = items.select("grp", F.col("item").alias("a"))
    b = items.select("grp", F.col("item").alias("b"))
    return (
        a.join(b, "grp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_groups"))
    )


def triangle_count(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle participation counts -> (node, n_triangles).

    Orientation: each undirected edge points from its (degree, id)-lesser
    endpoint to the greater; a triangle x-y-z with rank x < y < z is found
    exactly once as wedge x->y->z closed by x->z.  Nodes in no triangle are
    absent (join with the node set to zero-fill if needed)."""
    # canonicalize: accept any orientation (including the symmetric both-ways
    # representation) and drop self-loops — a doubled edge set would double
    # every degree and count each triangle 8x
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    lesser = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    fwd = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lesser, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lesser, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    e1 = fwd.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = fwd.select(F.col("u").alias("y"), F.col("v").alias("z"))
    wedges = e1.join(e2, "y")
    closing = fwd.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tris = wedges.join(closing, ["x", "z"])
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def _items_cte(items_sql: str, max_group_size: int) -> str:
    """Shared capped-items CTE prefix; a falsy cap disables the filter,
    mirroring the engine's truthiness check exactly."""
    cap = (
        f"""items AS (SELECT i.grp, i.item FROM items0 i JOIN gsz USING (grp)
                  WHERE gsz.n <= {max_group_size})"""
        if max_group_size
        else "items AS (SELECT grp, item FROM items0)"
    )
    return f"""
        WITH items0 AS (SELECT DISTINCT grp, item FROM ({items_sql})),
        gsz AS (SELECT grp, count(*) AS n FROM items0 GROUP BY grp),
        {cap}"""


def cooccur_oracle_sql(items_sql: str, max_group_size: int = DEFAULT_MAX_GROUP_SIZE) -> str:
    """DuckDB-SQL twin of co_occurrence_edges over ``items_sql`` yielding
    (grp, item) — generated next to the operator (same pattern as
    components_oracle_sql) so the cap stays in lockstep."""
    return (
        _items_cte(items_sql, max_group_size)
        + """
        SELECT a.item AS a, b.item AS b, count(*) AS n_groups
        FROM items a JOIN items b ON a.grp = b.grp AND a.item < b.item
        GROUP BY a.item, b.item"""
    )


def triangle_oracle_sql(items_sql: str, max_group_size: int = DEFAULT_MAX_GROUP_SIZE) -> str:
    """DuckDB-SQL twin of co_occurrence_edges + triangle_count over an
    ``items_sql`` yielding (grp, item) — generated next to the operator so
    the two stay in lockstep.  (MATERIALIZED CTEs are DuckDB dialect — the
    oracle runner is DuckDB; on another engine drop the keyword.)"""
    return (
        _items_cte(items_sql, max_group_size)
        + f""",
        e AS MATERIALIZED (
          SELECT DISTINCT a.item AS a, b.item AS b
          FROM items a JOIN items b ON a.grp = b.grp AND a.item < b.item),
        deg AS MATERIALIZED (
          SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node),
        fwd AS MATERIALIZED (
          SELECT CASE WHEN (da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b))
                      THEN e.a ELSE e.b END AS u,
                 CASE WHEN (da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b))
                      THEN e.b ELSE e.a END AS v
          FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
        tris AS MATERIALIZED (
          SELECT w.x, w.y, w.z
          FROM (SELECT e1.u AS x, e1.v AS y, e2.v AS z
                FROM fwd e1 JOIN fwd e2 ON e1.v = e2.u) w
          JOIN fwd c ON c.u = w.x AND c.v = w.z)
        SELECT node, count(*) AS n_triangles FROM (
          SELECT x AS node FROM tris
          UNION ALL SELECT y FROM tris
          UNION ALL SELECT z FROM tris)
        GROUP BY node"""
    )
