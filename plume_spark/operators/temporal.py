"""Temporal joins Spark has no native operator for: as-of join and bounded
range join, both built as compositions of shuffle-friendly primitives (the
brief's custom-operator tier (a): existing DataFrame ops, no UDF).

As-of join — "for each left row, the most recent right row at or before its
timestamp, per key" — is THE standard enrichment join for event streams
(attach the latest profile/state/quote to each fact).  The naive formulation
is an inequality join (quadratic: every left row against every earlier right
row); the scale form here is the union-window trick:

    tag rows, union both sides, one window per key ordered by (ts, tag),
    last(value, ignorenulls) carries the latest right value forward

— exactly ONE shuffle on the key, linear work, and skew behaves like any
window (a hot key is one partition's sort, not a quadratic blowup).

Range join — "count/collect right rows within [ts-lo, ts+hi] of each left
row" — buckets time into epochs of the window width: each right row lands in
one bucket, each left row probes the (bounded, ~2-3) buckets its window can
overlap, equi-join on (key, bucket), then exact-filter.  Candidate volume is
|right| * O(1) instead of |left| * |right| per key.

Interval overlap join — "all pairs of intervals that overlap in time" — the
same bucketing idea applied symmetrically: every interval explodes to the
time buckets it touches, pairs equi-join on bucket, the exact overlap
predicate filters, and each surviving pair is COUNTED ONCE by pinning it to
the bucket of its later start (both intervals of an overlapping pair cover
max(start_a, start_b), so both exploded into that bucket — the standard
dedup rule for grid-blocked spatial joins).  Candidate volume is
sum-per-bucket |a||b| instead of |intervals|^2; the bucket span is the skew
knob (residual hot buckets are AQE skew-join territory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_vals: tuple[str, ...] = ("event_id",),
    strict: bool = False,
    prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``prefix<val>`` columns from the
    latest right row with right_ts <= left_ts (``strict``: <) on the same key.
    Unmatched left rows keep nulls (LEFT semantics).

    Right rows are first collapsed to one per (key, right_ts) keeping the
    max-value row — ties at one timestamp are otherwise nondeterministic in
    ANY engine's as-of (DuckDB included), and cross-engine comparison needs a
    total function.  Left-side duplicate timestamps are fine as-is (each left
    row reads only carried-forward right values, never other left rows).
    """
    # sort tags: the side that must be visible at equal ts sorts FIRST
    # (non-strict: rights first => a right at ts==left_ts is carried into the
    #  left row; strict: lefts first => it is not)
    right_tag, left_tag = (1, 0) if strict else (0, 1)
    # the whole left row rides along as a native struct (no serialization, no
    # type loss); the right side carries a typed null of the same struct
    lrow_type = left.select(F.struct(*left.columns).alias("_lrow")).schema["_lrow"].dataType
    r1 = (
        right.groupBy(F.col(key).alias(key), F.col(right_ts).alias("_ts"))
        .agg(*[F.max(v).alias(f"_rv_{v}") for v in right_vals])
        .withColumn("_tag", F.lit(right_tag))
        .withColumn("_lrow", F.lit(None).cast(lrow_type))
    )
    l1 = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias("_tag"),
        F.struct(*left.columns).alias("_lrow"),
        *[
            F.lit(None).cast(dict(right.dtypes)[v]).alias(f"_rv_{v}")
            for v in right_vals
        ],
    ).select(key, "_ts", "_tag", *[f"_rv_{v}" for v in right_vals], "_lrow")
    both = l1.unionByName(r1.select(l1.columns))
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        "_tag",
        "_lrow",
        *[F.last(f"_rv_{v}", ignorenulls=True).over(w).alias(f"_m_{v}") for v in right_vals],
    ).filter(F.col("_tag") == left_tag)
    return carried.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m_{v}").alias(f"{prefix}{v}") for v in right_vals],
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    before_s: int = 3600,
    after_s: int = 0,
    count_col: str = "n_in_range",
) -> DataFrame:
    """For each left row, the count of right rows on the same key with
    right_ts in [left_ts - before_s, left_ts + after_s] (inclusive, exact
    timestamp precision).

    Bucketing is on epoch SECONDS (conservative: a bucket candidate set is a
    superset of the exact window) while the final filter compares raw
    timestamps, so sub-second precision is never lost.  Bucket width = the
    full window span, so each left row probes at most 2-3 consecutive buckets
    — candidate volume stays linear.  Left rows must be distinct (carry a
    primary key): counts are grouped by the whole left row.
    """
    span = max(before_s + after_s, 1)
    r1 = right.select(
        F.col(key),
        F.col(right_ts).alias("_rts"),
        (F.unix_timestamp(right_ts) / span).cast("long").alias("_bucket"),
    )
    lo_ts = F.col(left_ts) - F.expr(f"INTERVAL {int(before_s)} SECOND")
    hi_ts = F.col(left_ts) + F.expr(f"INTERVAL {int(after_s)} SECOND")
    lsec = F.unix_timestamp(F.col(left_ts))
    l1 = (
        left.withColumn("_lo", lo_ts)
        .withColumn("_hi", hi_ts)
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    ((lsec - before_s) / span).cast("long"),
                    ((lsec + after_s) / span).cast("long"),
                )
            ),
        )
    )
    joined = l1.join(r1, [key, "_bucket"]).filter(
        (F.col("_rts") >= F.col("_lo")) & (F.col("_rts") <= F.col("_hi"))
    )
    counts = joined.groupBy(*[F.col(c) for c in left.columns]).agg(
        F.count(F.lit(1)).alias(count_col)
    )
    # LEFT semantics: rows whose window is empty still appear, with 0
    return (
        left.join(counts, left.columns, "left")
        .withColumn(count_col, F.coalesce(count_col, F.lit(0)))
    )


def interval_overlap_pairs(
    intervals: DataFrame,
    id_cols: tuple[str, ...],
    start: str = "s_start",
    end: str = "s_end",
    span_s: int = 3600,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All pairs of overlapping intervals (inclusive endpoints), each pair
    once with struct(id_cols) ascending, plus ``overlap_us`` (microseconds of
    overlap, exact int64 — engine-portable where float seconds are not).

    Scale form (module docstring): explode each interval over the time
    buckets it covers, self-equi-join on bucket, exact-filter the overlap
    predicate, and keep a pair only in the bucket of its later start so no
    pair is emitted twice.  Work is sum-per-bucket |a|x|b| — linear in
    bucketed interval length for dispersed data; ``span_s`` trades explode
    fan-out (small spans) against per-bucket candidate volume (large spans).
    """
    span = max(int(span_s), 1)
    base = intervals.select(*id_cols, start, end).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("timestamp").cast("double") / span).cast("long"),
                F.floor(F.col(end).cast("timestamp").cast("double") / span).cast("long"),
            )
        ),
    )
    a, b = base.alias("a"), base.alias("b")
    sa, ea = F.col(f"a.{start}"), F.col(f"a.{end}")
    sb, eb = F.col(f"b.{start}"), F.col(f"b.{end}")
    ida = F.struct(*[F.col(f"a.{c}") for c in id_cols])
    idb = F.struct(*[F.col(f"b.{c}") for c in id_cols])
    later_start = F.greatest(sa, sb)
    return (
        a.join(b, F.col("a._bucket") == F.col("b._bucket"))
        .filter(ida < idb)
        .filter((sa <= eb) & (sb <= ea))
        .filter(
            F.col("a._bucket")
            == F.floor(later_start.cast("timestamp").cast("double") / span).cast("long")
        )
        .select(
            *[F.col(f"a.{c}").alias(f"{c}{suffixes[0]}") for c in id_cols],
            *[F.col(f"b.{c}").alias(f"{c}{suffixes[1]}") for c in id_cols],
            (
                F.unix_micros(F.least(ea, eb).cast("timestamp"))
                - F.unix_micros(later_start.cast("timestamp"))
            ).alias("overlap_us"),
        )
    )


def peak_concurrency(
    intervals: DataFrame, start: str = "s_start", end: str = "s_end"
) -> DataFrame:
    """Sweep-line concurrency: per calendar day, the PEAK number of
    simultaneously-active intervals and the number of intervals active that
    day — the capacity/load read (max concurrent sessions, peak open
    connections) run over sessionized event streams.  Intervals are closed
    ([start, end]); two intervals touching end-to-start count as concurrent,
    matching interval_overlap_pairs' inclusive predicate.

    Scale form: the classic +1/-1 sweep needs a GLOBAL time ordering — a
    single-partition window that serializes at any real volume.  Instead
    each interval explodes to the calendar days it covers, clipped to the
    day's bounds, and the sweep runs per day: one shuffle on day, each
    partition sorting only its own day's endpoints.  Day volume is bounded
    by daily traffic, not corpus size, and a hot day is one partition's
    sort (AQE skew territory), never a global serialization.  Tie rule:
    at equal timestamps starts sort before ends (delta DESC), so touching
    intervals register as concurrent; equal (t, delta) rows commute under
    the running max, making the per-day peak order-independent and
    engine-portable."""
    s = F.col(start).cast("timestamp")
    e = F.col(end).cast("timestamp")
    seg = intervals.select(
        F.explode(F.sequence(F.to_date(s), F.to_date(e))).alias("day"),
        s.alias("_s"),
        e.alias("_e"),
    ).select(
        "day",
        F.greatest(F.col("_s"), F.col("day").cast("timestamp")).alias("cs"),
        F.least(F.col("_e"), F.date_add(F.col("day"), 1).cast("timestamp")).alias("ce"),
    )
    pts = seg.select("day", F.col("cs").alias("t"), F.lit(1).alias("delta")).unionAll(
        seg.select("day", F.col("ce").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.withColumn("_run", F.sum("delta").over(w))
        .groupBy("day")
        .agg(
            F.max("_run").cast("long").alias("peak_concurrency"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_active"),
        )
    )


def peak_concurrency_oracle_sql(sessions_sql: str) -> str:
    """DuckDB-SQL twin of peak_concurrency over a ``sessions_sql`` yielding
    (s_start, s_end) timestamps — generated next to the operator so the
    day-clipping and tie rule stay in lockstep."""
    return f"""
        WITH sess AS MATERIALIZED (SELECT s_start, s_end FROM ({sessions_sql})),
        seg AS (
          SELECT CAST(d AS DATE) AS day,
                 greatest(s_start, CAST(CAST(d AS DATE) AS TIMESTAMP)) AS cs,
                 least(s_end, CAST(CAST(d AS DATE) + INTERVAL 1 DAY AS TIMESTAMP)) AS ce
          FROM sess, unnest(generate_series(CAST(CAST(s_start AS DATE) AS TIMESTAMP),
                                            CAST(CAST(s_end AS DATE) AS TIMESTAMP),
                                            INTERVAL 1 DAY)) AS u(d)),
        pts AS (
          SELECT day, cs AS t, 1 AS delta FROM seg
          UNION ALL
          SELECT day, ce AS t, -1 AS delta FROM seg),
        run AS (
          SELECT day, delta,
                 sum(delta) OVER (PARTITION BY day ORDER BY t ASC, delta DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
          FROM pts)
        SELECT day,
               CAST(max(c) AS BIGINT) AS peak_concurrency,
               CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_active
        FROM run GROUP BY day"""
