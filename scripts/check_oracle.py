"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values.  Usage: python scripts/check_oracle.py
[sf_dir] [query ...]

Also importable (``run_check``) — tests/test_contract_oracle.py wires it into
pytest so a new contract query cannot land without a local green.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if v is None:
        return "<null>"
    return str(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_val(r[i]) for i in order) for r in rows)


def run_check(spark, sf: str, only: set[str] | None = None, out=sys.stdout) -> list:
    """Run the Spark-vs-DuckDB gate; returns [(name, reason)] failures."""
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            spark_rows = [tuple(r) for r in df.collect()]
            spark_cols = df.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}", file=out)
            continue
        if name not in oq:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]", file=out)
            if len(spark_rows) == 0 and name != "p3_edge_exists":
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            res = con.execute(oq[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCK ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}", file=out)
            continue
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        ok_n = len(spark_rows) == len(duck_rows)
        ok_vals = ok_cols and ok_n and rows_key(spark_rows, spark_cols) == rows_key(duck_rows, duck_cols)
        status = "OK   " if (ok_cols and ok_n and ok_vals) else "FAIL "
        print(
            f"{status} {name}: spark={len(spark_rows)} duck={len(duck_rows)} "
            f"cols={'ok' if ok_cols else (spark_cols, duck_cols)} vals={'ok' if ok_vals else 'MISMATCH'} "
            f"[{time.time()-t0:.1f}s]",
            file=out,
        )
        if not (ok_cols and ok_n and ok_vals):
            failures.append((name, "mismatch"))
            if ok_cols and ok_n:
                sk = rows_key(spark_rows, spark_cols)
                dk = rows_key(duck_rows, duck_cols)
                diff_s = [x for x in sk if x not in set(dk)][:3]
                diff_d = [x for x in dk if x not in set(sk)][:3]
                print(f"   spark-only: {diff_s}", file=out)
                print(f"   duck-only : {diff_d}", file=out)
    return failures


def main():
    from plume_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    failures = run_check(spark, sf, only or None)
    print(f"\n{len(failures)} failures: {[f[0] for f in failures]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
