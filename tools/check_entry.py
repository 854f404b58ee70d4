"""Local stand-in for the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB against the same sf dir, then compares
row count, column-name set, and an order-insensitive value multiset
(columns sorted by name, rows sorted). Prints PASS/FAIL per query plus a
sample diff on mismatch.

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon_val(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # queries round already; this collapses -0.0/0.0 and repr noise
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_val(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from networkit_spark.session import get_spark

    spark = get_spark("check-entry")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        s_cols = list(df.columns)
        s_rows = [tuple(r) for r in df.collect()]
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(s_rows)} rows ({spark_s:.1f}s spark)")
            if not s_rows:
                failures.append((name, "0 rows"))
            continue
        t0 = time.monotonic()
        res = con.execute(oracles[name])
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
        duck_s = time.monotonic() - t0
        problems = []
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"schema spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if len(s_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
        if not problems:
            a, b = _canon_rows(s_cols, s_rows), _canon_rows(o_cols, o_rows)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diffs}")
        status = "PASS" if not problems else "FAIL " + "; ".join(problems)
        print(f"  {name:24s} {status} ({len(s_rows)} rows, {spark_s:.1f}s spark / {duck_s:.1f}s duck)")
        if problems:
            failures.append((name, problems))

    print(f"\n{len(failures)} failures" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
