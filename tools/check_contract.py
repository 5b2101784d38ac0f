"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, schema (column names), and sorted row values.

Usage: python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from openlogreplicator_spark.session import build_session  # noqa: E402


STRICT = os.environ.get("CONTRACT_STRICT", "") == "1"


def norm(v):
    if STRICT:
        # driver-faithful mode: no normalization — a Decimal('1.50') and a
        # Decimal('1.5') (or a float 1.5) must hash identically at the driver,
        # so they must repr identically here
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        if isinstance(v, datetime):
            return v.replace(tzinfo=None).isoformat()
        return v
    if isinstance(v, Decimal):
        return format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return format(v, ".9g")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rows_to_set(cols, rows):
    # sort columns by name (driver contract), then normalize values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(norm(r[i])) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = build_session("contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows={len(s_rows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append((name, f"schema: spark={s_cols} duckdb={d_cols}"))
            print(f"FAIL  {name}: schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append((name, f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}"))
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            continue
        a = rows_to_set(s_cols, s_rows)
        b = rows_to_set(d_cols, d_rows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, first diffs: {diff}"))
            print(f"FAIL  {name}: values differ; first diffs: {str(diff)[:400]}")
            continue
        print(f"ok    {name}: rows={len(s_rows)} values match")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
