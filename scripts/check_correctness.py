"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at a given SF dir and
compares against oracle_sql() in DuckDB: row count, column names, and
order-insensitive value comparison (columns sorted by name, rows sorted
by their stringified tuple). Reports per-query PASS/FAIL with first
differing rows on mismatch.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.schema import TESTDATA_TABLES  # noqa: E402


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    spark = get_spark(app_name="check-correctness")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle — rows-only check)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        if sorted(c.lower() for c in scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        a = _canon([tuple(r) for r in srows], [c.lower() for c in scols])
        b = _canon(drows, dcols)
        if a != b:
            ndiff = sum(1 for x, y in zip(a, b) if x != y)
            print(f"FAIL  {name}: values differ ({ndiff}/{len(a)} rows)")
            for x, y in zip(a, b):
                if x != y:
                    print(f"      spark: {x}\n      duck : {y}")
                    break
            failures += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows in {dt:.1f}s")
    spark.stop()
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
