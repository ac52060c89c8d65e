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


# The driver's value-hash is TYPE-sensitive (round-1 lesson: DuckDB
# SUM(BIGINT) returns HUGEINT, which hashes differently from Spark's
# BIGINT even with identical values — the old _norm masked that).
# Map both engines' column types to a common width-exact class and fail
# on any mismatch, so local green predicts driver green.
def _type_class(t: str) -> str:
    t = str(t).strip().lower()
    exact = {
        "tinyint": "int8", "int1": "int8", "byte": "int8",
        "smallint": "int16", "int2": "int16", "short": "int16",
        "int": "int32", "integer": "int32", "int4": "int32",
        "bigint": "int64", "int8": "int64", "long": "int64",
        "hugeint": "int128", "int128": "int128",
        "float": "float32", "real": "float32", "float4": "float32",
        "double": "float64", "float8": "float64",
        "varchar": "str", "string": "str", "text": "str",
        "date": "date", "boolean": "bool", "bool": "bool",
        "blob": "binary", "binary": "binary", "bytea": "binary",
    }
    if t in exact:
        return exact[t]
    if t.startswith("decimal") or t.startswith("numeric"):
        return "decimal" + t.split("decimal")[-1].split("numeric")[-1].replace(" ", "")
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith(("array", "list")) or t.endswith("[]"):
        return "list"
    if t.startswith(("struct", "row", "map")):
        return "nested"
    return t


def _type_mismatches(scols, sdtypes, dcols, dtypes):
    """[(col, spark_type, duck_type)] where the width-exact classes differ."""
    smap = {c.lower(): t for (c, t) in sdtypes}
    dmap = {c.lower(): str(t) for c, t in zip(dcols, dtypes)}
    out = []
    for c in sorted(smap):
        if c in dmap and _type_class(smap[c]) != _type_class(dmap[c]):
            out.append((c, smap[c], dmap[c]))
    return out


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


def _p(msg: str) -> None:
    """Print on a clean line: Spark's \\r progress bars otherwise glue
    themselves onto result lines and grep misses them."""
    sys.stdout.write("\n" + msg + "\n")
    sys.stdout.flush()


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
            _p(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            _p(f"ROWS  {name}: {len(srows)} rows (no oracle — rows-only check)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            dtypes = rel.types
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            _p(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        if sorted(c.lower() for c in scols) != sorted(dcols):
            _p(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        bad_types = _type_mismatches(scols, sdf.dtypes, dcols, dtypes)
        if bad_types:
            for c, st, dt_ in bad_types:
                _p(f"FAIL  {name}: type mismatch on '{c}': spark={st} duck={dt_}")
            failures += 1
            continue
        if len(srows) != len(drows):
            _p(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        a = _canon([tuple(r) for r in srows], [c.lower() for c in scols])
        b = _canon(drows, dcols)
        if a != b:
            ndiff = sum(1 for x, y in zip(a, b) if x != y)
            _p(f"FAIL  {name}: values differ ({ndiff}/{len(a)} rows)")
            for x, y in zip(a, b):
                if x != y:
                    print(f"      spark: {x}\n      duck : {y}")
                    break
            failures += 1
            continue
        _p(f"PASS  {name}: {len(srows)} rows in {dt:.1f}s")
    spark.stop()
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
