"""Registry output-shape contract.

The driver's correctness harness canonicalizes every query result with
a pandas sort over all columns before value-hashing. pandas cannot
sort/hash array-, struct-, or map-typed cells (numpy.ndarray is
unhashable), so ANY registry surface that emits a nested-typed column
errors in the driver gate no matter how correct the values are —
exactly what happened to ``text_build_postings`` in round 6 (the only
ERR of 150 in CORRECTNESS_r06: the ``array<string>`` postings column).

This test makes that contract explicit: every ``queries()`` entry must
emit only scalar (atomic) columns. Library APIs may keep nested return
types (``text.build_postings`` still returns the array — callers want
it); only the REGISTRY surface must encode them to a deterministic
scalar (e.g. ``F.array_join`` on an already-sorted list).

The sweep builds every query at sf0.001 and inspects the result
schema. Most entries are lazy (schema = analysis only); the streaming
entries drain eagerly, which is what keeps this test ~80 s — that cost
buys failing in pytest instead of burning a driver round.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.001")

_NESTED = {"array", "struct", "map"}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_registry_emits_only_scalar_columns(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    violations: list[tuple[str, str, str]] = []
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        for field in df.schema.fields:
            tn = field.dataType.typeName()
            if tn in _NESTED:
                violations.append((name, field.name, tn))
    assert not violations, (
        "registry queries must emit only scalar columns (driver-harness "
        f"contract — pandas canonicalizer cannot hash nested cells): {violations}"
    )


def test_registry_is_fully_oracle_paired():
    """Every queries() entry has an oracle_sql() entry and vice versa
    (modulo the documented non-SQL-expressible exemptions, of which
    there are currently none)."""
    import __spark_entry__ as entry

    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert q == o, f"unpaired: queries-only={sorted(q - o)}, oracle-only={sorted(o - q)}"


def test_bench_covers_every_registry_query_and_aliases_are_unique():
    """Round-11 guard: bench.py's ANALYTICS_QUERIES is hand-grown and
    went silently incomplete once (21 new queries missing) and its
    compact-line aliases once COLLIDED (corpus_funnel_report and
    events_funnel both "fnl", so the driver-parsed line dropped one
    timing). Pin both invariants: every registry query outside the
    dedicated ETL/Athena bench phases is listed, aliases are 1:1, and
    no alias shadows a real query name."""
    import bench
    from aws_kinesis_data_ingestion_restapi_spark.registry import QUERY_FNS

    missing = [
        n
        for n in QUERY_FNS
        if n not in bench.ANALYTICS_QUERIES
        and not n.startswith("pipeline_")
        and not n.startswith("ref_")
        and n != "emb_near_dup"
    ]
    assert not missing, f"queries not benched: {missing}"
    unknown = [
        n for n in bench.ANALYTICS_QUERIES if n not in QUERY_FNS
    ]
    assert not unknown, f"benched but not registered: {unknown}"
    vals = list(bench.BENCH_KEY_ALIASES.values())
    dupes = [v for v in set(vals) if vals.count(v) > 1]
    assert not dupes, f"alias collisions: {dupes}"
    assert not [v for v in vals if v in QUERY_FNS]


def test_bench_packed_line_carries_every_entry_within_capture():
    """r11 VERDICT ask #2: the compact FINAL line saturated the
    driver's 2000-char capture and silently dropped 29 entries
    (n_omitted=29). The fix is the packed-string stage — pin that it
    (a) fits the capture at the CURRENT registry size under
    pessimistic per-query costs, (b) carries every timing (n_omitted
    semantics = 0), and (c) round-trips through
    scripts/decode_bench_line.decode back to exact {name: sec}."""
    import importlib.util
    import json
    import os

    import bench

    spec = importlib.util.spec_from_file_location(
        "decode_bench_line",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "decode_bench_line.py"),
    )
    dec = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dec)

    # pessimistic timing profile: every entry 9.9 ds (2-digit), the
    # ETL / streaming-drain tails at 3-digit ds — worse than any
    # observed run (r11 real: 1745 chars at 245 entries)
    timings = {n: 9.9 for n in bench.ANALYTICS_QUERIES}
    timings.update({k: 9.9 for k in bench.REF_BENCH_KEYS.values()})
    timings.update(
        {"etl_derive_tables": 99.9, "pipeline_streaming_drain": 99.9}
    )
    packed = " ".join(
        f"{bench.BENCH_KEY_ALIASES.get(k, k)}:{int(round(v * 10))}"
        for k, v in sorted(timings.items(), key=lambda kv: -kv[1])
    )
    line = json.dumps(
        {"metric": "wall", "value": round(sum(timings.values()), 3),
         "unit": "sec", "qunit": "ds", "qfmt": "pack", "n_omitted": 0,
         "queries": packed, "sf": 0.1},
        separators=(",", ":"),
    )
    assert len(line) <= 1990, (
        f"packed line {len(line)} chars overflows the driver capture — "
        "shorten aliases before adding more queries"
    )
    out = dec.decode(json.loads(line))
    assert set(out) == set(timings)
    assert all(abs(out[k] - round(timings[k], 1)) < 1e-9 for k in timings)
