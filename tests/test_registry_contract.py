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


def test_bench_final_line_is_driver_comparable_and_stable():
    """r12 VERDICT ask #1: the packed-string final line left the
    driver's comparator with n_common=0 (no per-query deltas, no
    scaling block). Pin the restored contract:
    (a) the final line is a JSON DICT again, fits the 2000-char
        capture even under a pessimistic all-slow profile;
    (b) alias keys are FROZEN — spot-pin r11 codes so a wholesale
        regeneration (what zeroed r12's comparison) fails the suite;
    (c) the KEEP set is name-stable and every name is benched;
    (d) omission is honest (n_omitted + kept == all entries,
        omitted_total_ds = the tail's sum) and a tail entry that
        regresses past _PROMOTE_DS is PROMOTED into the dict;
    (e) the line round-trips through scripts/decode_bench_line.decode.
    """
    import importlib.util
    import json
    import os

    import bench

    benched = (
        set(bench.ANALYTICS_QUERIES)
        | set(bench.REF_BENCH_KEYS.values())
        | {"etl_derive_tables", "pipeline_streaming_drain"}
    )
    # (c) keep list: valid names, no dupes
    assert set(bench.BENCH_LINE_KEEP) <= benched
    assert len(set(bench.BENCH_LINE_KEEP)) == len(bench.BENCH_LINE_KEEP)
    # (b) frozen alias spot-pins (r11 codes the driver last parsed)
    for name, code in {
        "sql_above_average_orders": "aav",
        "etl_derive_tables": "etl",
        "dedup_simhash_pairs": "sh",
        "streaming_payment_match": "spy",
        "ann_recall_clustered": "rcc",
        "q22_dormant_customers": "q22",
        "text_repetition": "rep",
    }.items():
        assert bench.BENCH_KEY_ALIASES[name] == code, (name, code)

    # pessimistic profile: every entry 9.9 s — worse than any observed
    # run; every entry promotes past _PROMOTE_DS and the demotion path
    # must still fit the capture
    timings = {n: 9.9 for n in benched}
    timings["etl_derive_tables"] = 99.9
    timings["pipeline_streaming_drain"] = 99.9
    line = bench.compose_final_line(
        timings, round(sum(timings.values()), 3), 0.1
    )
    assert len(line) <= 1990, f"final line {len(line)} chars overflows"
    parsed = json.loads(line)
    assert isinstance(parsed["queries"], dict)
    assert parsed["n_omitted"] + len(parsed["queries"]) == len(timings)

    # realistic profile: KEEP entries at 2-digit ds, tail sub-second,
    # one tail entry regressed to 9 s → must be promoted
    tail = sorted(benched - set(bench.BENCH_LINE_KEEP))
    timings = {n: 3.2 for n in bench.BENCH_LINE_KEEP}
    timings.update({n: 0.4 for n in tail})
    regressed = tail[0]
    timings[regressed] = 9.0
    total = round(sum(timings.values()), 3)
    line = bench.compose_final_line(timings, total, 0.1)
    assert len(line) <= 1990
    parsed = json.loads(line)
    assert parsed["queries"][bench.BENCH_KEY_ALIASES[regressed]] == 90
    assert parsed["n_omitted"] == len(tail) - 1
    assert parsed["omitted_total_ds"] == 4 * (len(tail) - 1)

    # (e) round-trip through the decode script
    spec = importlib.util.spec_from_file_location(
        "decode_bench_line",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "decode_bench_line.py"),
    )
    dec = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dec)
    out = dec.decode(parsed)
    assert out[regressed] == 9.0
    for n in bench.BENCH_LINE_KEEP:
        assert abs(out[n] - 3.2) < 1e-9, n

