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
