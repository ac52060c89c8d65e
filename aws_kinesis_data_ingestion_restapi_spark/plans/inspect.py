"""Parse ``df.explain("formatted")`` output into assertable facts.

Spark exposes the physical plan only as text; these helpers extract
the properties that matter for 100 TB plans:

- ``pushed_filters``    — predicates that reached the parquet scan
                          (a filter NOT here is evaluated row-by-row
                          AFTER reading every page).
- ``read_schema_columns`` — columns actually read from parquet
                          (column pruning; reading 16 columns for a
                          2-column projection is a 8× I/O bug).
- ``has_partition_filters`` — partition pruning on a Hive-layout
                          table (prunes whole directories, the
                          reference's Glue tables can't do this —
                          SURVEY §1.2).
- ``has_broadcast_join`` — small-dim joins must broadcast; a
                          sort-merge join of a 25-row region table
                          against 100 TB of lineitem shuffles the
                          big side for nothing.
- ``whole_stage_codegen_ids`` — expression spans fused into
                          generated JVM code (interpreted gaps are
                          10-100× slower per row).

Used by tests/test_plans.py to pin the plan shape of every headline
query, so a regression that silently un-pushes a filter fails CI, not
the 1000-executor run.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` captured as a string (Spark prints it)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All predicates pushed into data-source scans, flattened.

    Empty list ⟹ every filter (if any) runs post-scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read from parquet, one per scan node (column
    pruning check: compare against what the query actually needs)."""
    cols: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        body = m.group(1)
        names = [f.split(":")[0].strip() for f in body.split(",") if ":" in f]
        cols.append([n for n in names if n])
    return cols


def has_partition_filters(df: DataFrame, column: str | None = None) -> bool:
    """True when a scan prunes Hive-layout partitions (optionally on a
    specific partition column)."""
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", explain_str(df)):
        body = m.group(1).strip()
        if body and (column is None or column in body):
            return True
    return False


def has_broadcast_join(df: DataFrame) -> bool:
    """True when the plan contains a broadcast hash/nested-loop join."""
    return "Broadcast" in explain_str(df)


def scan_count(df: DataFrame) -> int:
    """Number of file-source scan nodes (re-read detection: a source
    consumed N times without a reuse marker scans the data N times).

    Counts distinct node ids — formatted mode prints each scan twice
    (tree line ``Scan parquet  (1)`` + details header ``(1) Scan``)."""
    s = explain_str(df)
    ids = set(re.findall(r"\((\d+)\) Scan \w+", s))
    ids |= set(re.findall(r"Scan \w+ +\((\d+)\)", s))
    return len(ids)


def whole_stage_codegen_ids(df: DataFrame) -> list[int]:
    """Distinct WholeStageCodegen span ids (``*(N)`` markers in simple
    mode). More/wider spans ⟹ more of the query runs as fused
    generated code. Note: under AQE the pre-execution plan may show no
    spans yet — compare like against like."""
    return sorted(
        {int(x) for x in re.findall(r"\*\((\d+)\)", explain_str(df, mode="simple"))}
    )
