"""Exact (engine-portable) aggregation helpers.

Floating-point SUM is order-dependent: a distributed Spark sum and a
DuckDB sum of the same doubles differ in the low bits, which breaks
value-hash comparison between engines. These helpers route measures
through DECIMAL — exact, associative, order-independent — and cast the
final result back to DOUBLE, so both engines produce bit-identical
values. This also mirrors what a production revenue pipeline should do
anyway: money in floating point is an anti-pattern.

The decimal cast per row happens JVM-side inside whole-stage codegen —
no UDF, no extra shuffle; at 100 TB the cost is a few extra cycles per
value against an exactness guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, alias: str | None = None) -> Column:
    """Exact SUM: cast to decimal(18,scale), sum, return as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, scale: int = 2, alias: str | None = None) -> Column:
    """Exact-ish AVG: exact decimal sum, then one double division.

    Both engines perform the identical IEEE double division, so results
    match bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def nanos_ts(col: Column | str = "ts") -> Column:
    """Nanosecond-epoch long → timestamp (exact integer µs division).

    Pairs with ``spark.sql.legacy.parquet.nanosAsLong`` (session.py):
    parquet TIMESTAMP(NANOS) columns arrive as long. Plain ``/`` would
    go through double (53-bit mantissa < ns magnitudes) — DIV stays
    integral.
    """
    name = col if isinstance(col, str) else None
    expr = F.expr(f"timestamp_micros({name} DIV 1000)") if name else None
    if expr is None:
        raise ValueError("nanos_ts requires a column name")
    return expr


def as_timestamp(df, col: str = "ts") -> Column:
    """Normalize an event-time column to a timestamp, whatever parquet
    representation it arrived in.

    The events table's physical type has varied across generator
    versions: TIMESTAMP(NANOS) read as epoch-nanos long (under
    ``nanosAsLong``), TIMESTAMP(MICROS) read natively as
    TIMESTAMP_NTZ, or an already-zoned TIMESTAMP. Branching on the
    *schema* (driver-side, zero runtime cost) keeps every events query
    correct against all three without per-row type dispatch.
    """
    from pyspark.sql.types import LongType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return nanos_ts(col)
    return F.col(col)


def as_epoch_nanos(df, col: str = "ts") -> Column:
    """Normalize an event-time column to exact epoch-nanoseconds int64.

    Counterpart of :func:`as_timestamp` for operators that do integer
    window arithmetic (banded range joins). micros→nanos is an exact
    int64 multiply (overflows only past year 2262); the session
    timezone is pinned to UTC (session.py RUNTIME_CONFS) so the
    NTZ→timestamp cast is a pure reinterpretation.
    """
    from pyspark.sql.types import LongType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return F.col(col)
    return F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000).cast("long")


def disc_price_expr() -> Column:
    """l_extendedprice * (1 - l_discount), exact in decimal.

    Tight precisions keep every intermediate well inside 38 digits in
    BOTH engines: (12,2) * ((3,2)-(4,2)) → (18,4), exact.
    """
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    one = F.lit(1).cast("decimal(3,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return ep * (one - disc)


def charge_expr() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal
    ((18,4) * (5,2) → (24,6))."""
    one = F.lit(1).cast("decimal(3,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return disc_price_expr() * (one + tax)


# DuckDB-side SQL fragments implementing the same semantics, for oracle
# strings: SUM(CAST(x AS DECIMAL(18,s)))::DOUBLE etc. Kept here as
# documentation of the contract; the oracle SQL in registry.py inlines
# them.
DSUM_SQL = "CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE)"
DAVG_SQL = "CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({col})"
