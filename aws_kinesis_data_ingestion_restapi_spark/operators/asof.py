"""As-of (point-in-time) join: for each left row, the latest right row
at or before the left row's timestamp within a key group — the temporal
lookup behind rate tables, slowly-changing dims and market-data joins.
The reference has no temporal-join surface (SURVEY §2.7); this extends
it (SURVEY §2.8).

Scale design — the naive formulation is a range join (``l.time >=
r.time`` + per-row argmax), which explodes to |L|·|R| per key before
pruning. Instead the classic union-tag + window form:

1. union the tagged sides (right rows carry their payload, left rows
   carry nulls for it);
2. ONE window per key, ordered by (time, side), filling the payload
   with ``last(..., ignorenulls=True)`` over the preceding frame;
3. keep the left rows — each now holds the payload of the latest
   right row at-or-before it.

Cost: a single hash shuffle on the key (the window), zero row
multiplication — the as-of join plan you'd hand-build on any engine
without a native ASOF operator. The DuckDB oracle uses its native
``ASOF JOIN``, independently validating the window formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to the latest right row with ``right_time <=
    left_time`` in its ``on`` group. Right payload columns must not
    collide with left columns. ``how='inner'`` drops left rows with no
    prior right row; ``'left'`` keeps them with null payload."""
    vals = [c for c in right.columns if c not in on and c != right_time]
    clash = set(vals) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    rt_out = right_time if right_time not in left.columns else f"right_{right_time}"
    payload = [*vals, rt_out]

    r = right.select(
        *on,
        F.col(right_time).cast("timestamp").alias("_t"),
        F.col(right_time).alias(rt_out),
        *[F.col(c) for c in vals],
        F.lit(0).alias("_side"),
    )
    l = left.select(
        "*",
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # same-instant right rows sort before left (_side 0 < 1): a quote
    # effective AT the event time applies to it, matching ASOF >= semantics
    w = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in payload
        ],
    )
    out = filled.filter(F.col("_side") == 1).select(
        *left.columns,
        *[F.col(f"_f_{c}").alias(c) for c in payload],
    )
    if how == "inner":
        return out.filter(F.col(rt_out).isNotNull())
    return out
