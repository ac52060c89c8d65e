"""As-of (point-in-time) join: for each left row, the latest right row
at or before the left row's timestamp within a key group — the temporal
lookup behind rate tables, slowly-changing dims and market-data joins.
The reference has no temporal-join surface (SURVEY §2.7); this extends
it (SURVEY §2.8).

Scale design — the naive formulation is a range join (``l.time >=
r.time`` + per-row argmax), which explodes to |L|·|R| per key before
pruning. The classic fix is union-tag + window: union the tagged sides,
one window per key ordered by (time, side), fill the right payload with
``last(..., ignorenulls=True)``. That is single-shuffle and
multiplication-free, but its parallelism equals the KEY CARDINALITY —
with 5 keys the entire fact funnels through 5 window tasks at 100 TB.

This implementation composite-partitions the window on (key, coarse
time bucket) and carries each bucket's opening state forward, so
parallelism is keys × buckets:

1. per (key, bucket) CLOSING state: ``max(struct(time, tie, payload))``
   over right rows — a map-side-combinable aggregate, one row out per
   (key, bucket);
2. per (key, bucket) OPENING state: the latest closing state of any
   EARLIER bucket, via one window over the tiny closing/marker frame
   (keys × buckets rows — per-key parallelism is fine at this size);
3. openings are injected as synthetic rows (side=-1, null time → sorts
   first in the bucket) into the main union, so the whole plan stays
   JOIN-FREE; the in-bucket window then fills
   ``last(payload_struct, ignorenulls=True)`` per (key, bucket).

Cost: the fact side is shuffled once for the window plus once through a
map-combined distinct of its (key, bucket) pairs; everything else
operates on metadata-scale frames. The payload travels as ONE struct,
so a left row always receives a CONSISTENT right row (per-column fill
could stitch fields from different right rows when payloads contain
nulls).

Determinism: right rows tying on (key, time) are resolved by the
largest ``xxhash64`` of the full right row — arbitrary but stable
across partitionings, runs and engines that copy this rule. Right rows
with a NULL time are dropped (cannot satisfy "at or before"; matches
DuckDB ``ASOF JOIN``, the independent oracle for this operator).

Bench note (sf0.1, asof_priority_rates): the (key, bucket) composite
form measures 1.42 s vs 0.69 s for the round-2 per-key-window form.
The ~0.7 s is the DELIBERATE price of keys × buckets parallelism —
the per-key form serializes the whole fact table through |keys|
window tasks (5 here) and is a non-starter at 100 TB. Do not
"optimize" this back to the flat window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Default bucket width: 30 days. Tune to the data's time span — aim for
# enough (key × bucket) groups to saturate the cluster while keeping
# each bucket's row count within a task's memory.
DEFAULT_BUCKET_SECONDS = 30 * 86400


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    how: str = "inner",
    bucket_seconds: int | None = DEFAULT_BUCKET_SECONDS,
) -> DataFrame:
    """Join each left row to the latest right row with ``right_time <=
    left_time`` in its ``on`` group. Right payload columns must not
    collide with left columns. ``how='inner'`` drops left rows with no
    prior right row; ``'left'`` keeps them with null payload.
    ``bucket_seconds=None`` disables time bucketing (single window per
    key — only sensible when key cardinality alone saturates the
    cluster)."""
    vals = [c for c in right.columns if c not in on and c != right_time]
    clash = set(vals) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    rt_out = right_time if right_time not in left.columns else f"right_{right_time}"
    payload = [*vals, rt_out]

    # truncation-toward-zero is monotone in _t, which is all bucketing
    # needs (bucket boundaries carry no semantics of their own)
    def _bucket(col):
        if bucket_seconds is None:
            return F.lit(0).cast("long")
        return F.expr(f"CAST({col} AS BIGINT) DIV {int(bucket_seconds)}")

    r = (
        right.withColumn("_t", F.col(right_time).cast("timestamp"))
        .filter(F.col("_t").isNotNull())
        .select(
            *on,
            "_t",
            _bucket("_t").alias("_b"),
            F.lit(0).alias("_side"),
            F.xxhash64(*on, F.col(right_time), *[F.col(c) for c in vals]).alias(
                "_tie"
            ),
            F.struct(
                *[F.col(c) for c in vals], F.col(right_time).alias(rt_out)
            ).alias("_rs"),
        )
    )
    l = left.select(
        "*",
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tie"),
    ).withColumn("_b", _bucket("_t"))

    # (1) closing state per (key, bucket) from right rows only
    closings = r.groupBy(*on, "_b").agg(
        F.max(F.struct("_t", "_tie", "_rs")).alias("_mx")
    )
    # (2) opening state: markers for every LEFT bucket (right-only
    # buckets need no opening — nothing there consumes one), then one
    # pass over the metadata-scale marker ∪ closing frame. Closing rows
    # sort AFTER the marker inside a bucket (_flag 1 > 0), so a
    # bucket's own rights never leak into its opening.
    markers = l.select(*on, "_b").distinct().withColumn("_flag", F.lit(0))
    chain = markers.unionByName(
        closings.select(*on, "_b", F.lit(1).alias("_flag"), "_mx"),
        allowMissingColumns=True,
    )
    w_chain = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy("_b", "_flag")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    openings = (
        chain.withColumn("_open", F.last("_mx", ignorenulls=True).over(w_chain))
        .filter((F.col("_flag") == 0) & F.col("_open").isNotNull())
        .select(
            *on,
            "_b",
            F.lit(None).cast("timestamp").alias("_t"),
            F.lit(-1).alias("_side"),
            F.lit(0).cast("long").alias("_tie"),
            F.col("_open._rs").alias("_rs"),
        )
    )

    # (3) join-free main pass: one window per (key, bucket); the
    # opening row's null _t sorts first, same-instant rights sort
    # before left rows (>= semantics), right ties resolve by _tie
    u = r.unionByName(openings).unionByName(l, allowMissingColumns=True)
    w_in = (
        Window.partitionBy(*[F.col(c) for c in on], F.col("_b"))
        .orderBy(
            F.col("_t").asc_nulls_first(), F.col("_side").asc(), F.col("_tie").asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_res", F.last("_rs", ignorenulls=True).over(w_in))
    out = filled.filter(F.col("_side") == 1)
    if how == "inner":
        out = out.filter(F.col("_res").isNotNull())
    return out.select(
        *left.columns,
        *[F.col("_res").getField(c).alias(c) for c in payload],
    )
