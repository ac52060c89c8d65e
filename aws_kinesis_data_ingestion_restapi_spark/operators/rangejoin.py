"""Banded range join over a time axis.

Range predicates (``t_a < t_b <= t_a + W``) have no native equi-join
form; executed naively they become a per-key cross product filtered
late — quadratic in dense keys. The standard scalable shape is
BANDING: bucket the time axis into width-W bins, equi-join on
(key, bin) with the probe side replicated into the two bins a match
can live in, then apply the exact range filter to the (small)
candidate set. Complexity is Σ per-(key, bin) products instead of
Σ per-key products — bounded by the real temporal density.

The reference has no join surface beyond equi-joins (SURVEY §2.4);
this extends it (SURVEY §2.8) with the temporal-analytics primitive
behind "events followed within X seconds" queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark.functions.exact import (
    as_epoch_nanos,
    dsum,
)

NS_PER_S = 1_000_000_000


def follow_within(
    events: DataFrame,
    window_s: int = 60,
    key: str = "user_id",
    ts_ns: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per event: how many same-key events strictly follow it within
    ``window_s`` seconds, and their exact value sum (0 for none —
    every input event produces a row).

    ``ts_ns`` may be an epoch-nanoseconds long or a timestamp column;
    it is normalized to exact int64 nanoseconds up front
    (:func:`as_epoch_nanos`) so all window arithmetic stays integral.
    """
    w = window_s * NS_PER_S
    base = events.select(
        id_col, key, as_epoch_nanos(events, ts_ns).alias("_tsn"), value_col
    )
    # probe side replicated into the two candidate bins; build side
    # keeps its single home bin — each qualifying pair matches exactly once
    a = base.select(
        F.col(id_col).alias("_eid"),
        key,
        F.col("_tsn").alias("_ta"),
        F.explode(
            F.array(F.expr(f"_tsn DIV {w}"), F.expr(f"_tsn DIV {w} + 1"))
        ).alias("_bin"),
    )
    b = base.select(
        key,
        F.col("_tsn").alias("_tb"),
        F.col(value_col).alias("_vb"),
        F.expr(f"_tsn DIV {w}").alias("_bin"),
    )
    cand = a.join(b, [key, "_bin"]).filter(
        (F.col("_tb") > F.col("_ta")) & (F.col("_tb") <= F.col("_ta") + F.lit(w))
    )
    counts = cand.groupBy("_eid").agg(
        F.count(F.lit(1)).alias("n_follow"),
        dsum("_vb", scale=6, alias="total_follow_value"),
    )
    return (
        base.select(id_col)
        .join(counts, F.col(id_col) == F.col("_eid"), "left")
        .select(
            id_col,
            F.coalesce("n_follow", F.lit(0)).alias("n_follow"),
            F.coalesce("total_follow_value", F.lit(0.0)).alias("total_follow_value"),
        )
    )
