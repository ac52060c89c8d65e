"""Deterministic distinct-count sketching (θ-sampling).

Approximate COUNT(DISTINCT) at 100 TB normally uses HyperLogLog
(``approx_count_distinct``), but HLL registers are engine-internal —
a DuckDB oracle cannot reproduce Spark's estimate bit-for-bit, so HLL
results are unverifiable cross-engine. This module implements the
fixed-threshold variant of the KMV/theta sketch family instead
(Bar-Yossef et al., RANDOM '02; the Apache DataSketches "theta"
design): hash every value with md5, keep only hashes below a fixed
threshold θ (a hex-prefix test), count the distinct survivors, scale
by 1/θ. Both engines compute md5 identically, so the estimate —
including its sampling error — is bit-for-bit reproducible and
oracle-checkable.

Scale shape (the reason to sketch at all): the θ filter runs MAP-SIDE
before any exchange, so the distinct-shuffle moves |values|·θ rows
(1/16 per prefix digit) instead of |values| — counting distinct
n-grams over a 10¹² -token corpus shuffles ~6 % (θ=1/16) or ~0.4 %
(θ=1/256) of the data, with relative error ≈ 1/√(θ·D). Exact distinct
(the thing being avoided) would shuffle everything.

The reference has no approximate aggregates (SURVEY §2.7); this is
part of the training-data-pipeline extension surface (corpus
vocabulary / shingle-cardinality profiling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def theta_distinct(
    df: DataFrame,
    group_cols: list[str],
    value: Column | str,
    theta_hex_digits: int = 1,
) -> DataFrame:
    """Per group: deterministic approximate distinct count of ``value``.

    Output columns: the group cols, ``n_sampled`` (distinct hashes in
    the θ-sample) and ``est_distinct`` = n_sampled · 16^digits. md5
    collisions (2⁻¹²⁸) are the standard, negligible caveat of hashed
    distinct counting.
    """
    v = F.col(value) if isinstance(value, str) else value
    prefix = "0" * theta_hex_digits
    scale = 16**theta_hex_digits
    kept = df.select(*group_cols, F.md5(v).alias("_h")).filter(
        F.substring("_h", 1, theta_hex_digits) == prefix
    )
    return (
        kept.groupBy(*group_cols)
        .agg(F.countDistinct("_h").alias("n_sampled"))
        .withColumn("est_distinct", F.col("n_sampled") * F.lit(scale).cast("long"))
    )


CM_DEPTH = 4  # count-min hash rows
CM_WIDTH = 256  # count-min columns per row


def countmin_estimates(
    items: DataFrame,
    candidates: DataFrame,
    item_col: str = "item",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Count-Min frequency estimates (Cormode & Muthukrishnan '05) for
    a candidate item set: the sketch is ``depth`` rows of ``width``
    counters, each occurrence increments one counter per row (md5-
    seeded hash — deterministic, so the DuckDB oracle rebuilds the
    identical sketch), and an item's estimate is the MIN over its
    ``depth`` counters. The CM guarantee — estimate ≥ true count,
    overestimate bounded by collisions — holds bit-exactly here.

    Scale shape (the reason to sketch): the sketch aggregate shuffles
    into depth×width cells — FIXED memory regardless of stream size —
    and candidate estimation is a broadcast probe of ≤ depth×width
    rows. The item stream itself is never distinct-shuffled.

    ``items``: one row per occurrence. ``candidates``: the items to
    estimate (small — e.g. the exact top-k being audited)."""
    it = F.col(item_col)

    def cell(d: int, col: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(str(d) + ":"), col)), 1, 7), 16, 10
        ).cast("long")
        return h % width

    # one scan of the occurrence stream; the ×depth fan-out is a
    # map-side explode of (row, counter) structs, not repeated scans
    flat = items.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), cell(d, it).alias("c"))
                for d in range(depth)
            ])
        ).alias("dc")
    ).select(F.col("dc.d").alias("d"), F.col("dc.c").alias("c"))
    cells = flat.groupBy("d", "c").agg(F.count(F.lit(1)).alias("n"))

    cand_cells = candidates.select(
        it.alias("item"),
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), cell(d, it).alias("c"))
                for d in range(depth)
            ])
        ).alias("dc"),
    ).select("item", F.col("dc.d").alias("d"), F.col("dc.c").alias("c"))
    return (
        cand_cells.join(F.broadcast(cells), ["d", "c"])
        .groupBy("item")
        .agg(F.min("n").alias("cm_estimate"))
    )
