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
