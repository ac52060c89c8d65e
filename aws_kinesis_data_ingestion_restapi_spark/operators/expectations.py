"""Data-quality expectations: declarative constraint checks computed
in ONE scan — the contract gate a training-data pipeline runs before
(and after) every transformation stage.

The reference has no data-quality surface (SURVEY §2.7); this extends
it (§2.8 X51). Public precedents for the shape: Deequ-style column
constraints, dbt tests, Great Expectations — all reduce to "a metric
expression compared to a threshold". Here each rule is exactly that:
a named aggregate metric (built-in Column expressions, so the whole
report is one partial+final aggregate over one scan — never one pass
per rule) plus a ``<=`` threshold, unpivoted to one row per rule.

Determinism: metrics are ratios of exact integer counts (one IEEE
double division each), so the report value-hashes identically in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def frac(cond: Column) -> Column:
    """Fraction of rows satisfying ``cond`` — exact int counts, one
    double division (the engine-portable metric building block)."""
    return (
        F.sum(F.when(cond, 1).otherwise(0)).cast("double") / F.count(F.lit(1))
    )


def dup_key_frac(key: Column | str) -> Column:
    """Fraction of rows that are surplus copies of a duplicated key:
    (n - distinct(n)) / n. 0.0 ⟺ the key is unique."""
    k = F.col(key) if isinstance(key, str) else key
    return (
        (F.count(F.lit(1)) - F.count_distinct(k)).cast("double")
        / F.count(F.lit(1))
    )


def expectations_report(
    df: DataFrame,
    rules: dict[str, tuple[Column, float]],
) -> DataFrame:
    """Evaluate ``rules`` — name → (aggregate metric Column, max
    allowed value) — in one aggregate pass over ``df``.

    Output: (rule, metric, threshold, passed), one row per rule in
    rule-name order; ``passed = metric <= threshold``. All rule
    metrics ride a single partial+final hash aggregate (one scan, one
    ~len(rules)-column row shuffled), then a driver-side-free unpivot
    via an array explode — report cost is the scan, independent of the
    rule count.
    """
    agg_row = df.agg(
        *[m.alias(f"_m_{name}") for name, (m, _t) in rules.items()]
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_m_{name}").cast("double").alias("metric"),
                F.lit(float(t)).alias("threshold"),
            )
            for name, (_m, t) in sorted(rules.items())
        ]
    )
    return (
        agg_row.select(F.explode(entries).alias("e"))
        .select("e.rule", "e.metric", "e.threshold")
        .withColumn("passed", F.col("metric") <= F.col("threshold"))
    )
