"""Snapshot diff (CDC-style change detection) between two table
versions.

The reference's serving sink is a keyed last-write-wins upsert store
(lambda_kinesis_consumer writes DynamoDB items — SURVEY §2.3 K4); a
natural engine-side complement is computing WHICH rows changed
between two snapshots — the inserts/updates/deletes feed exactly that
upsert path (sinks.serving_upsert) or any downstream incremental
consumer.

Scale design: one full-outer equi-join on the key — a single hash
shuffle per side, the minimum possible for whole-snapshot diffing.
Row equality is compared via a per-row digest of the tracked columns
computed map-side (md5 over a field-separated rendering), so the
join carries (key, 32-byte digest) instead of whole rows; at 100 TB
that's the difference between shuffling the table and shuffling a
key index. AQE handles skewed keys; for repeated diffs against a
slowly-changing base, bucket both snapshots on the key to make the
join co-located (operators/scale.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Field separator for the row digest — a control char that cannot
#: appear in the rendered values.
_SEP = "\x1f"
_NULL = "<NULL>"


def row_digest(cols: list[str | Column]) -> Column:
    """Order-sensitive md5 digest of the given columns, null-safe
    (NULL renders as a sentinel distinct from any real value). The
    rendering only needs to be injective WITHIN an engine — diff
    verdicts depend on digest equality, never on the digest value."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(_NULL)
        )
        for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots as insert / update /
    delete (and optionally unchanged): the CDC feed an incremental
    pipeline applies downstream."""
    o = old.select(*keys, row_digest(compare_cols).alias("_h_old"))
    n = new.select(*keys, row_digest(compare_cols).alias("_h_new"))
    j = o.join(n, keys, "full_outer")
    classified = j.select(
        *keys,
        F.when(F.col("_h_old").isNull(), "insert")
        .when(F.col("_h_new").isNull(), "delete")
        .when(F.col("_h_old") != F.col("_h_new"), "update")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    if include_unchanged:
        return classified
    return classified.filter(F.col("change_type") != "unchanged")


def scd2_apply(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    v_old: int = 1,
    v_new: int = 2,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from two snapshot
    versions — the APPLY step downstream of :func:`snapshot_diff`
    (which only classifies): every key becomes its interval rows.

      unchanged  (attrs_old, valid_from=v_old, valid_to=NULL, current)
      update     (attrs_old, v_old, v_new, closed) +
                 (attrs_new, v_new, NULL, current)
      delete     (attrs_old, v_old, v_new, closed)
      insert     (attrs_new, v_new, NULL, current)

    Built as ONE full-outer hash join on the key plus a conditional
    array-of-struct explode — each input row expands to 1-2 interval
    rows map-side, so there is exactly one shuffle regardless of how
    many keys changed. Digest comparison (row_digest) keeps the
    change test null-safe and single-expression.

    Scale note: at 100 TB this is the same shape as the diff — the
    history explode adds no shuffle; generalizing to N snapshot
    versions is a fold of this two-version step (each fold works on
    current rows only, delta-sized after the first)."""
    o_attrs = [F.col(c).alias(f"_o_{c}") for c in compare_cols]
    n_attrs = [F.col(c).alias(f"_n_{c}") for c in compare_cols]
    o = old.select(*keys, *o_attrs, row_digest(compare_cols).alias("_h_old"))
    n = new.select(*keys, *n_attrs, row_digest(compare_cols).alias("_h_new"))
    j = o.join(n, keys, "full_outer")

    def interval(side: str, valid_from: int, valid_to: int | None) -> Column:
        return F.struct(
            *[F.col(f"_{side}_{c}").alias(c) for c in compare_cols],
            F.lit(valid_from).alias("valid_from"),
            (F.lit(valid_to) if valid_to is not None else F.lit(None))
            .cast("int")
            .alias("valid_to"),
            F.lit(valid_to is None).alias("is_current"),
        )

    closed_old = interval("o", v_old, v_new)
    open_old = interval("o", v_old, None)
    open_new = interval("n", v_new, None)
    rows = (
        F.when(F.col("_h_old").isNull(), F.array(open_new))
        .when(F.col("_h_new").isNull(), F.array(closed_old))
        .when(F.col("_h_old") != F.col("_h_new"), F.array(closed_old, open_new))
        .otherwise(F.array(open_old))
    )
    exploded = j.select(*keys, F.explode(rows).alias("_iv"))
    return exploded.select(
        *keys,
        *[F.col(f"_iv.{c}").alias(c) for c in compare_cols],
        F.col("_iv.valid_from").alias("valid_from"),
        F.col("_iv.valid_to").alias("valid_to"),
        F.col("_iv.is_current").alias("is_current"),
    )
