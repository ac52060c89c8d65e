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

def row_digest(cols: list[str | Column]) -> Column:
    """Order-sensitive md5 digest of the given columns over an
    INJECTIVE rendering: each field is either ``-`` (NULL) or
    ``<length>:<value>``. The length prefix means no value content —
    a literal separator, a string equal to any sentinel — can shift
    field boundaries or collide with NULL (the earlier
    sentinel+separator rendering collided a real '<NULL>' string with
    SQL NULL). The rendering only needs to be injective WITHIN an
    engine — diff verdicts depend on digest equality, never on the
    digest value."""
    parts = []
    for c in cols:
        s = (F.col(c) if isinstance(c, str) else c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("-")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat_ws("|", *parts))


def _null_safe_key_join(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> tuple[DataFrame, list[Column]]:
    """Full-outer join of two keyed snapshots with NULL-SAFE key
    equality: a key that is NULL in both snapshots is ONE key (plain
    equality would report it as a simultaneous delete + insert).
    Returns (joined, coalesced key output columns)."""
    o = old.withColumnsRenamed({k: f"_ko_{i}" for i, k in enumerate(keys)})
    n = new.withColumnsRenamed({k: f"_kn_{i}" for i, k in enumerate(keys)})
    cond = None
    for i in range(len(keys)):
        c = F.col(f"_ko_{i}").eqNullSafe(F.col(f"_kn_{i}"))
        cond = c if cond is None else cond & c
    out_keys = [
        F.coalesce(f"_ko_{i}", f"_kn_{i}").alias(k)
        for i, k in enumerate(keys)
    ]
    return o.join(n, cond, "full_outer"), out_keys


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
    j, out_keys = _null_safe_key_join(o, n, keys)
    classified = j.select(
        *out_keys,
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
    j, out_keys = _null_safe_key_join(o, n, keys)

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
    exploded = j.select(*out_keys, F.explode(rows).alias("_iv"))
    return exploded.select(
        *keys,
        *[F.col(f"_iv.{c}").alias(c) for c in compare_cols],
        F.col("_iv.valid_from").alias("valid_from"),
        F.col("_iv.valid_to").alias("valid_to"),
        F.col("_iv.is_current").alias("is_current"),
    )
