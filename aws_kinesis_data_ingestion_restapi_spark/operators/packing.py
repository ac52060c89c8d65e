"""Token-budget sequence packing for training-data pipelines.

GPT-style packing concatenates the tokenized corpus in a fixed
document order and cuts it into fixed-size training sequences
(shards); each document's placement is a pure function of the
exclusive prefix sum of token counts. This module computes that
placement distributed.

Scale design — the naive formulation is a global ordered window
(``Window.orderBy(doc_id)``), which Spark executes as a SINGLE task:
a non-starter at 100 TB. Instead the classic two-level distributed
prefix sum:

1. block partial sums  — one ``groupBy(doc_id DIV block)`` shuffle;
2. block offsets       — an ordered window over the ~n/block block
   rows;
3. intra-block cumsum  — a window PARTITIONED by block, aligned with
   the equi-join on the block key, so one hash shuffle serves both
   the join and the window.

The block size defaults to ⌈√n⌉ (one cheap ``count()``), which
balances the levels: both the per-block row count and the block-level
window are ~√n, so ONE sizing works from 10³ to 10¹⁴ docs (at 10¹⁴
the block window is 10⁷ 16-byte rows — still a trivial single task,
which is why no third level is needed). A fixed ``block`` can be
passed to pin the plan (tests do, to prove block-independence).

Every step is built-in expressions; the wide operations are one
shuffle on the block key plus the √n-row block-level window.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_kinesis_data_ingestion_restapi_spark.operators.text import tokens_col

DEFAULT_BUDGET = 512  # tokens per training shard
MIN_BLOCK = 64  # floor for the auto-sized prefix-sum block


def pack_sequences(
    docs: DataFrame,
    budget: int = DEFAULT_BUDGET,
    block: int | None = None,
) -> DataFrame:
    """Assign each document its position in budget-token training
    shards under deterministic ``doc_id`` concatenation order.

    Output per doc: ``n_tokens`` (whitespace tokens — swap in a real
    tokenizer's counts upstream), ``shard_id`` (shard where the doc
    starts = exclusive-prefix-sum DIV budget), ``shard_offset``
    (token offset inside that shard) and ``n_shards_spanned``
    (straddling docs span > 1, exactly as GPT-style packing cuts
    mid-document).

    ``block=None`` auto-sizes to max(MIN_BLOCK, ⌈√n⌉). Results are
    block-size independent (property-tested); only the plan changes.
    """
    return pack_counts(
        docs.select(
            "doc_id", F.size(tokens_col()).cast("long").alias("n_tokens")
        ),
        budget=budget,
        block=block,
    )


def pack_counts(
    counts: DataFrame,
    budget: int = DEFAULT_BUDGET,
    block: int | None = None,
) -> DataFrame:
    """:func:`pack_sequences` over an EXPLICIT (doc_id, n_tokens)
    frame — the "swap in a real tokenizer's counts upstream" seam its
    docstring promises, made callable (r8 VERDICT ask #6 wires X103's
    BPE subword counts through here). Same two-level prefix sum, same
    output contract; only the token-count source changes. The packed
    universe is exactly ``counts``'s documents."""
    if block is None:
        block = max(MIN_BLOCK, math.isqrt(counts.count()) + 1)
    toked = counts.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        # integer DIV: exact in int64 (float division truncates above
        # 2^53); trunc-toward-zero stays monotone, all blocking needs
        F.expr(f"doc_id DIV {int(block)}").alias("_blk"),
    )
    blk_sums = toked.groupBy("_blk").agg(F.sum("n_tokens").alias("_blk_sum"))
    # single-partition BY DESIGN: ~√n aggregated rows. pmod(_blk, 1)
    # is constant 0 but not foldable, so the ordered window keeps its
    # global semantics without tripping Spark's all-data-to-one-
    # partition warning, which is aimed at full-table windows (a bare
    # F.lit would be constant-folded back to an empty partition spec).
    w_blk = (
        Window.partitionBy(F.pmod(F.col("_blk"), F.lit(1)))
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blk_offsets = blk_sums.select(
        "_blk",
        F.coalesce(F.sum("_blk_sum").over(w_blk), F.lit(0)).alias("_blk_off"),
    )
    w_in = (
        Window.partitionBy("_blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (
        F.col("_blk_off") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")
    )
    placed = toked.join(F.broadcast(blk_offsets), "_blk").select(
        "doc_id",
        "n_tokens",
        cum_before.alias("_before"),
    )
    end = F.col("_before") + F.col("n_tokens")
    return placed.select(
        "doc_id",
        "n_tokens",
        F.expr(f"_before DIV {budget}").alias("shard_id"),
        (F.col("_before") % budget).alias("shard_offset"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr(f"(_before + n_tokens - 1) DIV {budget}")
            - F.expr(f"_before DIV {budget}")
            + F.lit(1),
        )
        .otherwise(F.lit(1))
        .cast("long")
        .alias("n_shards_spanned"),
    )
