"""Deterministic hash sampling for corpus curation.

Training-data pipelines mix sources/languages at controlled rates
(e.g. up-sample high-quality English, down-sample boilerplate-heavy
strata). ``sample()`` here is NOT Spark's ``DataFrame.sample`` —
that draws from a per-partition RNG, so results change with
partitioning, retries and cluster size. Hash sampling keys the
keep/drop decision on a stable row id: the same corpus yields the
same sample on any cluster, any partition layout, any engine — which
is also what makes it oracle-checkable and makes reruns reproducible
for ablations.

Scale: the decision is one md5 + modulus per row, map-side, no
shuffle; rate changes recut the sample without moving data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: md5 hex chars used for the bucket hash (28 bits — uniform, and the
#: same prefix-int trick the dedup operators use, exact in int64).
_HEX = 7


def hash_bucket(id_col: Column | str = "doc_id", buckets: int = 100) -> Column:
    """Stable uniform bucket in [0, buckets) from a row id: first 7 md5
    hex chars of the id's string form, as int, mod buckets."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, _HEX), 16, 10).cast("long")
    return (h % buckets).alias("bucket")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    default_rate: int = 0,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's
    percentage rate (``rates['en'] = 50`` keeps ~50% of English docs,
    exactly reproducibly). Strata missing from ``rates`` fall back to
    ``default_rate`` (0 = drop)."""
    rate = F.lit(default_rate)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return docs.filter(hash_bucket(id_col) < rate)


def quality_weighted_sample(
    scored: DataFrame,
    score_col: str = "quality_score",
    id_col: str = "doc_id",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Importance sampling for corpus curation: keep each row with
    probability equal to its quality score in [0, 1] — high-quality
    documents survive almost surely, boilerplate mostly drops, and the
    expected quality of the sample rises without a hard cutoff's cliff
    (the soft alternative to curation_pipeline's QUALITY_FLOOR).

    Deterministic like everything in this module: the uniform draw is
    the stable 28-bit id hash mod ``resolution`` compared against
    ``score × resolution`` — same sample on any cluster/partition
    layout/engine. (2^28 is not an exact multiple of the resolution, so
    the top of the range carries a ~0.3% bias — irrelevant for curation
    and identical in both engines.) Map-side filter, no shuffle."""
    # the shared hash, not an inline re-spelling: one definition of
    # the engine-portability-critical expression
    return scored.filter(
        hash_bucket(id_col, resolution) < F.col(score_col) * resolution
    )


def sample_fixed_k(
    docs: DataFrame,
    k: int = 200,
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Deterministic fixed-SIZE sample (the reservoir-sampling use
    case, distribution-style): rank every row by the stable md5 of
    its id and keep the first ``k`` — uniform-ish over ids, exactly
    reproducible on any cluster/partitioning/engine, and guaranteed
    EXACTLY k rows (rate-based sampling only hits k in expectation).
    Compiles to TakeOrderedAndProject — no global sort ever
    materializes; at 100 TB each partition keeps its local top-k and
    only k·partitions candidate rows move. ``keep_cols`` defaults to
    the documents-table carry-through; pass () for an arbitrary
    frame."""
    h = F.md5(F.col(id_col).cast("string"))
    return (
        docs.select(id_col, *keep_cols, h.alias("_h"))
        .orderBy("_h", id_col)
        .limit(k)
        .drop("_h")
    )


def train_val_test_split(
    docs: DataFrame,
    train_pct: int = 90,
    val_pct: int = 5,
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Deterministic train/val/test assignment by stable hash bucket —
    the split every training pipeline needs to be REPRODUCIBLE and
    DISJOINT by construction (a row's bucket is a pure function of
    its id: re-runs, late-arriving shards, and other engines all
    agree; no coordination, no stored split table). Map-side only.

    Buckets [0, train_pct) → train, [train_pct, train_pct+val_pct) →
    val, rest → test. ``keep_cols`` defaults to the documents-table
    carry-through; pass () for an arbitrary frame."""
    b = hash_bucket(id_col, buckets=100)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(id_col, *keep_cols, split.alias("split"))


def mixture_plan(
    docs: DataFrame,
    budget_tokens: int = 100_000,
    weights_mod: int = 3,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Training-mixture allocation: given per-source token inventories
    and per-source sampling weights, allocate a global token budget
    proportionally and report the fill ratio — the planning step of
    LLaMA-style data-mixture recipes (web × w1, books × w2, ...),
    here with deterministic weights w = 1 + (source number mod
    ``weights_mod``) so the oracle replays the identical plan.

    All allocation arithmetic is integer (weight × budget DIV Σw) —
    exact and engine-identical; only the final fill/demand ratios are
    single double divisions. The per-source aggregate is one shuffle
    over |sources| groups; the Σw total rides a 1-row broadcast.

    ``counts``: optional EXPLICIT (doc_id, n_tokens) frame — the
    real-tokenizer seam (r8 VERDICT ask #6 budgets on X103's BPE
    subword counts). When given, the inventory covers exactly the
    counted documents (inner join — a doc a tokenizer can't count
    contributes no budgetable tokens); default stays the whitespace
    tokenizer over every doc."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.text import (
        tokens_col,
    )

    # shared tokenizer, not a raw split: split('') returns [''] and
    # would count every blank doc as 1 available token, contradicting
    # token_stats/pack_sequences for the same document
    if counts is not None:
        docs = docs.select("doc_id", "source").join(
            counts.select("doc_id", "n_tokens"), "doc_id"
        )
    toks = F.col("n_tokens") if counts is not None else F.size(tokens_col())
    # the weight's source number comes from a digit-tail extract, not
    # a positional substring: CAST(substr(source,4) AS INT) is an ANSI
    # CAST_INVALID_INPUT crash for any real-world source name ('web',
    # 'books'); a name with no digit tail gets number 0 → weight 1
    src_num = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col("source"), r"(\d+)$", 1), F.lit("")
        ).cast("int"),
        F.lit(0),
    )
    per_source = (
        docs.select(
            "source",
            toks.cast("long").alias("_t"),
            (src_num % weights_mod + 1).cast("long").alias("weight"),
        )
        .groupBy("source", "weight")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_t").alias("avail_tokens"),
        )
    )
    wtot = per_source.agg(F.sum("weight").alias("_wsum"))
    target = F.expr(f"weight * {budget_tokens} DIV _wsum")
    alloc = F.least(F.col("avail_tokens"), F.col("_target"))
    return (
        per_source.crossJoin(F.broadcast(wtot))
        .withColumn("_target", target)
        .select(
            "source",
            "weight",
            "n_docs",
            "avail_tokens",
            F.col("_target").alias("target_tokens"),
            alloc.alias("alloc_tokens"),
            (
                alloc.cast("double") / F.col("_target").cast("double")
            ).alias("fill_ratio"),
        )
        .orderBy("source")
    )


def per_source_cap(
    scored_docs: DataFrame,
    cap: int = 10,
    source_col: str = "source",
    priority_col: str = "quality_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document cap — the RefinedWeb/C4 anti-domination
    rule: no single domain/source may contribute more than ``cap``
    documents, and when a source exceeds it, keep the BEST ones
    (ranked by ``priority_col`` descending, id ascending for a full
    deterministic order). Returns the surviving rows with their
    ``src_rank``.

    Scale shape: rank-then-filter compiles to Spark's WindowGroupLimit
    pushdown (plan-pinned in tests/test_plans.py) — each map task
    keeps only its local top-``cap`` per source BEFORE the shuffle, so
    the exchange carries ≤ cap·tasks rows per source instead of the
    source's full volume. That is what makes the cap survive the
    hot-domain skew it exists to police: the 100×-over-cap domain is
    exactly the one whose rows die map-side."""
    if cap < 1:
        raise ValueError(f"cap={cap} must be >= 1")
    from pyspark.sql.window import Window

    w = Window.partitionBy(source_col).orderBy(
        F.desc(priority_col), F.col(id_col).asc()
    )
    return (
        scored_docs.withColumn("src_rank", F.row_number().over(w))
        .filter(F.col("src_rank") <= cap)
    )


def sample_fixed_k_per_group(
    docs: DataFrame,
    k: int = 20,
    group_col: str = "lang",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """X143: deterministic fixed-k sample PER STRATUM — the
    group-wise form of :func:`sample_fixed_k` (exactly k rows per
    group when the group has ≥ k rows, all of them otherwise), ranked
    by the stable md5 of the row id inside each group. The eval-set
    builder's shape: "give me 20 uniform docs per language,
    reproducibly, on any cluster".

    Scale shape: rank-then-filter over a group-partitioned window —
    the same WindowGroupLimit map-side pushdown per_source_cap pins
    (each task keeps its local top-k per group BEFORE the shuffle),
    so a billion-row language costs the exchange ≤ k·tasks rows."""
    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    from pyspark.sql.window import Window

    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.select(id_col, group_col, *keep_cols)
        .withColumn("grp_rank", F.row_number().over(w))
        .filter(F.col("grp_rank") <= k)
    )


#: X197 temperatures: dyadic exponents only — s^(1/2) and s^(1/4)
#: evaluate as IEEE-correctly-rounded sqrt chains, identical in Spark
#: and DuckDB, so the plan stays inside the exactness contract (an
#: arbitrary pow(s, 0.3) is libm-dependent and would not hash).
MIX_TEMPERATURES = (1.0, 0.5, 0.25)
#: weight quantization: one round() per (source, tau), summed in int64
MIX_W_SCALE = 10**12


def mixture_temperature(
    docs: DataFrame,
    budget_tokens: int = 100_000,
) -> DataFrame:
    """Temperature-scaled mixture allocation — the multilingual-LLM
    rebalancing move (mT5/XLM-R: sample source i with p_i ∝ s_i^τ
    where s_i is its natural share; τ = 1 keeps natural proportions,
    τ → 0 flattens toward uniform, lifting under-represented sources
    at the cost of over-sampling them). One row per (source, τ) with
    the natural share, the τ-scaled sampling probability, the token
    allocation under the global budget, and the OVERSAMPLE factor
    (p_i / s_i — how many epochs of a small source the plan implies;
    the number that warns about memorizing a tiny source).

    Exactness: natural shares are single divisions of exact int64
    token counts; τ-weights are sqrt chains (see MIX_TEMPERATURES);
    each weight is quantized ONCE (round(w·10¹²) → int64) so the
    normalizing sum is exact integer arithmetic and probabilities /
    allocations are single divisions of exact ints — the X125
    quantize-once idiom. Scale: one per-source aggregate + 1-row
    broadcast totals; the τ fan-out is |sources|·|τ| rows of
    metadata."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.text import (
        tokens_col,
    )

    per_source = (
        docs.select("source", F.size(tokens_col()).cast("long").alias("_t"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_t").cast("long").alias("avail_tokens"),
        )
    )
    tot = per_source.agg(
        F.sum("avail_tokens").cast("long").alias("_total")
    )
    shared = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "avail_tokens",
        (
            F.col("avail_tokens").cast("double")
            / F.col("_total").cast("double")
        ).alias("natural_share"),
    )
    out = None
    for tau in MIX_TEMPERATURES:
        w = F.col("natural_share")
        t = tau
        while t < 1.0:
            w = F.sqrt(w)
            t *= 2
        row = shared.select(
            "source",
            F.lit(float(tau)).alias("tau"),
            "n_docs",
            "avail_tokens",
            "natural_share",
            F.round(w * F.lit(float(MIX_W_SCALE)), 0)
            .cast("long")
            .alias("_wq"),
        )
        out = row if out is None else out.unionByName(row)
    wtot = out.groupBy("tau").agg(F.sum("_wq").cast("long").alias("_wsum"))
    return (
        out.join(F.broadcast(wtot), "tau")
        .select(
            "source",
            "tau",
            "n_docs",
            "avail_tokens",
            "natural_share",
            (
                F.col("_wq").cast("double") / F.col("_wsum").cast("double")
            ).alias("sample_prob"),
            F.expr(f"_wq * {budget_tokens} DIV _wsum")
            .cast("long")
            .alias("target_tokens"),
            (
                (F.col("_wq").cast("double") / F.col("_wsum").cast("double"))
                / F.col("natural_share")
            ).alias("oversample_factor"),
        )
        .orderBy("source", "tau")
    )
