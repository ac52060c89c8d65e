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
from pyspark.sql.window import Window


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
    cells = cms_cells(items, item_col=item_col, depth=depth, width=width)
    return cms_probe(
        cells, candidates, item_col=item_col, depth=depth, width=width
    )


def _cms_cell(d: int, col: Column, width: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(str(d) + ":"), col)), 1, 7), 16, 10
    ).cast("long")
    return h % width


def cms_cells(
    items: DataFrame,
    group_cols: list[str] | None = None,
    item_col: str = "item",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """The Count-Min SKETCH itself as a frame — (group_cols..., d, c,
    n) counter cells, factored out of :func:`countmin_estimates` so
    per-key (per-day, per-source) sketches can be built, PERSISTED,
    and MERGED (:func:`cms_merge`): counters are sums, so summaries
    combine across days/clusters by cell-wise addition — the X91/X158
    re-aggregability contract for the counting family. One scan; the
    ×depth fan-out is a map-side explode."""
    it = F.col(item_col)
    gc = list(group_cols or [])
    flat = items.select(
        *gc,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _cms_cell(d, it, width).alias("c"),
                )
                for d in range(depth)
            ])
        ).alias("dc"),
    ).select(*gc, F.col("dc.d").alias("d"), F.col("dc.c").alias("c"))
    return flat.groupBy(*gc, "d", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def cms_merge(*cell_frames: DataFrame) -> DataFrame:
    """Merge Count-Min cell frames by cell-wise SUM (drop any group
    columns first to merge across them) — associative and
    commutative, so daily sketches roll up to any range without
    re-reading the stream."""
    it = iter(cell_frames)
    u = next(it)
    for f in it:
        u = u.unionByName(f)
    return u.groupBy("d", "c").agg(F.sum("n").cast("long").alias("n"))


def cms_probe(
    cells: DataFrame,
    candidates: DataFrame,
    item_col: str = "item",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Estimate candidate frequencies against a (d, c, n) cell frame:
    min over the candidate's depth counters."""
    it = F.col(item_col)
    cand_cells = candidates.select(
        it.alias("item"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _cms_cell(d, it, width).alias("c"),
                )
                for d in range(depth)
            ])
        ).alias("dc"),
    ).select("item", F.col("dc.d").alias("d"), F.col("dc.c").alias("c"))
    # LEFT join + coalesce-to-0: an empty counter cell is a 0, not a
    # missing row. An inner join would silently DROP a candidate whose
    # every cell is empty (no estimate at all) and would min() over
    # only the colliding cells otherwise — returning a positive
    # estimate where the sketch's true answer is 0. A candidate the
    # stream never contained must come back as cm_estimate = 0.
    return (
        cand_cells.join(F.broadcast(cells), ["d", "c"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cm_estimate"))
    )


# ---------------------------------------------------------------------------
# mergeable quantile sketch (log-binned histogram, DDSketch-style)
# ---------------------------------------------------------------------------

#: sub-bins per octave = 4 (the two bits after the leading bit), so a
#: bucket [t·2^e, (t+1)·2^e) with t ∈ [4,8) has width/(2·lower) ≤
#: 1/(2·4) = 12.5 % worst-case relative half-width — the γ≈2^(1/4)
#: resolution of the DDSketch family (Masson et al., VLDB '19) with
#: EXACT integer bin indices (no log(); floor-scaled cents + binary
#: digit count + one exact power-of-two division), so bin assignment
#: is bit-identical in any engine.
QSKETCH_SCALE = 100  # fixed-point cents — value resolution 0.01


def quantile_sketch_histogram(
    df: DataFrame, value: Column | str, group_cols: list[str] | None = None
) -> DataFrame:
    """Log₂-binned histogram of a non-negative value column:
    (*group_cols, bin_idx, rep, cnt) with rep = the bucket's midpoint.
    With ``group_cols`` the sketch is maintained PER KEY — the
    per-endpoint/per-tenant percentile shape — at |keys|·|bins| summary
    rows, still map-side-combining and still merge-by-adding-counts
    per key.

    THE property that justifies a sketch at 100 TB: this is a GROUP BY
    on a few hundred possible bins — map-side partial aggregation
    shrinks the shuffle to |bins| rows per task, the summary is
    ~KB-sized no matter the input, and two summaries MERGE by adding
    counts (re-aggregable across partitions, days, or clusters —
    unlike an exact percentile, which needs the full value multiset).
    Quantile queries then read the cumulative histogram
    (:func:`quantile_sketch_estimates`).

    Bins (scaled = floor(value·100), exact IEEE both engines):
    scaled = 0 → idx 0 (rep 0); 1 ≤ scaled ≤ 3 → idx = scaled (rep
    the cent mid); scaled ≥ 4 → with e = ⌊log₂ scaled⌋ − 2 (binary
    digit count, no float log) and t = ⌊scaled / 2^e⌋ ∈ [4,8):
    idx = 4·(e+2) + (t−4), rep = (t+0.5)·2^e — monotone in value,
    ≤ 12.5 % relative half-width."""
    v = F.col(value) if isinstance(value, str) else value
    # NULL/NaN rows are SKIPPED (standard SQL aggregate semantics) —
    # without the filter, greatest() null-skipping and NaN→0 casts
    # would silently count both as value 0.0, dragging every quantile
    # toward 0; negatives clamp to 0 so a stray one cannot land in a
    # garbage bin. Mirrored verbatim in the oracle SQL.
    df = df.filter(v.isNotNull() & ~F.isnan(v.cast("double")))
    scaled = F.greatest(F.floor(v * QSKETCH_SCALE).cast("long"), F.lit(0))
    msb = (F.length(F.bin(scaled)) - 1).cast("long")  # ⌊log₂⌋, exact
    e = msb - 2
    p2e = F.pow(F.lit(2.0), e.cast("double"))  # exact for e < 53
    t = F.floor(scaled.cast("double") / p2e).cast("long")
    idx = (
        F.when(scaled <= 3, scaled)
        .otherwise(4 * msb + t - 4)
        .alias("bin_idx")
    )
    rep = (
        F.when(scaled == 0, F.lit(0.0))
        .when(
            scaled <= 3,
            (scaled.cast("double") + 0.5) / F.lit(float(QSKETCH_SCALE)),
        )
        .otherwise((t.cast("double") + 0.5) * p2e / F.lit(float(QSKETCH_SCALE)))
        .alias("rep")
    )
    g = list(group_cols or [])
    reserved = {"bin_idx", "rep", "cnt"} & set(g)
    if reserved:
        # the summary's own column names; silently shadowing a group
        # key would corrupt the caller's data (the salted_join lesson)
        raise ValueError(f"group_cols collide with sketch columns: {reserved}")
    return (
        df.select(*g, idx, rep)
        .groupBy(*g, "bin_idx", "rep")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_sketch_estimates(
    hist: DataFrame, q_pcts: list[int], group_cols: list[str] | None = None
) -> DataFrame:
    """(*group_cols, q_pct, n, est) quantile estimates from a
    log-binned histogram: est = rep of the first bin where the
    cumulative count reaches ⌈q·n/100⌉ (per group when ``group_cols``
    is given — pass the SAME cols the histogram was built with). The
    rank comparison is pure int64 (100·cum ≥ q·n) — no float
    thresholds to disagree across engines. The histogram is bins-sized
    (×|keys| when grouped), so the window and the per-q min-scan stay
    summary-sized no matter the input scale."""
    g = list(group_cols or [])
    reserved = {"q_pct", "n", "est", "cum"} & set(g)
    if reserved:
        raise ValueError(f"group_cols collide with estimate columns: {reserved}")
    w = (
        Window.partitionBy(*g)
        .orderBy("bin_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        *g, "bin_idx", "rep", F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*g)).alias("n"),
    )
    qs = hist.sparkSession.createDataFrame(
        [(int(q),) for q in q_pcts], "q_pct int"
    )
    return (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.lit(100) * F.col("cum") >= F.col("q_pct") * F.col("n"))
        .groupBy(*g, "q_pct", "n")
        .agg(F.min(F.struct("bin_idx", "rep")).alias("_m"))
        .select(*g, "q_pct", "n", F.col("_m.rep").alias("est"))
    )


# ---------------------------------------------------------------------------
# X158: mergeable per-key distinct registers (HLL-shape, deterministic)
# ---------------------------------------------------------------------------

HLL_M = 64  # registers = 2^6 (bucket = first byte of md5 mod 64)
HLL_WBITS = 60  # hashed word bits per item (15 hex digits after the bucket)
#: Flajolet et al. '07 bias constant for m = 64
HLL_ALPHA = 0.709
#: the estimator numerator alpha·m²·2^WBITS+1, folded ONCE in Python so
#: both engines divide by S with the identical double constant (no
#: reliance on either engine's constant-folding order)
HLL_EST_NUM = HLL_ALPHA * float(HLL_M * HLL_M) * float(1 << (HLL_WBITS + 1))


def hll_registers(
    df: DataFrame, group_cols: list[str], value: Column | str
) -> DataFrame:
    """Per-group HyperLogLog REGISTER table — the mergeable summary
    X33's θ-sample is not (r10 VERDICT ask #3): X33 estimates one
    global distinct count per run; production counting wants per-key
    (per-language, per-source) distinct summaries that MERGE across
    days and clusters (the X91 re-aggregability contract, for
    distincts). A register row is (group, reg, rho): reg = first md5
    byte mod 64, rho = 1 + leading zeros of the next 60 hashed bits
    (computed as 61 - bitlength via ``bin()``, no float log — both
    engines implement md5 and bin identically, so registers are
    bit-for-bit reproducible and the ESTIMATE is oracle-checkable,
    unlike engine-internal ``approx_count_distinct`` state).

    Merging = groupBy(group, reg).max(rho) — associative, commutative,
    idempotent, so summaries combine across any partitioning, any
    day boundary, any cluster (pinned in tests/test_extensions.py:
    halves merged ≡ whole corpus, register-exact).

    Scale shape: one map-side projection + one (group, reg) aggregate
    whose output is ≤ 64 rows per key regardless of input size; the
    shuffle moves registers, never values."""
    v = F.col(value) if isinstance(value, str) else value
    reg, rho = hll_reg_cols(v)
    return (
        df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_reg_cols(v: Column) -> tuple[Column, Column]:
    """The per-item (reg, rho) column pair — factored so the batch
    register builder and the STREAMING register aggregate
    (streaming_hll_users) share one arithmetic."""
    h = F.md5(v)
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % HLL_M
    w = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rho = F.when(w == F.lit(0), F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return reg, rho


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge register tables (same schema) by register-max — the
    cross-day / cross-cluster combine step."""
    it = iter(register_frames)
    u = next(it)
    for f in it:
        u = u.unionByName(f)
    keys = [c for c in u.columns if c != "rho"]
    return u.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Reduce a register table to the raw HLL estimate per group.

    S = Σ_j 2^(61-ρ_j) over all 64 registers (absent registers are
    ρ=0 → 2^61 each) is computed EXACTLY in fixed point (decimal(38)
    integer sum — S ≤ 64·2^61 = 2^67, far inside 38 digits; no
    float harmonic mean, no order-dependent double summation), then
    ONE double division yields est = α·m²·2^61 / S. No small-range
    linear-counting correction: ln is libm territory (not IEEE-exact
    across engines), so the raw estimator ships and the audit query
    MEASURES its error instead (the X147 discipline).

    Output: group_cols + (n_zero_regs, est_distinct)."""
    term = F.expr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), {HLL_WBITS + 1} - rho) "
        "AS DECIMAL(38,0))"
    )
    two_w = F.lit(1 << (HLL_WBITS + 1)).cast("decimal(38,0)")
    agg = registers.groupBy(*group_cols).agg(
        F.sum(term).alias("_sp"),
        F.count(F.lit(1)).alias("_n"),
    )
    s = F.col("_sp") + (F.lit(HLL_M) - F.col("_n")).cast(
        "decimal(38,0)"
    ) * two_w
    return agg.select(
        *group_cols,
        (F.lit(HLL_M) - F.col("_n")).cast("long").alias("n_zero_regs"),
        (F.lit(HLL_EST_NUM) / s.cast("double")).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) set sketches + pairwise Jaccard estimation
# ---------------------------------------------------------------------------

#: sketch size for the cross-source overlap audit — 128 hashes per
#: group bounds the estimator's std err at ~1/sqrt(128) ≈ 0.09
KMV_K = 128


def kmv_sketches(
    items: DataFrame, group_col: str, item_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group KMV set sketch: the ``k`` LEXICOGRAPHICALLY smallest
    md5 hashes of the group's DISTINCT items (Beyer et al. 2007 —
    the mergeable distinct/overlap sketch family Theta generalizes).
    Deterministic by construction (md5 + (hash, rank) total order);
    a group with < k distinct items keeps them all, making its
    sketch EXACT. Output: (group_col, h, rk).

    Scale shape: one distinct + one per-group top-k window over
    hashes — k·|groups| rows survive; the items never move again."""
    h = F.md5(F.col(item_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        items.select(F.col(group_col), h.alias("h"))
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def kmv_jaccard_pairs(
    items: DataFrame, group_col: str, item_col: str, k: int = KMV_K
) -> DataFrame:
    """Pairwise Jaccard ESTIMATES between every two groups from their
    KMV sketches — the standard estimator: take the k smallest
    distinct hashes of the UNION of the two sketches, count how many
    live in BOTH; J ≈ matches / |union-k|. Exact set arithmetic over
    deterministic hashes, so both engines compute the identical
    estimate (the estimator's ERROR vs exact truth is the audited
    quantity, not engine noise).

    The use case is dedup PLANNING at 100 TB: "which source pairs
    share vocabulary" decides where near-dup detection should look
    first — sketches are k·|groups| rows total, so every pair
    comparison is metadata-sized regardless of corpus size, while the
    exact pairwise answer would re-shuffle the corpus per pair.

    Output: (group_a, group_b, n_common_k, n_union_k, est_jaccard),
    group_a < group_b."""
    s = kmv_sketches(items, group_col, item_col, k=k)
    ga = s.select(
        F.col(group_col).alias("group_a"), "h"
    )
    gb = s.select(
        F.col(group_col).alias("group_b"), "h"
    )
    # explicit cross join: the GROUP LISTS (metadata-sized — 20
    # sources, never items) pair up a < b; sketches then attach by
    # group key
    pairs = (
        ga.select("group_a")
        .distinct()
        .crossJoin(gb.select("group_b").distinct())
        .filter(F.col("group_a") < F.col("group_b"))
    )
    ua = pairs.join(ga, "group_a").select(
        "group_a", "group_b", "h", F.lit(1).alias("in_a"),
        F.lit(0).alias("in_b"),
    )
    ub = pairs.join(gb, "group_b").select(
        "group_a", "group_b", "h", F.lit(0).alias("in_a"),
        F.lit(1).alias("in_b"),
    )
    uni = (
        ua.unionByName(ub)
        .groupBy("group_a", "group_b", "h")
        .agg(
            F.max("in_a").alias("in_a"),
            F.max("in_b").alias("in_b"),
        )
    )
    w = Window.partitionBy("group_a", "group_b").orderBy("h")
    topu = uni.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    return (
        topu.groupBy("group_a", "group_b")
        .agg(
            F.sum(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1)
                .otherwise(0)
            ).cast("long").alias("n_common_k"),
            F.count(F.lit(1)).cast("long").alias("n_union_k"),
        )
        .select(
            "group_a",
            "group_b",
            "n_common_k",
            "n_union_k",
            (
                F.col("n_common_k").cast("double")
                / F.col("n_union_k").cast("double")
            ).alias("est_jaccard"),
        )
    )


#: Bloom-filter geometry for the FPR audit: m bits / k hash functions.
#: 2^16 bits over ~n·k set positions keeps the fixture fill in the
#: informative 10-60% band across SFs; both constants are interpolated
#: into the generated oracle so the engines share one geometry.
BLOOM_M = 1 << 16
BLOOM_K = 4


def bloom_positions(
    items: DataFrame, item_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """The k bit positions of each item under the md5-derived hash
    family h_i(x) = int(md5(x ':' i)[:15]) mod m — deterministic, so
    both engines materialize the identical bit set (the audited
    quantity is the FILTER's false-positive rate, not engine noise).
    Output: (item, pos), one row per (item, hash index), duplicates
    NOT collapsed (the caller chooses set- or probe-grain dedup).

    Scale shape: a projection + k-way explode — the filter build is
    one distinct over n·k ints; nothing ever re-shuffles the items."""
    idx = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("hi")
    with_i = items.select(F.col(item_col).alias("item"), idx)
    h = F.md5(F.concat(F.col("item"), F.lit(":"), F.col("hi").cast("string")))
    return with_i.select(
        "item",
        (
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(m)
        ).alias("pos"),
    )
