"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding near-dup.

All hashing is md5-based (available and identical in Spark, DuckDB,
Python), so every operator is engine-portable and oracle-checkable.
Everything below is built-in column expressions + hash-partitioned
joins — no Python UDFs, no driver-side loops.

Scale design (the part that matters at 100 TB):
- exact dedup: one hash-shuffle on md5(text) — the minimal possible.
- MinHash/LSH: signatures are per-row expressions (linear scan);
  candidate generation is an equi-join on (band, band_key) — a hash
  shuffle on short keys, NEVER an all-pairs comparison. This is the
  standard SIGMOD-style LSH banding layout.
- SimHash: near-pair candidates via the pigeonhole principle — 60 bits
  split into 4 bands of 15; hamming ≤ 3 ⟹ at least one band equal, so
  an equi-join on (band_idx, band_value) finds ALL qualifying pairs
  with zero false negatives, then the exact hamming filter prunes.
- pairwise Jaccard is the O(candidates) VERIFIER, meant to consume
  LSH candidates; the all-pairs form exists for oracle-checking at
  small SF and is clearly marked quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark.operators.ckpt import materialize
from pyspark.sql.window import Window

from aws_kinesis_data_ingestion_restapi_spark.operators.text import tokens_col

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash: one row per distinct
    text, keeping the smallest doc_id (the canonical survivor) and the
    duplicate count. Single hash-shuffle on md5 — the cheapest possible
    distributed dedup."""
    return (
        docs.groupBy(F.md5(text_col).alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def distinct_tokens(toks: Column | None = None) -> Column:
    return F.array_distinct(tokens_col() if toks is None else toks)


def tokenized(docs: DataFrame) -> DataFrame:
    """(doc_id, _toks) projection — tokenization materialized ONCE.

    Every shingle builder below takes the resulting ``_toks`` column.
    Inlining the split expression inside a per-shingle lambda instead
    would re-run the split for every element_at — O(tokens²) per
    document. A separate projection keeps it linear; CollapseProject
    won't merge it back because the alias is expensive and referenced
    many times."""
    return docs.select("doc_id", tokens_col().alias("_toks"))


def word_ngrams(n: int, toks: Column | None = None) -> Column:
    """Distinct word n-gram (shingle) set over a token-array column
    (pass the materialized ``_toks`` from ``tokenized`` — see there for
    why; defaults to inline tokenization for tiny/test frames).

    Guarded for docs shorter than n tokens (Spark's sequence(1, 0)
    would count DOWN; DuckDB's generate_series yields empty — the
    guard makes both produce an empty set)."""
    toks = tokens_col() if toks is None else toks
    size = F.size(toks)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(
        size >= n,
        F.array_distinct(F.transform(F.sequence(F.lit(1), size - (n - 1)), gram)),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact set-similarity join via prefix filtering)
# ---------------------------------------------------------------------------

# 28-bit shingle hash (7 md5 hex chars): int set operations are ~10×
# faster than string sets on BOTH engines (measured 60 s → 6 s on the
# sf0.01 verification join), arithmetic is exact in int64 everywhere,
# and the sorted int array doubles as the prefix-filter global order.
GRAM_HASH_HEX = 7


def hashed_ngrams(n: int, toks: Column | None = None) -> Column:
    """Sorted distinct int-hashed word n-gram set of the text column:
    shingle → first 7 md5 hex chars → 28-bit int, deduped and
    ascending-sorted. The canonical set representation for the Jaccard
    operators (Jaccard over hashed shingles ≡ Jaccard over shingles
    modulo negligible 28-bit collisions — standard dedup practice)."""
    grams = word_ngrams(n, toks)
    hashed = F.transform(
        grams,
        lambda s: F.conv(F.substring(F.md5(s), 1, GRAM_HASH_HEX), 16, 10).cast("long"),
    )
    return F.array_sort(F.array_distinct(hashed))


def df_ordered(grams: DataFrame) -> DataFrame:
    """Re-order each document's gram set by ascending corpus document
    frequency (ties on the gram value) — the classical AllPairs
    rarity ordering (Bayardo WWW'07 §3.1).

    Prefix tokens under this order are each document's RAREST shingles,
    so candidate-join buckets stay tiny: a stop-shingle shared by most
    of the corpus lands at the END of every set and never enters a
    prefix at moderate thresholds. Hash order (a random permutation)
    admits those hot shingles into prefixes, and at low thresholds the
    candidate set degenerates toward quadratic — measured 10× slower
    at t=0.2 on the 5k-doc fixture. Cost: one (gram → df) aggregate
    plus one re-collect shuffle, both linear in corpus token count —
    the standard price every production ssjoin pays.
    """
    tok_df = grams.select(F.explode("grams").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("_df")
    )
    return (
        grams.select("doc_id", F.explode("grams").alias("tok"))
        .join(tok_df, "tok")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("tok")))
            ).alias("_st")
        )
        .select(
            "doc_id", F.transform("_st", lambda s: s["tok"]).alias("grams")
        )
    )


def prefix_filter_candidates(grams: DataFrame, threshold: float) -> DataFrame:
    """Exact candidate pairs for a Jaccard-threshold set-similarity join
    via prefix filtering (the AllPairs / ssjoin family, Bayardo et al.
    WWW'07): two sets with J ≥ t MUST share at least one element inside
    their first ``|X| − ⌈t·|X|⌉ + 1`` elements under any fixed global
    ordering — so candidate generation is an equi-join on exploded
    prefix tokens (a hash shuffle on short int keys), never an O(n²)
    scan, and has ZERO false negatives.

    Input: (doc_id, grams array<long>) under any GLOBAL total order —
    pass the output of :func:`df_ordered` (rarity order) for
    production-shaped candidate counts; hash order is correct but
    degenerates at low thresholds (see there).

    Output: distinct (doc_a, doc_b), doc_a < doc_b. Two exact prunes
    run inside the join, before the distinct:

    - size pruning: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so pairs with
      t·|A| > |B| (or vice versa) never materialize;
    - positional pruning (PPJoin, Xiao et al. WWW'08): J ≥ t needs
      overlap o ≥ t·(|A|+|B|)/(1+t), and for the FIRST shared token
      (positions pA, pB under the global order) o ≤ min(|A|−pA,
      |B|−pB); later shared tokens only tighten that bound, so
      dropping rows that fail it loses no true pair. At low
      thresholds this is the difference between near-all-pairs and a
      real candidate set (measured 9.2M → far fewer at t=0.2).
    """
    size = F.size("grams")
    plen = size - F.ceil(F.lit(threshold) * size).cast("int") + 1
    pref = grams.select(
        "doc_id",
        size.alias("sz"),
        F.posexplode(F.slice("grams", 1, plen)).alias("pos", "tok"),
    )
    a = pref.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sz").alias("sz_a"),
        F.col("pos").alias("pos_a"),
        "tok",
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sz").alias("sz_b"),
        F.col("pos").alias("pos_b"),
        "tok",
    )
    t = float(threshold)
    # required overlap, slightly relaxed (−1e-9) so float rounding can
    # only under-prune, never drop a true pair
    alpha = F.lit(t / (1.0 + t)) * (F.col("sz_a") + F.col("sz_b")) - F.lit(1e-9)
    ubound = F.least(
        F.col("sz_a") - F.col("pos_a"), F.col("sz_b") - F.col("pos_b")
    )
    return (
        a.join(b, "tok")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # size pruning: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|)
            & (F.col("sz_b") >= F.lit(t) * F.col("sz_a"))
            & (F.col("sz_a") >= F.lit(t) * F.col("sz_b"))
            # positional pruning (exact for the first shared token;
            # ANY-row-passes ⊇ first-row-passes, so no false negatives)
            & (ubound >= alpha)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def count_join_pairs(grams: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard pairs via the token-index count join: explode the
    (distinct) gram sets, equi-join on the gram, COUNT shared grams per
    pair, derive J = c/(|A|+|B|−c). No candidate set, no per-pair
    array intersections — the whole computation is one shuffle join
    plus one aggregate, all codegen.

    Work is Σ_gram df(gram)² join rows: superb when document
    frequencies are bounded (measured 10× faster than prefix+verify on
    the 5k-doc fixture at t=0.2), catastrophic on Zipfian corpora
    where one hot shingle hits a constant fraction of documents —
    which is why :func:`ngram_jaccard_pairs` picks between this and
    prefix filtering from the measured df distribution, not a guess.
    """
    t = float(threshold)
    toks = grams.select(
        "doc_id", F.size("grams").alias("sz"), F.explode("grams").alias("tok")
    )
    a = toks.select(
        F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"), "tok"
    )
    b = toks.select(
        F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"), "tok"
    )
    shared = (
        a.join(b, "tok")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("sz_b") >= F.lit(t) * F.col("sz_a"))
            & (F.col("sz_a") >= F.lit(t) * F.col("sz_b"))
        )
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    jac = F.col("_c").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("_c")
    )
    return shared.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


#: count-join is chosen when its join volume Σdf² stays within this
#: multiple of the token count Σdf (i.e. bounded fan-out per token).
#: Calibrated against the measured crossover: at ratio ≈285 (sf0.1
#: fixture) count-join runs 3.6 s vs 33 s for prefix+verify — the
#: short-row count join is ~10× cheaper per unit of Σdf² than the
#: array-verify path is per candidate. Zipfian web corpora sit at
#: ratios of 10⁵–10⁷ (one hot shingle in a constant fraction of
#: documents), so the prefix guard still engages exactly where the
#: count join would detonate.
COUNT_JOIN_BUDGET = 2000

#: Audit trail of the last ``method='auto'`` decision, for bench
#: attribution: {"method", "s1" (Σdf), "s2" (Σdf²), "ratio"}. Written
#: on every auto-mode call; read by bench notes / tests. A module
#: global (not df metadata) because the decision happens driver-side
#: at plan-construction time.
LAST_SSJOIN_REPORT: dict = {}

#: At most one persisted auto-mode grams frame per session (see the
#: unpersist note inside ngram_jaccard_pairs).
_AUTO_GRAMS_CACHE: list = []


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 2,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    method: str = "auto",
) -> DataFrame:
    """Word n-gram Jaccard similarity pairs ≥ threshold — an EXACT
    distributed set-similarity join over hashed shingle sets.

    ``method``:
    - ``'auto'`` (default): one cheap aggregate over the token index
      measures Σdf and Σdf² — the actual join volume of the count-join
      form — and picks ``'countjoin'`` when Σdf² ≤
      :data:`COUNT_JOIN_BUDGET`·Σdf (bounded fan-out), else
      ``'prefix'``. Measured, not guessed: the two
      forms differ 10× in either direction depending on the df
      distribution. Auto mode is EAGER: it runs the stats job (and
      persists the shingle frame for reuse) at construction time, and
      records its decision in :data:`LAST_SSJOIN_REPORT`.
    - ``'prefix'``: rarity-ordered prefix filtering + pair
      verification (Bayardo AllPairs + PPJoin positional prune) —
      immune to hot shingles, the 100 TB-safe form.
    - ``'countjoin'``: token-index count join — fastest when document
      frequencies are bounded.

    All forms produce identical results (zero false negatives /
    positives). Pass ``candidates`` (columns doc_a, doc_b) to verify
    an externally blocked set instead — e.g. feed
    ``minhash_lsh_pairs`` / ``simhash_near_pairs`` output through the
    same exact-Jaccard verifier.
    """
    grams = tokenized(docs).select(
        F.col("doc_id"), hashed_ngrams(n, F.col("_toks")).alias("grams")
    ).repartition(F.col("doc_id"))
    if candidates is None:
        if method == "auto":
            # NOTE: auto mode runs one EAGER Spark job here (the Σdf /
            # Σdf² stats aggregate) at DataFrame-construction time —
            # the price of a measured, not guessed, plan choice. The
            # grams frame is persisted first so the tokenize+shingle
            # work is paid once and reused by the join below instead
            # of recomputed from the parquet scan. The PREVIOUS auto
            # call's frame is unpersisted here: no caller ever gets a
            # handle to do it, so without this a session that loops
            # the auto path (gate runs, notebooks) pins one dead
            # cached frame per call forever. At most ONE grams frame
            # stays cached per session; an older returned plan simply
            # recomputes if executed after a newer auto call.
            grams = grams.persist()
            for prev in _AUTO_GRAMS_CACHE:
                prev.unpersist(False)
            _AUTO_GRAMS_CACHE.clear()
            _AUTO_GRAMS_CACHE.append(grams)
            stats = (
                grams.select(F.explode("grams").alias("tok"))
                .groupBy("tok")
                .agg(F.count(F.lit(1)).alias("df"))
                .agg(
                    F.sum("df").alias("s1"),
                    F.sum(F.col("df") * F.col("df")).alias("s2"),
                )
                .collect()[0]
            )
            s1, s2 = stats["s1"] or 0, stats["s2"] or 0
            method = "countjoin" if s2 <= COUNT_JOIN_BUDGET * s1 else "prefix"
            LAST_SSJOIN_REPORT.clear()
            LAST_SSJOIN_REPORT.update(
                {
                    "method": method,
                    "s1": int(s1),
                    "s2": int(s2),
                    "ratio": round(s2 / s1, 1) if s1 else 0.0,
                }
            )
            print(f"[ngram_jaccard] auto-selected {LAST_SSJOIN_REPORT}", flush=True)
        if method == "countjoin":
            return count_join_pairs(grams, threshold)
        # rarity-order the sets first: prefix buckets shrink from
        # hot-shingle-sized to rare-shingle-sized (exactness unchanged
        # — any global order is valid; Jaccard verification below is
        # order-insensitive)
        grams = df_ordered(grams).repartition(F.col("doc_id"))
        candidates = prefix_filter_candidates(grams, threshold)
    # the per-doc gram table is corpus-size/|docs| smaller than the
    # candidate table — broadcast both legs of the verification join
    # when small; Catalyst/AQE falls back to shuffle join beyond the
    # autoBroadcastJoinThreshold
    pairs = (
        candidates.join(
            grams.select(
                F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a")
            ),
            "doc_a",
        ).join(
            grams.select(
                F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b")
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    jac = inter.cast("double") / union
    return (
        pairs.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


# universal-hash permutation schedule for MinHash: perm_i(h) =
# (A_i·h + B_i) mod MERSENNE with A_i odd, both derived from i — fixed
# and engine-portable. h is 28 bits (7 md5 hex chars), so A_i·h + B_i
# stays far inside a signed 64-bit integer in every engine.
MINHASH_MOD = 2_147_483_647  # 2^31 − 1 (Mersenne prime)


def _perm_a(i: int) -> int:
    return 2 * i + 1


def _perm_b(i: int) -> int:
    return 1_000_003 * (i + 1)


def minhash_signatures(
    docs: DataFrame, num_perm: int = 32, shingle_words: int = 3
) -> DataFrame:
    """MinHash signature per document over the distinct word-shingle set.

    Each shingle is hashed ONCE (first 7 md5 hex chars → 28-bit int);
    the ``num_perm`` signature components are cheap integer
    permutations of that hash — the standard one-hash MinHash layout,
    ~num_perm× less hashing than md5-per-permutation, and exact integer
    arithmetic in any engine.

    Shingling (vs raw unigrams) is what makes the sketch measure
    DOCUMENT similarity rather than vocabulary overlap — with
    ``shingle_words=1`` any two docs over a small shared vocabulary
    look near-identical.

    The repartition between the shingle projection and the signature
    projection is deliberate: higher-order array expressions are
    interpreted (not codegen'd), and without an exchange barrier
    Catalyst collapses the projections and re-derives the whole shingle
    array once per permutation.

    Documents whose shingle set is EMPTY (NULL text or fewer than
    ``shingle_words`` tokens) are EXCLUDED from the frame: Jaccard
    over an empty set is undefined, and the all-NULL signature such a
    doc would otherwise get collapses to the identical ``md5("")``
    band key in EVERY band downstream — s short docs in a corpus
    would become O(s²) mutual LSH candidates while two byte-identical
    short docs still estimated 0.0 (NULL component comparisons drop
    out). Short docs are the exact-dedup family's job
    (:func:`exact_dedup` hashes the raw text)."""
    t = F.col("_toks")
    feats = word_ngrams(shingle_words, t) if shingle_words > 1 else distinct_tokens(t)
    hashed = F.transform(
        feats, lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")
    )
    # The exclusion filter is a TOKEN-COUNT predicate, deliberately:
    # the shingle set is empty exactly when the doc has fewer than
    # shingle_words tokens, and size(_toks) pushes down to the scan as
    # ONE split per row. A filter on the _hs array itself looks
    # equivalent but is a performance trap — Catalyst pushes it
    # through the projections, inlining the tokenize into every
    # element_at of the shingle lambda (O(tokens²) per doc in the
    # filter; measured 45-100× on the sf0.1 corpus).
    min_toks = shingle_words if shingle_words > 1 else 1
    shingled = (
        tokenized(docs)
        .filter(F.size("_toks") >= min_toks)
        .select("doc_id", hashed.alias("_hs"))
        .repartition(F.col("doc_id"))
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("_hs"),
                lambda h: (
                    (F.lit(2) * i + 1) * h + (F.lit(1_000_003) * (i + 1))
                )
                % F.lit(MINHASH_MOD),
            )
        ),
    )
    return shingled.select("doc_id", sig.alias("sig"))


def minhash_band_keys(
    sigs: DataFrame, num_perm: int = 32, bands: int = 4,
    carry: tuple = (),
) -> DataFrame:
    """(doc_id, band, band_key) LSH banding of a signature frame.

    This IS the persistable index of an incremental dedup deployment:
    written once for the corpus (bucketed by band_key at scale) and
    probed by each new batch — see :func:`incremental_dedup_delta`.
    Factored out of :func:`minhash_lsh_pairs` so the self-join and the
    corpus-probe paths band identically (and identically to the DuckDB
    oracle's banding CTE).

    ``carry``: extra column names passed through the band explode
    unchanged — the STREAMING probe path carries ``sig`` this way so
    the verify stage never has to re-join the signature onto its own
    stream (a stream-stream self-join Structured Streaming would
    reject without watermarks; batch callers leave it empty)."""
    if bands <= 0 or num_perm % bands != 0:
        # silent truncation would band over only the first
        # bands·(num_perm//bands) components — a different b·r
        # collision curve than requested; bands > num_perm is worse
        # (empty slices → one constant band key for every doc → full
        # cross-product in the band join)
        raise ValueError(
            f"bands={bands} must evenly divide num_perm={num_perm}"
        )
    rows_per_band = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(
        "doc_id", *carry, F.explode(band_structs).alias("bk")
    ).select("doc_id", *carry, "bk.band", "bk.band_key")


def _est_jaccard_col(num_perm: int) -> Column:
    """Matching-signature fraction of ``sig_a`` vs ``sig_b`` — the
    exact-integer MinHash Jaccard estimate, one double division."""
    matches = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(num_perm)),
            lambda i: F.element_at("sig_a", i) == F.element_at("sig_b", i),
        )
    )
    return matches.cast("double") / F.lit(float(num_perm))


def minhash_candidate_pairs(banded: DataFrame) -> DataFrame:
    """Distinct band-collision candidate pairs (doc_a < doc_b) of a
    :func:`minhash_band_keys` frame — the banding stage's output
    BEFORE the estimate-threshold filter, factored out so
    :func:`minhash_lsh_pairs` and the LSH quality audit
    (registry_ext.dedup_lsh_quality) measure the IDENTICAL candidate
    generation: an equi-join shuffle on (band, band_key), never
    all-pairs."""
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame | None,
    num_perm: int = 32,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_words: int = 3,
    sigs: DataFrame | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """MinHash near-dup pairs via LSH banding.

    Signature rows are split into ``bands`` bands of num_perm/bands
    rows; documents sharing any band key become candidates (equi-join
    shuffle on the band key — never all-pairs), then the estimated
    Jaccard (matching signature fraction) filters at ``threshold``.

    ``sigs`` lets a caller supply an already-materialized signature
    frame (e.g. a session-shared one) — it must be the output of
    :func:`minhash_signatures` with the same ``num_perm`` /
    ``shingle_words``; ``docs`` is ignored in that case.
    ``candidates`` additionally skips the banding self-join — it must
    be :func:`minhash_candidate_pairs` output over the same
    parameters (the registry session-caches that frame so the pair
    query and the quality audit share ONE candidate computation).
    Same passthrough contract as ``ngram_jaccard_pairs(candidates=)``.
    """
    if sigs is None:
        if docs is None:
            raise ValueError("provide docs or sigs")
        # second barrier: materialize the signatures once; the banding
        # self-join and the verification joins below then REUSE the same
        # exchange instead of recomputing signatures per plan branch
        sigs = minhash_signatures(docs, num_perm, shingle_words).repartition(
            F.col("doc_id")
        )
    if candidates is None:
        candidates = minhash_candidate_pairs(
            minhash_band_keys(sigs, num_perm, bands)
        )
    cand = candidates
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = _est_jaccard_col(num_perm)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def incremental_dedup_delta(
    corpus_sigs: DataFrame,
    delta_sigs: DataFrame,
    num_perm: int = 32,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Single-pass incremental dedup of a new batch against a corpus.

    THE dedup shape a 100 TB deployment actually runs: the corpus's
    LSH index (:func:`minhash_band_keys` rows + signatures) is a
    write-once persisted artifact, and each new crawl batch is deduped
    by PROBING it — the corpus is never re-shingled, never re-hashed,
    and above all never self-joined. Both probe joins here are
    equi-joins on (band, band_key):

    - delta × corpus-index: shuffles only the delta side when the
      corpus index is bucketed by band_key (AQE broadcasts the delta
      bands outright when the batch is small);
    - delta × delta: bounded by the batch size, independent of corpus
      size.

    Per delta document the verdict is, in precedence order:

    - ``dup_of_corpus``: some corpus document matches at
      ``threshold`` (best match = highest estimated Jaccard, ties to
      the smallest corpus doc_id);
    - ``dup_in_delta``: no corpus match, but an EARLIER (smaller
      doc_id) corpus-surviving delta document matches — keep-first
      within the batch, matched only against docs that themselves
      survived the corpus check (a doc already dropped as a corpus
      duplicate can't be a keeper);
    - ``novel``: neither.

    Single-pass means in-batch clusters resolve to their EARLIEST
    member, not to a transitive canonical: every corpus-surviving doc
    (novel OR dup_in_delta) is a valid keeper for later docs, so a
    chain A←B←C reports C as dup_in_delta of B even though B was
    itself dropped as a dup of A — follow match_doc_id links (or run
    the connected-components family) when a retained canonical is
    needed. That is the standard streaming-ingest contract: each
    batch is filtered once, and only docs marked novel join the
    corpus index.

    Returns (doc_id, verdict, match_doc_id, est_jaccard) for every
    delta document; match columns are NULL for novel docs. All
    arithmetic is exact integers until the one final double division,
    so the output is bit-identical to the SQL oracle."""
    corpus_bands = minhash_band_keys(corpus_sigs, num_perm, bands)
    delta_bands = minhash_band_keys(delta_sigs, num_perm, bands)
    est = _est_jaccard_col(num_perm)

    def verified(cand: DataFrame, left_sigs: DataFrame, right_sigs: DataFrame
                 ) -> DataFrame:
        sa = left_sigs.select(
            F.col("doc_id").alias("delta_id"), F.col("sig").alias("sig_a")
        )
        sb = right_sigs.select(
            F.col("doc_id").alias("match_id"), F.col("sig").alias("sig_b")
        )
        return (
            cand.join(sa, "delta_id")
            .join(sb, "match_id")
            .select("delta_id", "match_id", est.alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= threshold)
        )

    def best_match(matches: DataFrame) -> DataFrame:
        w = Window.partitionBy("delta_id").orderBy(
            F.desc("est_jaccard"), "match_id"
        )
        return (
            matches.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    corpus_cand = (
        delta_bands.alias("d")
        .join(
            corpus_bands.alias("c"),
            (F.col("d.band") == F.col("c.band"))
            & (F.col("d.band_key") == F.col("c.band_key")),
        )
        .select(
            F.col("d.doc_id").alias("delta_id"),
            F.col("c.doc_id").alias("match_id"),
        )
        .distinct()
    )
    # materialize the probe result once: corpus_dup feeds the survivor
    # anti-join (twice: band side + sig side), the in-batch verify, and
    # the final assembly — without the barrier the delta×corpus probe
    # subtree (two verify joins + the best-match window) is re-planned
    # up to 4×. Near-dup-sized, so pinning it is cheap at any SF (the
    # same reasoning as minhash_lsh_pairs' signature barrier).
    corpus_dup = best_match(
        verified(corpus_cand, delta_sigs, corpus_sigs)
    ).transform(materialize)

    dropped = corpus_dup.select(F.col("delta_id").alias("doc_id"))
    survivors = delta_sigs.select("doc_id", "sig").join(
        dropped, "doc_id", "left_anti"
    )
    # survivors' band keys: filter the already-built delta_bands
    # instead of re-hashing every surviving signature
    surv_bands = delta_bands.join(dropped, "doc_id", "left_anti")
    delta_cand = (
        surv_bands.alias("a")
        .join(
            surv_bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("b.doc_id").alias("delta_id"),
            F.col("a.doc_id").alias("match_id"),
        )
        .distinct()
    )
    delta_dup = best_match(verified(delta_cand, survivors, survivors))

    c = corpus_dup.select(
        "delta_id",
        F.col("match_id").alias("c_match"),
        F.col("est_jaccard").alias("c_est"),
    )
    d = delta_dup.select(
        "delta_id",
        F.col("match_id").alias("d_match"),
        F.col("est_jaccard").alias("d_est"),
    )
    return (
        delta_sigs.select(F.col("doc_id").alias("delta_id"))
        .join(c, "delta_id", "left")
        .join(d, "delta_id", "left")
        .select(
            F.col("delta_id").alias("doc_id"),
            F.when(F.col("c_match").isNotNull(), F.lit("dup_of_corpus"))
            .when(F.col("d_match").isNotNull(), F.lit("dup_in_delta"))
            .otherwise(F.lit("novel"))
            .alias("verdict"),
            F.coalesce("c_match", "d_match").alias("match_doc_id"),
            F.coalesce("c_est", "d_est").alias("est_jaccard"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 md5 hex chars — fits signed 64-bit in every engine
_SIMHASH_BANDS = 4
_BAND_BITS = SIMHASH_BITS // _SIMHASH_BANDS  # 15
_BAND_MASK = (1 << _BAND_BITS) - 1


def simhash_docs(docs: DataFrame, shingle_words: int = 3) -> DataFrame:
    """60-bit SimHash per document over the distinct word-shingle set.

    Shingle hash = first 15 md5 hex chars as an integer; bit j of the
    fingerprint is set when the +1/-1 vote of all shingle-hash bits j
    is positive. Pure integer shifts — bit-identical in any engine.

    Shape: explode (doc × shingle-hash × bit) → two partial-aggregated
    groupBys. All expressions stay in whole-stage codegen (nested
    higher-order lambdas would be interpreted and ~100× slower); the
    60× row inflation is map-side only — partial aggregation shrinks
    the shuffle to 60 rows per document. (Measured alternative: 60
    per-bit SUM aggregates over the un-inflated (doc, hash) frame —
    same arithmetic, no explosion — ran ~40% SLOWER at sf0.1; the
    60-wide generated aggregate loses to the narrow explode form, so
    the explode stays.)

    Documents whose shingle set is empty (NULL text or fewer than
    ``shingle_words`` tokens) produce no explode rows and are ABSENT
    from the fingerprint frame — :func:`simhash_near_pairs` therefore
    never reports them, even as exact duplicates of each other. Same
    contract (and same reason) as :func:`minhash_signatures`: a
    similarity sketch over an empty feature set is undefined; short
    docs belong to :func:`exact_dedup`."""
    tk = F.col("_toks")
    feats = word_ngrams(shingle_words, tk) if shingle_words > 1 else distinct_tokens(tk)
    # hash each shingle once (array<long>); the repartition barrier
    # stops Catalyst from collapsing projections and re-deriving the
    # md5 array downstream
    thash = F.transform(
        feats,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    hdocs = tokenized(docs).select("doc_id", thash.alias("hs")).repartition(
        F.col("doc_id")
    )
    votes = (
        hdocs.select("doc_id", F.explode("hs").alias("h"))
        .select(
            "doc_id",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"),
        )
        .select(
            "doc_id",
            "j",
            F.when(F.expr("shiftright(h, j) & 1") == 1, 1).otherwise(-1).alias("vote"),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), j)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    shingle_words: int = 3,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ max_hamming.

    Candidates by pigeonhole banding: 60 bits → 4 bands of 15; hamming
    ≤ 3 means at least one band is identical, so the equi-join on
    (band, band_value) has NO false negatives and replaces the O(n²)
    scan with a hash shuffle. Exact popcount filter afterwards.

    ``fingerprints``: a precomputed :func:`simhash_docs` frame
    (doc_id, simhash) to band instead of recomputing — callers that
    also materialize the fingerprints themselves (the registry's
    session cache) pass it so one session hashes the corpus once."""
    if max_hamming >= _SIMHASH_BANDS:
        raise ValueError("pigeonhole banding requires max_hamming < 4")
    # barrier: materialize fingerprints once; the banding self-join
    # reuses the exchange instead of recomputing simhash per branch
    sims = (
        fingerprints
        if fingerprints is not None
        else simhash_docs(docs, shingle_words).repartition(F.col("doc_id"))
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * _BAND_BITS)
                .bitwiseAND(F.lit(_BAND_MASK))
                .alias("band_val"),
            )
            for b in range(_SIMHASH_BANDS)
        ]
    )
    banded = sims.select(
        "doc_id", "simhash", F.explode(band_structs).alias("bk")
    ).select("doc_id", "simhash", "bk.band", "bk.band_val")
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# union-dedup convenience (the re-crawl scenario)
# ---------------------------------------------------------------------------


def dedup_keep_first(docs: DataFrame, key: Column | str = "text") -> DataFrame:
    """Collapse exact duplicates keeping the smallest doc_id — the
    shuffle-once window form usable inside a pipeline (vs exact_dedup's
    group summary)."""
    kc = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(kc).orderBy(F.col("doc_id").asc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# substring-level duplication (positional shingles, Lee et al. ACL'22)
# ---------------------------------------------------------------------------


def substring_hotspots(
    docs: DataFrame, n: int = 8, min_docs: int = 2
) -> DataFrame:
    """Substring-level duplication profile: for every document, the
    fraction of its token positions whose ``n``-token shingle also
    occurs in at least ``min_docs`` distinct documents. This is the
    shingle approximation of exact-substring training-data dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL'22 — their suffix-array pass finds repeated spans;
    positional n-gram hits are the distributed-friendly signal for the
    same spans). Doc-level dedup (minhash/simhash above) misses
    boilerplate repeated INSIDE otherwise-distinct pages; this is the
    operator that catches it.

    Unlike the Jaccard family this keeps POSITIONAL (non-distinct)
    shingles — a span repeated 5× inside one doc counts 5 positions.

    Scale shape: explode → two aggregations + one join, all hash
    shuffles on the gram key (the (gram, doc) pre-aggregate reduces
    the join input; the gram-level count reuses its partitioning), then
    one shuffle on doc_id. Never all-pairs, no driver state.
    """
    toked = tokenized(docs)
    size = F.size("_toks")
    gram_i = lambda i: F.concat_ws(" ", F.slice("_toks", i, n))  # noqa: E731
    grams = toked.filter(size >= n).select(
        "doc_id",
        F.explode(
            F.transform(F.sequence(F.lit(1), size - (n - 1)), gram_i)
        ).alias("gram"),
    )
    per_doc_gram = grams.groupBy("gram", "doc_id").agg(
        F.count(F.lit(1)).alias("n_pos")
    )
    gram_docs = per_doc_gram.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    dup_pos = F.when(F.col("n_docs") >= min_docs, F.col("n_pos")).otherwise(0)
    return (
        per_doc_gram.join(gram_docs, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("n_pos").alias("n_shingles"),
            F.sum(dup_pos).alias("n_dup"),
        )
        .withColumn(
            "dup_frac",
            F.col("n_dup").cast("double") / F.col("n_shingles").cast("double"),
        )
        .orderBy("doc_id")
    )


def duplicated_spans(
    docs: DataFrame, n: int = 8, min_docs: int = 2
) -> DataFrame:
    """Exact substring duplication at SPAN granularity — the maximal
    per-document spans every position of which lies inside an
    ``n``-token window shared VERBATIM with ≥ ``min_docs`` distinct
    documents. This is the distributed rendition of exact-substring
    training-data dedup (Lee et al., ACL'22 "Deduplicating Training
    Data Makes Language Models Better" §4.1 ExactSubstr — their
    single-machine pass builds a suffix array over the concatenated
    corpus and removes duplicated spans ≥ 50 tokens): a suffix array
    does not distribute, but the SET OF POSITIONS it would remove is
    exactly the union of cross-document duplicated length-n windows —
    computable with one positional shingle explode, one
    distinct-docs-per-gram aggregate, one semi-join back, and a
    per-document islands merge. X56 (:func:`substring_hotspots`)
    reports the duplicated FRACTION per doc; this emits the actual
    spans a removal pass would cut.

    Output: (doc_id, span_start, span_len, n_windows) — 1-based token
    position, maximal run of consecutive duplicated windows, so
    span_len = n_windows + n − 1; adjacent windows may match
    DIFFERENT partner documents (maximality is within-doc, the same
    union-of-removals semantics as ExactSubstr).

    Grams are 60-bit md5 prefixes (the simhash-family hash width):
    exact cross-engine, with a negligible collision-to-false-span
    probability the dedup family already accepts at 28 bits.

    Scale shape: the positional explode is corpus-token-sized (the
    X56 cost); the distinct (gram, doc) pre-aggregate is map-side
    partial; the probe back is a semi-join on the 60-bit int key; the
    islands window partitions BY doc_id — never a global sort, never
    a suffix array, no driver state."""
    toked = tokenized(docs)
    size = F.size("_toks")
    pgrams = toked.filter(size >= n).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), size - (n - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws(" ", F.slice("_toks", i, n))),
                            1,
                            15,
                        ),
                        16,
                        10,
                    )
                    .cast("long")
                    .alias("g"),
                ),
            )
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    gram_docs = (
        pgrams.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("g")
    )
    dup = pgrams.join(gram_docs, "g", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        dup.withColumn("_grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1) - F.min("pos") + 1)
            .cast("int")
            .alias("span_len"),
            F.count(F.lit(1)).cast("int").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_len", "n_windows")
        .orderBy("doc_id", "span_start")
    )


def remove_duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    spans: DataFrame | None = None,
) -> DataFrame:
    """The APPLY step of exact-substring dedup — what ExactSubstr
    actually does to the corpus (Lee et al. ACL'22 §4.1 REMOVE the
    duplicated spans; :func:`duplicated_spans` reports them): every
    token position covered by a maximal duplicated span is cut, and
    the document is re-emitted from its surviving tokens.

    Output per doc: (doc_id, n_tokens, n_removed, clean_text) —
    clean_text is the TOKENIZED-NORMALIZED surviving text (lowercased,
    single-spaced: reconstruction happens in token space, the same
    normalization every dedup signal here reads), '' when the doc is
    entirely duplicated, and the full normalized text when nothing
    matched. n_removed = Σ span lengths (spans never overlap — they
    are maximal runs).

    Scale shape: the span report is the :func:`duplicated_spans`
    cost; applying it is ONE equi-join of the (doc_id → spans array)
    frame back onto the tokenized corpus plus per-row expression work
    O(tokens · spans-per-doc) — no extra shuffle beyond the
    spans-per-doc aggregate, no position explode on the corpus side.

    ``spans``: a precomputed :func:`duplicated_spans` frame over the
    SAME docs/n/min_docs to apply instead of recomputing — callers
    that also materialize the span report themselves (the registry's
    session cache) pass it so one session pays the positional-shingle
    pass once (the :func:`simhash_near_pairs` ``fingerprints``
    precedent)."""
    if spans is None:
        spans = duplicated_spans(docs, n=n, min_docs=min_docs)
    sp = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_len")).alias("_spans")
    )
    toked = tokenized(docs).join(sp, "doc_id", "left")
    size = F.size("_toks")
    spans_arr = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<span_start:int,span_len:int>>"),
    )
    kept = F.filter(
        # empty-doc guard: sequence(1, 0) counts DOWN in Spark — the
        # word_ngrams lesson; emit an empty struct array instead
        F.when(
            size >= 1,
            F.transform(
                F.sequence(F.lit(1), size),
                lambda i: F.struct(
                    i.cast("int").alias("p"),
                    F.element_at("_toks", i).alias("t"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<p:int,t:string>>")),
        lambda st: ~F.exists(
            spans_arr,
            lambda s: (s["span_start"] <= st["p"])
            & (st["p"] < s["span_start"] + s["span_len"]),
        ),
    )
    return (
        toked.select("doc_id", size.alias("_n"), kept.alias("_kept"))
        .select(
            "doc_id",
            F.col("_n").cast("int").alias("n_tokens"),
            (F.col("_n") - F.size("_kept")).cast("int").alias("n_removed"),
            F.concat_ws(
                " ", F.transform("_kept", lambda st: st["t"])
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


def spliced_docs(docs: DataFrame) -> DataFrame:
    """documents + engineered PARTIAL-OVERLAP splices — the fixture
    geometry :func:`duplicated_spans` needs (the rerendered_assets
    precedent): the corpus's own duplicates are mostly WHOLE-document
    recrawls, whose spans trivially cover the doc; span BOUNDARIES
    only get exercised by partial overlap. Every 40th document with
    ≥ 24 tokens contributes doc_id + 40_000_000 whose text is tokens
    5..20 of the base (one verbatim 16-token span) followed by a
    unique marker token ('xsplice' + base doc_id) that kills rightward
    extension — so the splice's duplicated span is exactly its
    16-token prefix and the base's span covers positions 5..20
    (modulo the corpus's own additional duplications). Pure column
    arithmetic on the shared tokenizer; the oracle re-derives the
    identical splice."""
    toks = tokens_col()
    spliced = docs.filter(
        (F.col("doc_id") % 40 == 0) & (F.size(toks) >= 24)
    ).select(
        (F.col("doc_id") + 40_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat_ws(" ", F.slice(toks, 5, 16)),
            F.concat(F.lit("xsplice"), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(spliced)


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap against an eval set)
# ---------------------------------------------------------------------------


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share at
    least ``min_overlap`` distinct word ``n``-grams with any benchmark
    document (the standard eval-leak check run before training — cf.
    the n-gram overlap decontamination described in the GPT-3/PaLM
    papers). Output per flagged doc: the distinct overlapping-gram
    count and how many benchmark docs it collides with.

    Scale design: eval benchmarks are tiny (MBs) next to a 100 TB
    corpus, so the benchmark's distinct gram set is BROADCAST — the
    corpus side maps its own shingles and hash-joins locally, never
    shuffling the big side for the probe; the only wide operation is
    the per-doc count-distinct aggregate over the (rare) hits. Shingle
    hashing reuses :func:`hashed_ngrams` (28-bit int grams — exact,
    engine-portable, and int joins beat string joins ~10×).
    """
    bgrams = tokenized(benchmark).select(
        F.col("doc_id").alias("bench_id"),
        F.explode(hashed_ngrams(n, F.col("_toks"))).alias("gram"),
    )
    cgrams = tokenized(docs).select(
        "doc_id", F.explode(hashed_ngrams(n, F.col("_toks"))).alias("gram")
    )
    hits = cgrams.join(F.broadcast(bgrams), "gram")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("gram").cast("long").alias("n_hit_grams"),
            F.countDistinct("bench_id").cast("long").alias("n_benchmark_docs"),
        )
        .filter(F.col("n_hit_grams") >= min_overlap)
    )


# ---------------------------------------------------------------------------
# line-level boilerplate removal (CCNet-style paragraph/line dedup)
# ---------------------------------------------------------------------------


def line_stats(
    docs: DataFrame,
    source_col: str = "source",
    min_docs: int = 2,
    max_share: float = 0.5,
) -> DataFrame:
    """Per-(source, line) repetition statistics over MULTI-LINE text —
    the measurement half of CCNet §4.1-style line deduplication: a
    line (newline-delimited unit of ``text``) that recurs verbatim in
    a large share of one source's documents is template boilerplate
    (navigation bars, cookie banners, copyright footers), not prose,
    and should be stripped BEFORE near-dup detection (shared
    boilerplate inflates every within-source Jaccard estimate).

    A line is flagged as boilerplate when it appears in at least
    ``min_docs`` distinct documents of its source AND in at least
    ``max_share`` of them (the CCNet rule keyed per source, because
    boilerplate is a property of the TEMPLATE, which is per-site).

    Output: (source, line, n_docs_with_line, doc_share,
    is_boilerplate), one row per distinct (source, line).

    Scale design: one linear explode (a doc has O(len) lines), one
    map-side-combinable count-distinct keyed (source, line-hash) —
    never all-pairs — and the per-source document counts join in as a
    BROADCAST (sources are a metadata-sized dimension). Hot lines
    (the boilerplate itself) are exactly the skewed keys; the
    aggregate is a count, so partial aggregation absorbs the skew
    map-side. Reference semantics: CCNet (Wenzek et al. 2020) §4.1
    line-level dedup.
    """
    lines = docs.select(
        "doc_id",
        F.col(source_col).alias("source"),
        F.explode(F.split("text", "\n")).alias("line"),
    )
    per_line = lines.groupBy("source", "line").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs_with_line")
    )
    src_sizes = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.countDistinct("doc_id").cast("long").alias("_n_src_docs")
    )
    return per_line.join(F.broadcast(src_sizes), "source").select(
        "source",
        "line",
        "n_docs_with_line",
        (
            F.col("n_docs_with_line").cast("double")
            / F.col("_n_src_docs").cast("double")
        ).alias("doc_share"),
        (
            (F.col("n_docs_with_line") >= F.lit(min_docs))
            & (
                F.col("n_docs_with_line").cast("double")
                >= F.lit(float(max_share)) * F.col("_n_src_docs").cast("double")
            )
        ).alias("is_boilerplate"),
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    source_col: str = "source",
    min_docs: int = 2,
    max_share: float = 0.5,
) -> DataFrame:
    """APPLY side of :func:`line_stats` — re-emit every document with
    its boilerplate lines removed (the X118 exact-substring-removal
    shape at LINE grain): lines keep their original order, survivors
    re-join with the newline delimiter, and a doc whose every line is
    boilerplate comes back as the empty string (it then falls to the
    quality floor downstream, which is the correct fate for a
    pure-template page).

    The share comparison is exact integer arithmetic
    (n·2 >= total at max_share=0.5 generalizes to
    n >= max_share·total evaluated in double on integer inputs —
    both engines compute the identical value for dyadic shares).

    Output: (doc_id, source, n_lines, n_kept_lines, text_clean).

    Scale design: the flagged-line table from :func:`line_stats`
    hash-joins the exploded lines on the SAME (source, line) key the
    stats grouped by — co-partitioned, one exchange each side — and
    reassembly is one per-doc aggregate (array_sort over the
    position-tagged survivors, metadata-sized per doc). Nothing is
    quadratic; AQE's skew-join split covers template-heavy sources.
    """
    flagged = line_stats(
        docs, source_col=source_col, min_docs=min_docs, max_share=max_share
    ).filter(F.col("is_boilerplate"))
    lines = docs.select(
        "doc_id",
        F.col(source_col).alias("source"),
        F.posexplode(F.split("text", "\n")).alias("pos", "line"),
    )
    kept = lines.join(
        flagged.select("source", "line", "is_boilerplate"),
        ["source", "line"],
        "left",
    ).filter(F.col("is_boilerplate").isNull())
    return (
        lines.groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
        .join(
            kept.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_kept_lines"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"],
                    ),
                    "\n",
                ).alias("text_clean"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "source",
            "n_lines",
            F.coalesce(F.col("n_kept_lines"), F.lit(0))
            .cast("long")
            .alias("n_kept_lines"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )
