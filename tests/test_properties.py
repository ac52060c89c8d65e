"""Property-based invariants (hypothesis) for the operators whose
correctness claims are universal statements — "for ANY input…" — that
example tests can only sample:

- SCD2: the interval rows PARTITION each key's history (exactly one
  current row iff the key survives; closed rows exactly for the
  changed/deleted; current attributes == new-snapshot attributes).
- PageRank: bit-identical under repartitioning (the operator's whole
  reason to exist) and rank mass bounded by the damping identity.
- substring_hotspots: equals a brute-force Python reimplementation on
  arbitrary corpora (positional multiplicity included).
- quality_weighted_sample: the kept set is exactly the hash rule,
  reproducible in pure Python.

Examples are kept small (Spark jobs per example) — these hunt logic
errors, not scale ones; the plan tests own the scale claims.
"""

from __future__ import annotations

import hashlib
import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark.operators import (
    cdc,
    dedup,
    graph,
    sampling,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_attr = st.sampled_from(["a", "b", "c"])
_snap = st.dictionaries(st.integers(0, 9), _attr, min_size=0, max_size=8)


@given(old=_snap, new=_snap)
@settings(**_SETTINGS)
def test_scd2_partitions_every_key_history(spark, old, new):
    if not old and not new:
        return
    old_df = spark.createDataFrame(
        [(k, v) for k, v in old.items()] or [(None, None)], "k int, attr string"
    ).filter(F.col("k").isNotNull())
    new_df = spark.createDataFrame(
        [(k, v) for k, v in new.items()] or [(None, None)], "k int, attr string"
    ).filter(F.col("k").isNotNull())
    rows = cdc.scd2_apply(old_df, new_df, ["k"], ["attr"]).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    assert set(by_key) == set(old) | set(new)
    for k, ivs in by_key.items():
        current = [r for r in ivs if r["is_current"]]
        closed = [r for r in ivs if not r["is_current"]]
        # exactly one open row iff the key survives into the new snap
        assert len(current) == (1 if k in new else 0)
        if k in new:
            assert current[0]["attr"] == new[k]
            assert current[0]["valid_to"] is None
        # a closed row exists iff the key was present and (changed or
        # deleted); unchanged keys carry their single open row only
        changed = k in old and k in new and old[k] != new[k]
        deleted = k in old and k not in new
        assert len(closed) == (1 if (changed or deleted) else 0)
        if closed:
            assert closed[0]["attr"] == old[k]
            assert closed[0]["valid_to"] == 2


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_pagerank_partition_invariant_and_mass_bounded(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(2, 12)
    base_edges = {(a, b) for a in range(n) for b in range(n)
                  if a != b and rng.random() < 0.4}
    if not base_edges:
        base_edges = {(0, 1)}
    undirected = list(base_edges) + [(b, a) for a, b in base_edges]
    e1 = spark.createDataFrame(undirected, ["src", "dst"])
    e2 = e1.repartition(7, "dst")  # different physical layout
    r1 = {r["node"]: r["rank"] for r in graph.pagerank(e1).collect()}
    r2 = {r["node"]: r["rank"] for r in graph.pagerank(e2).collect()}
    assert r1 == r2  # EXACT equality — the fixed-point arithmetic claim
    # mass identity: every rank lies in [base, base + 0.85 * total_in]
    # and totals stay below n * ONE + slack introduced by flooring
    assert all(v >= (15 * graph.ONE) // 100 for v in r1.values())
    assert sum(r1.values()) <= len(r1) * graph.ONE


_words = st.sampled_from(["x", "y", "z", "w"])
_doc = st.lists(_words, min_size=0, max_size=10).map(" ".join)


@given(texts=st.lists(_doc, min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_substring_hotspots_matches_bruteforce(spark, texts):
    n = 3
    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_dup"])
        for r in dedup.substring_hotspots(docs, n=n, min_docs=2).collect()
    }

    def shingles(t: str) -> list[str]:
        toks = t.lower().strip().split()
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    all_sh = {i: shingles(t) for i, t in enumerate(texts)}
    docs_per_gram: dict[str, set[int]] = {}
    for i, sh in all_sh.items():
        for g in sh:
            docs_per_gram.setdefault(g, set()).add(i)
    want = {
        i: (len(sh), sum(1 for g in sh if len(docs_per_gram[g]) >= 2))
        for i, sh in all_sh.items()
        if sh
    }
    assert got == want


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_quality_sample_is_exactly_the_hash_rule(spark, seed):
    rng = random.Random(seed)
    rows = [(i, rng.random()) for i in range(30)]
    scored = spark.createDataFrame(rows, ["doc_id", "quality_score"])
    kept = {
        r["doc_id"]
        for r in sampling.quality_weighted_sample(scored).collect()
    }
    res = 1_000_000
    want = {
        i
        for i, q in rows
        if int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16) % res
        < q * res
    }
    assert kept == want


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_countmin_never_underestimates(spark, seed):
    from collections import Counter

    from aws_kinesis_data_ingestion_restapi_spark.operators import sketch

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(rng.randint(2, 30))]
    stream = [rng.choice(vocab) for _ in range(rng.randint(1, 120))]
    exact = Counter(stream)
    items = spark.createDataFrame([(s,) for s in stream], ["item"])
    cands = spark.createDataFrame([(v,) for v in set(stream)], ["item"])
    # a deliberately TINY sketch (2x8) forces collisions, which must
    # only ever inflate estimates — never deflate them
    est = {
        r["item"]: r["cm_estimate"]
        for r in sketch.countmin_estimates(
            items, cands, depth=2, width=8
        ).collect()
    }
    assert set(est) == set(exact)
    for item, n in exact.items():
        assert est[item] >= n, (item, est[item], n)


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_triangle_count_matches_bruteforce(spark, seed):
    """For ANY random graph, degree-oriented counting equals the
    brute-force triple enumeration (and is invariant to edge
    duplication/reversal, which the canonicalization absorbs)."""
    rng = random.Random(seed)
    n = rng.randint(3, 9)
    pairs = [(a, b) for a in range(n) for b in range(n) if a < b]
    chosen = [p for p in pairs if rng.random() < 0.5]
    if not chosen:
        chosen = [pairs[0]]
    noisy = chosen + [(b, a) for a, b in chosen if rng.random() < 0.5]
    edges = spark.createDataFrame(noisy, ["x", "y"])
    got = graph.triangle_count(edges).collect()[0]

    es = set(chosen)
    truth = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        for k in range(j + 1, n)
        if (i, j) in es and (i, k) in es and (j, k) in es
    )
    nodes = {v for e in chosen for v in e}
    assert got["n_triangles"] == truth
    assert got["n_edges"] == len(es)
    assert got["n_nodes"] == len(nodes)


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_collocation_lift_matches_bruteforce(spark, seed):
    """For ANY corpus, pair counts are positional occurrences and the
    lift equals the exact count formula computed in pure Python (same
    double expression, same associativity)."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import text

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(rng.randint(1, 8))
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["lift"])
        for r in text.collocation_lift(docs, min_count=1, k=1000).collect()
    }

    uni: dict[str, int] = {}
    pair: dict[tuple, int] = {}
    n_tok = n_big = 0
    for _, t in rows:
        toks = t.lower().strip().split()
        n_tok += len(toks)
        n_big += max(len(toks) - 1, 0)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for wa, wb in zip(toks, toks[1:]):
            pair[(wa, wb)] = pair.get((wa, wb), 0) + 1
    truth = {
        p: (c, c * float(n_tok) * float(n_tok)
            / (float(n_big) * float(uni[p[0]]) * float(uni[p[1]])))
        for p, c in pair.items()
    }
    assert got == truth


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_kmeans_step_assignment_matches_bruteforce(spark, seed):
    """For ANY vector set, every cluster's member count equals the
    brute-force nearest-centroid assignment under the quantized
    distance with the (d2, cell) tie-break."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import similarity

    rng = random.Random(seed)
    dim = rng.choice([2, 4])
    n = rng.randint(4, 12)
    stride = rng.choice([2, 3])
    vecs = {
        i: [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        for i in range(n)
    }
    embs = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    got = {
        r["cell_id"]: r["n_members"]
        for r in similarity.kmeans_step(embs, centroid_stride=stride).collect()
    }

    q = {i: [round(x * 10000) for x in v] for i, v in vecs.items()}
    cells = [i for i in sorted(vecs) if i % stride == 0]
    assign: dict[int, int] = {}
    for i, qv in q.items():
        best = min(
            cells,
            key=lambda c: (sum((a - b) ** 2 for a, b in zip(qv, q[c])), c),
        )
        assign[i] = best
    truth: dict[int, int] = {}
    for c in assign.values():
        truth[c] = truth.get(c, 0) + 1
    assert got == truth


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_attribution_matches_bruteforce(spark, seed):
    """For ANY event sequence, each purchase credits the chronologically
    last prior touch within the window, else 'none' — checked against
    a pure-Python replay."""
    from aws_kinesis_data_ingestion_restapi_spark import analytics
    import datetime

    rng = random.Random(seed)
    types = ["view", "click", "signup", "purchase", "error"]
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(rng.randint(1, 4)):
        t = t0
        for _ in range(rng.randint(1, 12)):
            t = t + datetime.timedelta(hours=rng.randint(1, 30))
            rows.append((eid, f"u{u}", rng.choice(types), t))
            eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts"]
    )

    import unittest.mock as mock
    with mock.patch.object(analytics, "_t", lambda s, d, n: events):
        got = {
            r["touch_type"]: r["n_conversions"]
            for r in analytics.events_attribution(spark, "ignored").collect()
        }

    truth: dict[str, int] = {}
    by_user: dict[str, list] = {}
    for _, u, ty, t in sorted(rows, key=lambda r: (r[1], r[3])):
        by_user.setdefault(u, []).append((t, ty))
    for u, seq in by_user.items():
        for i, (t, ty) in enumerate(seq):
            if ty != "purchase":
                continue
            credit = "none"
            for pt, pty in reversed(seq[:i]):
                if pty in ("view", "click", "signup"):
                    if (t - pt) <= datetime.timedelta(hours=24):
                        credit = pty
                    break
            truth[credit] = truth.get(credit, 0) + 1
    assert got == truth


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_quantile_sketch_error_bound_holds(spark, seed):
    """For ANY non-negative data: every quantile estimate must sit
    within the sketch's guarantee of the true rank quantile — 12.5%
    relative half-width once values clear the cent-resolution floor
    (scaled ≥ 4), half a cent absolute below it — and the histogram's
    total count must equal the row count. Hunts bin-edge arithmetic
    drift that the fixed-edge unit test can only sample."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import sketch

    rng = random.Random(seed)
    n = rng.randrange(5, 120)
    scale = rng.choice([1.0, 10.0, 500.0, 40000.0])
    vals = [round(rng.uniform(0, scale), 2) for _ in range(n)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    hist = sketch.quantile_sketch_histogram(df, "value")
    rows = hist.collect()
    assert sum(r["cnt"] for r in rows) == n
    q_pcts = [50, 90, 99]
    est = {
        r["q_pct"]: r["est"]
        for r in sketch.quantile_sketch_estimates(hist, q_pcts).collect()
    }
    ordered = sorted(vals)
    for q in q_pcts:
        rank = -(-q * n // 100)  # ⌈q·n/100⌉
        true = ordered[rank - 1]
        s = int(true * 100 + 1e-9)  # cents (values are 2-decimal)
        if s >= 4:
            assert abs(est[q] - true) / true <= 0.125 + 1e-9, (seed, q)
        else:
            assert abs(est[q] - true) <= 0.005 + 1e-9, (seed, q)


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_incremental_dedup_equals_bruteforce_replay(spark, seed):
    """incremental_dedup_delta must agree with a sequential Python
    replay of its contract on ANY signature frames: corpus-probe best
    match (est desc, id asc), keep-first among corpus-SURVIVING
    earlier delta docs, precedence, novel NULLs. Small alphabets make
    band collisions and est ties common — exactly where the
    survivor/ordering logic can go wrong."""
    rng = random.Random(seed)
    num_perm, bands = 8, 2
    rows_per_band = num_perm // bands
    threshold = rng.choice([0.25, 0.5, 0.75])
    n_corpus = rng.randrange(1, 8)
    n_delta = rng.randrange(1, 8)
    mk_sig = lambda: [rng.randrange(3) for _ in range(num_perm)]  # noqa: E731
    corpus = {i: mk_sig() for i in range(n_corpus)}
    delta = {100 + i: mk_sig() for i in range(n_delta)}

    def bands_of(sig):
        return {
            (b, tuple(sig[b * rows_per_band:(b + 1) * rows_per_band]))
            for b in range(bands)
        }

    def est(sa, sb):
        return sum(x == y for x, y in zip(sa, sb)) / num_perm

    def best(did, sig, pool):
        cands = [
            (mid, est(sig, ms))
            for mid, ms in pool.items()
            if bands_of(sig) & bands_of(ms)
        ]
        cands = [(m, e) for m, e in cands if e >= threshold]
        if not cands:
            return None
        return min(cands, key=lambda t: (-t[1], t[0]))

    want = {}
    survivors = {}
    for did in sorted(delta):
        hit = best(did, delta[did], corpus)
        if hit is not None:
            want[did] = ("dup_of_corpus", hit[0], hit[1])
            continue
        survivors[did] = delta[did]  # corpus survivor (keeper candidate)
        earlier = {k: v for k, v in survivors.items() if k < did}
        dhit = best(did, delta[did], earlier)
        want[did] = (
            ("dup_in_delta", dhit[0], dhit[1]) if dhit else ("novel", None, None)
        )

    cdf = spark.createDataFrame(
        list(corpus.items()), "doc_id bigint, sig array<bigint>"
    )
    ddf = spark.createDataFrame(
        list(delta.items()), "doc_id bigint, sig array<bigint>"
    )
    got = {
        r["doc_id"]: (r["verdict"], r["match_doc_id"], r["est_jaccard"])
        for r in dedup.incremental_dedup_delta(
            cdf, ddf, num_perm=num_perm, bands=bands, threshold=threshold
        ).collect()
    }
    assert got == want, f"seed {seed}"


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_star_cc_equals_union_find_bruteforce(spark, seed):
    """connected_components_star must label ANY graph exactly like a
    driver-side union-find: component = the component's minimum node
    id, every universe node present exactly once (singletons map to
    themselves). Hunts ordering/fixpoint bugs in the large-star /
    small-star rounds that the fixed-seed tests could only sample."""
    rng = random.Random(seed)
    n = rng.randrange(2, 25)
    m = rng.randrange(0, 40)
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        edges = [(0, 1)]

    # brute force: union-find with min-root bookkeeping
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    want = {node: find(node) for node in range(n)}

    pairs = spark.createDataFrame(edges, ["a", "b"])
    nodes = spark.range(n).select(F.col("id").alias("node"))
    rows = graph.connected_components_star(pairs, nodes=nodes).collect()
    assert len(rows) == n  # exactly one label per universe node
    got = {r["node"]: r["component"] for r in rows}
    assert got == want, f"seed {seed}: star CC != union-find"


@given(texts=st.lists(_doc, min_size=2, max_size=6), seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_minhash_lsh_never_misses_exact_duplicates(spark, texts, seed):
    """The LSH no-false-negative theorem for the degenerate case, on
    arbitrary corpora: two documents with IDENTICAL token streams (and
    >= shingle_words tokens) have identical signatures, hence identical
    keys in EVERY band — they MUST appear as a candidate pair and be
    emitted with est_jaccard exactly 1.0. Also pins the stage-subset
    invariant the X92 audit reports on: emitted ⊆ candidates."""
    # plant a guaranteed exact duplicate of the first sufficiently long
    # doc (if any); hypothesis also generates its own collisions
    rng = random.Random(seed)
    texts = list(texts)
    long_docs = [t for t in texts if len(t.split()) >= 3]
    if long_docs:
        texts.append(rng.choice(long_docs))
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])

    sigs = dedup.minhash_signatures(docs, num_perm=16, shingle_words=3)
    banded = dedup.minhash_band_keys(sigs, num_perm=16, bands=4)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidate_pairs(banded).collect()
    }
    emitted = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs, num_perm=16, bands=4, threshold=0.5, shingle_words=3
        ).collect()
    }
    assert set(emitted) <= cand
    # every exact-duplicate pair (>= 3 tokens) is a candidate AND
    # emitted at est exactly 1.0
    norm = [" ".join(t.lower().strip().split()) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if norm[i] == norm[j] and len(norm[i].split()) >= 3:
                assert (i, j) in cand, (i, j, norm[i])
                assert emitted.get((i, j)) == 1.0, (i, j, emitted.get((i, j)))


_word = st.sampled_from(["spark", "row", "agg", "key", "scan", "fast", "a"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@given(texts=st.lists(_text, min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_hashed_linear_score_matches_bruteforce(spark, texts):
    """For ANY corpus: the fastText-shape score equals the pure-Python
    reimplementation (hashed unigram+bigram occurrences, md5-prefix
    weights, exact integer sum, one division) — including empty docs,
    single-token docs (no bigrams) and repeated features."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import text as T

    rows = list(enumerate(texts))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_features"], r["raw_score"], r["model_score"])
        for r in T.hashed_linear_score(docs).collect()
    }
    span = T.FT_WEIGHT_SPAN
    for doc_id, txt in rows:
        toks = txt.split()
        feats = toks + [f"{x} {y}" for x, y in zip(toks, toks[1:])]
        raw = sum(
            int(hashlib.md5(f.encode()).hexdigest()[:7], 16) % (2 * span + 1)
            - span
            for f in feats
        )
        n = len(feats)
        expected = (n, raw, raw / (n * span) if n else 0.0)
        assert got[doc_id] == expected


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 40),           # doc_id (may collide -> dedup below)
            st.sampled_from(["A", "B", "C"]),
            st.integers(0, 5),            # priority as small int (exact ties)
        ),
        min_size=1,
        max_size=20,
    ),
    cap=st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_per_source_cap_invariants(spark, rows, cap):
    """For ANY frame and cap: (1) at most `cap` survivors per source;
    (2) the survivors are exactly the top-priority rows under
    (priority DESC, id ASC); (3) src_rank is 1..k dense per source."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import sampling

    uniq = {r[0]: r for r in rows}.values()
    rows = sorted(uniq)
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality_score"])
    got = [
        (r["source"], r["src_rank"], r["doc_id"])
        for r in sampling.per_source_cap(df, cap=cap).collect()
    ]
    by_source: dict[str, list] = {}
    for doc_id, source, prio in rows:
        by_source.setdefault(source, []).append((-prio, doc_id))
    expected = []
    for source, members in by_source.items():
        for rank, (_, doc_id) in enumerate(sorted(members)[:cap], start=1):
            expected.append((source, rank, doc_id))
    assert sorted(got) == sorted(expected)


# --- round 11: mergeable-sketch and sequence-blocking universals ---

_items = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 50)),
    min_size=1,
    max_size=40,
)


@given(rows=_items, split=st.integers(1, 6))
@settings(**_SETTINGS)
def test_hll_merge_equals_whole_for_any_split(spark, rows, split):
    """X158 universal: registers built on ANY disjoint split of the
    items and merged by (key, reg) max equal the whole-data registers
    — the mergeability theorem, not just the doc_id%2 example."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import sketch

    df = spark.createDataFrame(
        [(k, str(v), i % split) for i, (k, v) in enumerate(rows)],
        ["k", "item", "part"],
    )
    whole = {
        (r.k, r.reg): r.rho
        for r in sketch.hll_registers(df, ["k"], "item").collect()
    }
    parts = [
        sketch.hll_registers(df.filter(F.col("part") == p), ["k"], "item")
        for p in range(split)
    ]
    merged = {
        (r.k, r.reg): r.rho
        for r in sketch.hll_merge(
            *[f.select("k", "reg", "rho") for f in parts]
        ).collect()
    }
    assert whole == merged


@given(rows=_items, split=st.integers(1, 6))
@settings(**_SETTINGS)
def test_cms_merge_equals_whole_for_any_split(spark, rows, split):
    """X181 universal: per-part Count-Min cells merged by cell-wise
    sum equal the whole-data cells for ANY disjoint split."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import sketch

    df = spark.createDataFrame(
        [(str(v), i % split) for i, (_k, v) in enumerate(rows)],
        ["item", "part"],
    )
    whole = {(r.d, r.c): r.n for r in sketch.cms_cells(df).collect()}
    merged = {
        (r.d, r.c): r.n
        for r in sketch.cms_merge(
            *[
                sketch.cms_cells(df.filter(F.col("part") == p))
                for p in range(split)
            ]
        ).collect()
    }
    assert whole == merged


_seqs = st.lists(
    st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=6),
    min_size=2,
    max_size=8,
)


@given(seqs=_seqs)
@settings(**_SETTINGS)
def test_video_blocking_is_exhaustive_for_one_substitution(spark, seqs):
    """X159 universal (the FastSS pigeonhole lifted to token
    sequences): for ANY set of frame sequences, every pair with equal
    length, ≤1 mismatching position, and ≥1 agreeing position is
    emitted — verified against a brute-force Python reference."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import (
        multimodal as mm,
    )

    # synthesize assets whose fingerprint frames are exactly the given
    # tokens: frame_chars=1, stride=1 makes each char one frame; ids
    # stride 3 so every asset is kind='video' (id % 3 == 2)
    docs = spark.createDataFrame(
        [(2 + 3 * i, "".join(s)) for i, s in enumerate(seqs)],
        ["doc_id", "text"],
    )
    got = {
        (r.asset_a, r.asset_b)
        for r in mm.video_near_dup(
            mm.synthesize_assets(docs), frame_chars=1, stride=1
        ).collect()
    }
    expect = set()
    data = [(2 + 3 * i, s) for i, s in enumerate(seqs)]
    for i in range(len(data)):
        for j in range(i + 1, len(data)):
            (ida, sa), (idb, sb) = data[i], data[j]
            if len(sa) != len(sb):
                continue
            diff = sum(1 for a, b in zip(sa, sb) if a != b)
            if diff <= 1 and len(sa) - diff >= 1:
                expect.add((min(ida, idb), max(ida, idb)))
    assert got == expect
