"""Round-4 hardening tests: NANOS-proof parquet reads, o(n) IVF
centroids, fuzzy-join key-pair semantics, loud CC non-convergence.

The NANOS fixture replays the round-1 driver breakage: the testdata
generator once shipped events.ts as parquet TIMESTAMP(NANOS), which
this Spark build's vectorized reader rejects and whose legacy
``nanosAsLong`` escape hatch silently stopped working across a build
upgrade. ``read_parquet_tolerant`` must survive every representation
with identical query results.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark.sources.tables import (
    read_parquet_tolerant,
)


def _write_events(path: str, unit: str) -> None:
    base = datetime.datetime(2024, 1, 1)
    n = 300
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
            "event_type": pa.array(
                [["click", "view", "buy"][i % 3] for i in range(n)]
            ),
            "ts": pa.array(
                [base + datetime.timedelta(seconds=600 * i) for i in range(n)],
                pa.timestamp(unit),
            ),
            "value": pa.array([i * 0.5 for i in range(n)], pa.float64()),
        }
    )
    pq.write_table(tbl, path)


def _daily_counts(spark, path):
    from aws_kinesis_data_ingestion_restapi_spark.functions.exact import as_timestamp

    df = read_parquet_tolerant(spark, path)
    return sorted(
        df.select(F.to_date(as_timestamp(df, "ts")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )


def test_nanos_parquet_reads_like_micros(spark, tmp_path):
    """A TIMESTAMP(NANOS) events file must produce the same aggregate
    as the TIMESTAMP(MICROS) form of the same data."""
    micros = os.path.join(tmp_path, "events_us.parquet")
    nanos = os.path.join(tmp_path, "events_ns.parquet")
    _write_events(micros, "us")
    _write_events(nanos, "ns")
    want = _daily_counts(spark, micros)
    got = _daily_counts(spark, nanos)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(want) > 1  # fixture spans multiple days


def test_events_daily_stats_on_nanos_testdata(spark, tmp_path):
    """The registry query that broke in round 1 must run green on a
    NANOS-regenerated events table."""
    from aws_kinesis_data_ingestion_restapi_spark.registry import QUERY_FNS

    sf_dir = os.path.join(tmp_path, "sf")
    os.makedirs(sf_dir)
    _write_events(os.path.join(sf_dir, "events.parquet"), "ns")
    rows = QUERY_FNS["events_daily_stats"](spark, sf_dir).collect()
    assert len(rows) > 1
    assert {"day", "n_events"} <= set(rows[0].asDict())


def test_tolerant_reader_native_path_untouched(spark, tmp_path):
    """No NANOS columns → the plain native scan (pushdown intact)."""
    p = os.path.join(tmp_path, "plain.parquet")
    _write_events(p, "us")
    plan = (
        read_parquet_tolerant(spark, p)
        .filter(F.col("event_id") == 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "mapInPandas" not in plan.lower()


def test_ivf_auto_stride_is_sublinear():
    from aws_kinesis_data_ingestion_restapi_spark.operators.similarity import (
        auto_stride,
    )

    for n, expect in ((0, 1), (1, 1), (2000, 44), (1_000_000, 1000)):
        assert auto_stride(n) == expect
    # centroid count ≈ √n: o(n) in the corpus size
    for n in (10_000, 1_000_000, 100_000_000):
        stride = auto_stride(n)
        n_centroids = len(range(0, n, stride))
        assert n_centroids <= 2 * (n**0.5) + 1


def test_ivf_runs_with_auto_stride(spark):
    from aws_kinesis_data_ingestion_restapi_spark.operators.similarity import topk_ivf

    embs = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 5).cast("float"),
            (F.col("id") % 3).cast("float"),
            F.lit(1.0).cast("float"),
        ).alias("embedding"),
    )
    out = topk_ivf(embs, n_queries=3, k=2)
    rows = out.collect()
    assert {r["query_id"] for r in rows} <= {0, 1, 2}
    assert all(r["rank"] <= 2 for r in rows)


def test_fuzzy_join_dedupes_recurring_keys(spark):
    """A key recurring with different texts yields ONE pair row with
    the minimum distance (the documented semantics)."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame(
        [(1, "abc"), (1, "abd")], ["k", "t"]
    )
    right = spark.createDataFrame([(9, "abc")], ["k", "t"])
    rows = fuzzy_join(left, right, "k", "t", "k", "t").collect()
    assert len(rows) == 1
    assert rows[0]["left_key"] == 1 and rows[0]["right_key"] == 9
    assert rows[0]["dist"] == 0  # min over {0 ("abc"), 1 ("abd")}


def test_connected_components_raises_on_non_convergence(spark):
    from aws_kinesis_data_ingestion_restapi_spark.operators.graph import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["a", "b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # and converges fine when allowed enough rounds
    ok = connected_components(chain, max_iter=40).collect()
    assert {r["component"] for r in ok} == {0}


def test_bm25_rank_basic(spark):
    """Sanity on a hand-built corpus: term-dense short docs outrank
    long sparse ones; ranks are contiguous from 1; only matching docs
    appear."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.text import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),           # dense hit
            (2, "spark " + "filler " * 50),      # diluted hit
            (3, "join join"),                    # other term
            (4, "nothing relevant here"),        # no hit
        ],
        "doc_id long, text string",
    )
    rows = bm25_rank(docs, ["spark", "join"], top_n=10).collect()
    got = {r["doc_id"]: r for r in rows}
    assert 4 not in got
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    assert got[1]["score"] > got[2]["score"]  # tf saturation + length norm


def test_dedup_canonical_docs_partitions_corpus(spark, tmp_path):
    """Survivors' cluster sizes must partition the corpus: Σ sizes =
    n_docs, every survivor is its own component min, and exact
    duplicates collapse onto the smallest doc_id."""
    import os

    from aws_kinesis_data_ingestion_restapi_spark.operators.registry_ext import (
        dedup_canonical_docs,
    )

    rows = [
        (i, "en", "srcA", f"totally unique document number {i} " * 5)
        for i in range(8)
    ] + [
        (100 + i, "de", "srcB", "the exact same duplicated text " * 10)
        for i in range(4)
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = os.path.join(tmp_path, "sf")
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows]),
                "source": pa.array([r[2] for r in rows]),
                "text": pa.array([r[3] for r in rows]),
            }
        ),
        os.path.join(sf, "documents.parquet"),
    )
    out = dedup_canonical_docs(spark, sf).collect()
    assert sum(r["cluster_size"] for r in out) == len(rows)
    dup_cluster = [r for r in out if r["cluster_size"] >= 4]
    assert any(r["doc_id"] == 100 for r in dup_cluster)  # min-id survivor
    assert all(r["doc_id"] != 101 for r in out)  # collapsed member gone


def test_expectations_report_flags_violations(spark):
    """Violated rules report the exact offending fraction with
    passed=false; clean rules pass; one row per rule."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.expectations import (
        dup_key_frac,
        expectations_report,
        frac,
    )

    df = spark.createDataFrame(
        [(1, "en"), (1, "de"), (2, None), (3, "xx")],
        "k long, lang string",
    )
    rules = {
        "k_unique": (dup_key_frac("k"), 0.0),
        "lang_known": (frac(~F.col("lang").isin("en", "de")), 0.0),
        "k_small": (frac(F.col("k") > 100), 0.0),
    }
    rows = {r["rule"]: r for r in expectations_report(df, rules).collect()}
    assert len(rows) == 3
    assert rows["k_unique"]["metric"] == 0.25 and not rows["k_unique"]["passed"]
    # NULL lang: isin-negation is NULL -> not counted (documented CASE parity)
    assert rows["lang_known"]["metric"] == 0.25 and not rows["lang_known"]["passed"]
    assert rows["k_small"]["metric"] == 0.0 and rows["k_small"]["passed"]
