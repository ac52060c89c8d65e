"""Incremental-dedup probe-cost telemetry (round-6 VERDICT ask #6).

The 100 TB claim behind operators/dedup.incremental_dedup_delta is that
per-batch cost is governed by the DELTA, not the corpus: the corpus's
signature index is a write-once persisted artifact, each batch only
probes it. This script makes that claim a measured number instead of an
assertion:

  A  fixed small delta  vs  sf0.01 corpus index   (baseline)
  B  SAME delta         vs  sf0.1  corpus index   (10x the corpus)
  C  10x the delta      vs  sf0.1  corpus index   (10x the delta)

If the claim holds, B/A stays far below 10x (the only corpus-linear
term left is the unbucketed local parquet scan of the index — at
deployment scale the index is bucketed by band_key and that term
prunes too), while C/B shows the cost actually tracking |delta|.

The corpus index (signatures parquet) is built and persisted OUTSIDE
the timed region — that is the whole point of the incremental shape.
Each measurement drains the full result with a count + checksum action.

Run:  python scripts/bench_incremental_probe.py
Prints one JSON line; numbers are recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark.session import get_spark
from aws_kinesis_data_ingestion_restapi_spark.operators import dedup
from aws_kinesis_data_ingestion_restapi_spark.operators.registry_ext import (
    _DELTA_PCT,
    _docs,
)

SF_SMALL = os.environ.get("SPARK_GRAFT_PROBE_SMALL", "/root/testdata/sf0.01")
SF_BIG = os.environ.get("SPARK_GRAFT_PROBE_BIG", "/root/testdata/sf0.1")


def _sigs(spark, sf_dir):
    return dedup.minhash_signatures(_docs(spark, sf_dir), num_perm=32)


def main() -> None:
    spark = get_spark(app_name="bench-incremental-probe")
    tmp = tempfile.mkdtemp(prefix="probe_bench_")
    try:
        is_delta = F.col("doc_id") % 10 >= _DELTA_PCT

        # ---- untimed: build + persist the two corpus indexes --------
        paths = {}
        build_secs = {}
        for tag, sf in (("small", SF_SMALL), ("big", SF_BIG)):
            t0 = time.time()
            p = os.path.join(tmp, f"corpus_{tag}")
            _sigs(spark, sf).filter(~is_delta).write.parquet(p)
            build_secs[tag] = round(time.time() - t0, 2)
            paths[tag] = p

        # deltas are the per-batch input: the batch's shingle+minhash
        # cost is part of every probe, so it stays INSIDE the timing
        def probe(delta_sf: str, corpus_tag: str) -> tuple[float, int, int]:
            t0 = time.time()
            delta_sigs = _sigs(spark, delta_sf).filter(is_delta)
            corpus_sigs = spark.read.parquet(paths[corpus_tag])
            out = dedup.incremental_dedup_delta(
                corpus_sigs=corpus_sigs,
                delta_sigs=delta_sigs,
                num_perm=32,
                bands=4,
                threshold=0.5,
            )
            row = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.crc32(F.concat_ws("|", "doc_id", "verdict"))).alias("ck"),
            ).collect()[0]
            return round(time.time() - t0, 2), int(row["n"]), int(row["ck"])

        # warm the JVM/codegen paths once so A isn't charged JIT cost
        probe(SF_SMALL, "small")

        a_sec, a_n, _ = probe(SF_SMALL, "small")
        b_sec, b_n, _ = probe(SF_SMALL, "big")
        c_sec, c_n, _ = probe(SF_BIG, "big")

        print(json.dumps({
            "metric": "incremental_probe_scaling",
            "unit": "sec",
            "index_build": build_secs,
            "A_fixed_delta_small_corpus": {"sec": a_sec, "delta_rows": a_n},
            "B_fixed_delta_10x_corpus": {"sec": b_sec, "delta_rows": b_n},
            "C_10x_delta_10x_corpus": {"sec": c_sec, "delta_rows": c_n},
            "ratio_10x_corpus": round(b_sec / a_sec, 2),
            "ratio_10x_delta": round(c_sec / b_sec, 2),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
