"""Skew-resilience measurement (round-4 VERDICT stretch ask #7).

Builds a deliberately skewed fixture — ONE hot key holding ~50% of the
fact rows — and measures the operators X19 exists for, with and
without the countermeasure. Results are committed to BENCH_NOTES so
the salted plans carry a NUMBER, not just an equivalence proof.

Three experiments (all deterministic, no rand()):

1. JOIN skew — fact(50% hot) ⋈ dim on the key, forced shuffle join
   (broadcast off):
     a. AQE off                 → the hot reducer owns half the probe
     b. AQE skew-split on       → runtime split (needs the byte
                                  threshold lowered at this scale;
                                  noted — at 100 TB the default 256 MB
                                  threshold trips on its own)
     c. salted_join, AQE off    → plan-level spread over n_salts
                                  reducers

2. AGG skew, re-aggregable fns — plain groupBy-sum vs salted_agg.
   EXPECTED ~parity: Spark's map-side partial aggregation already
   collapses a hot key to one partial row per input partition, so
   hot-KEY skew cannot survive into the shuffle for sum/count/min/max.
   Measured and documented honestly (salted_agg's docstring carries
   the result); its value is the shuffle-shape guarantee for engines/
   plans without map-side combine and for composed partials.

3. WINDOW skew — a per-key running sum (window partitionBy the hot
   key puts 50% of rows in ONE task) vs the two-level salted prefix
   form (partial per (key, salt-block) + broadcast block offsets —
   the packing.py / concurrency-curve pattern).

Usage: python scripts/skew_bench.py [n_rows] (default 8M)
Prints one JSON line; paste the ratios into BENCH_NOTES.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.operators.scale import (  # noqa: E402
    salted_agg,
    salted_join,
)

N_SALTS = 32


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_keys = 100_000
    spark = get_spark(app_name="skew_bench")
    spark.range(1).count()

    # --- fixture: one hot key = 50% of rows, long uniform tail -------
    # deterministic: key from the row id, no rand(); hot rows
    # interleave through every input partition (the realistic layout).
    fact = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        .persist()
    )
    fact.count()  # materialize so every variant reads identical input
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), F.xxhash64("id").alias("attr")
    )

    results: dict[str, float] = {}

    def set_conf(aqe: str, skew: str) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
        # at this fixture scale the hot partition is ~100 MB — below
        # AQE's 256 MB default trip-wire; lower it so the 100 TB
        # behavior (where the default trips on its own) is visible.
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m",
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")

    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}

    def with_confs(confs: dict, fn):
        old = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            return fn()
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)

    join_agg = lambda j: j.groupBy("k").agg(  # noqa: E731
        F.sum(F.col("v") * F.col("attr")).alias("s")
    )

    # 1a. plain shuffle join, AQE fully off
    set_conf("false", "false")
    results["join_plain_noaqe"] = with_confs(
        no_bcast, lambda: timed(lambda: _noop(join_agg(fact.join(dim, "k"))))
    )
    # 1b. AQE skew split on
    set_conf("true", "true")
    results["join_aqe_skewsplit"] = with_confs(
        no_bcast, lambda: timed(lambda: _noop(join_agg(fact.join(dim, "k"))))
    )
    # 1c. salted join, AQE off — the plan-level fix needs no runtime
    set_conf("false", "false")
    results["join_salted_noaqe"] = with_confs(
        no_bcast,
        lambda: timed(
            lambda: _noop(join_agg(salted_join(fact, dim, ["k"], N_SALTS)))
        ),
    )
    set_conf("true", "true")

    # equivalence spot-check (same sums through all three paths)
    a = join_agg(fact.join(dim, "k")).agg(F.sum("s")).collect()[0][0]
    c = (
        join_agg(salted_join(fact, dim, ["k"], N_SALTS))
        .agg(F.sum("s"))
        .collect()[0][0]
    )
    assert a == c, (a, c)

    # 2. aggregation — map-side combine already handles hot keys
    results["agg_plain"] = timed(
        lambda: _noop(
            fact.groupBy("k").agg(F.sum("v").alias("s"),
                                  F.count("v").alias("c"))
        )
    )
    results["agg_salted"] = timed(
        lambda: _noop(
            salted_agg(fact, ["k"],
                       {"s": ("sum", "v"), "c": ("count", "v")},
                       n_salts=N_SALTS)
        )
    )

    # 3. window — partitionBy(hot key) serializes 50% of rows in 1 task
    w = Window.partitionBy("k").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    results["window_plain"] = timed(
        lambda: _noop(fact.select("k", "v", F.sum("v").over(w).alias("rs")))
    )
    # two-level salted prefix: running sum per (k, salt-block) + the
    # broadcast per-key block offsets (packing.py pattern). Exact same
    # rs values requires a global per-key order; block = coarse v
    # range so blocks are ordered and the offset join is tiny.
    blk = F.floor(F.col("v") / F.lit(1000.0 / N_SALTS)).alias("_blk")
    base = fact.select("k", "v", blk)
    wb = Window.partitionBy("k", "_blk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sums = base.groupBy("k", "_blk").agg(F.sum("v").alias("_bsum"))
    woff = Window.partitionBy("k").orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = sums.select(
        "k", "_blk", F.coalesce(F.sum("_bsum").over(woff), F.lit(0.0)).alias("_off")
    )
    results["window_salted"] = timed(
        lambda: _noop(
            base.withColumn("_ps", F.sum("v").over(wb))
            .join(F.broadcast(offs), ["k", "_blk"])
            .select("k", "v", (F.col("_ps") + F.col("_off")).alias("rs"))
        )
    )

    results["n_rows"] = n_rows
    results["n_salts"] = N_SALTS
    results["join_speedup_salted"] = round(
        results["join_plain_noaqe"] / results["join_salted_noaqe"], 2
    )
    results["join_speedup_aqe"] = round(
        results["join_plain_noaqe"] / results["join_aqe_skewsplit"], 2
    )
    results["window_speedup_salted"] = round(
        results["window_plain"] / results["window_salted"], 2
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
