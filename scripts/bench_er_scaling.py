"""X136 entity-resolution blocking scale measurement (round 10).

The ER composition's 100 TB claim is that candidates come from an
equi-join on (deletion variant, agreement attrs) — near-linear in
rows — while the reference formulation is the n²/2 cross join. This
script measures, at each gate SF: the EXACT candidate-pair count the
blocking generates (computed from the plan's own frames, not
estimated), the quadratic pair count it replaces, the verified-edge
count, and the end-to-end wall of resolve_entities.

Usage: python scripts/bench_er_scaling.py [sf_dir ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.operators import fuzzy  # noqa: E402

ATTRS = ("c_nationkey", "c_mktsegment")


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark(app_name="er_scaling")
    spark.range(1).count()
    for sf_dir in sf_dirs:
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        n = cust.count()
        base = cust.select(
            F.col("c_custkey").alias("_k"),
            F.col("c_name").alias("_s"),
            *[F.col(a) for a in ATTRS],
            F.explode(fuzzy._deletion_variants("c_name")).alias("_v"),
        )
        a = base.select(
            F.col("_k").alias("key_a"), "_v", *ATTRS
        )
        b = base.select(
            F.col("_k").alias("key_b"), "_v", *ATTRS
        )
        cand = (
            a.join(b, ["_v", *ATTRS])
            .filter(F.col("key_a") < F.col("key_b"))
            .select("key_a", "key_b")
            .distinct()
            .count()
        )
        t0 = time.time()
        out = fuzzy.resolve_entities(
            cust, "c_custkey", "c_name", attrs=ATTRS
        )
        ents = out.select("entity_id").distinct().count()
        wall = time.time() - t0
        quad = n * (n - 1) // 2
        print(
            f"{sf_dir}: n={n} quadratic_pairs={quad} "
            f"blocked_candidates={cand} ({100.0 * cand / quad:.4f}%) "
            f"entities={ents} resolve_wall={wall:.1f}s"
        )


if __name__ == "__main__":
    main()
