"""X141 incremental-vs-full closure cost (round 10).

Measures graph.incremental_components against a full
connected_components recompute as the base graph grows: a synthetic
labeled base (N nodes in N/4 four-node components — the clustered
shape near-dup graphs have) takes a FIXED small delta (120 edges
touching 60 components + 40 brand-new nodes). The full recompute
scales with N; the incremental path should stay ~flat, because its
only full-width work is one hash join of the label table against the
delta endpoints — everything else runs on the affected subgraph.

Usage: python scripts/bench_incremental_cc.py [N ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.operators import graph  # noqa: E402


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [100_000, 400_000, 1_600_000]
    spark = get_spark(app_name="incremental_cc_bench")
    spark.range(1).count()
    for n in sizes:
        # base: chains 4k-(4k+1)-(4k+2)-(4k+3); labels = min = 4k
        ids = spark.range(n).select(F.col("id").alias("node"))
        base_edges = (
            spark.range(n - 1)
            .filter(F.col("id") % 4 != 3)
            .select(F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
        )
        base_labels = ids.select(
            "node", (F.col("node") - F.col("node") % 4).alias("component")
        ).localCheckpoint(eager=True)
        # delta: 120 edges linking component k to k+1 (k = 8j), plus
        # 40 new nodes hanging off component 0
        delta = (
            spark.range(60)
            .select(
                (F.col("id") * 32).alias("u"),
                (F.col("id") * 32 + 4).alias("v"),
            )
            .union(
                spark.range(60, 120).select(
                    (F.lit(n) + F.col("id")).alias("u"),
                    (F.col("id") % 4).alias("v"),
                )
            )
        ).localCheckpoint(eager=True)
        new_nodes = delta.select(F.col("u").alias("node")).filter(
            F.col("node") >= n
        )

        t0 = time.time()
        inc = graph.incremental_components(
            base_labels, delta, new_nodes=new_nodes
        )
        n_inc = inc.count()
        t_inc = time.time() - t0

        t0 = time.time()
        full = graph.connected_components(
            base_edges.union(delta), nodes=ids.union(new_nodes)
        )
        n_full = full.count()
        t_full = time.time() - t0

        # exactness spot-check: identical label multisets
        diff = (
            inc.withColumnRenamed("component", "ci")
            .join(full.withColumnRenamed("component", "cf"), "node")
            .filter(F.col("ci") != F.col("cf"))
            .count()
        )
        print(
            f"N={n}: incremental={t_inc:.1f}s ({n_inc} rows) "
            f"full={t_full:.1f}s ({n_full} rows) label_diffs={diff}"
        )


if __name__ == "__main__":
    main()
