"""X135 cost decomposition: LPA wall vs round count at sf0.1.

Attribution question (the X106 k-core precedent): is the in-bench cost
data-bound or bounded-round iteration overhead? Runs label_propagation
at rounds=1..4 over the sf0.1 purchase graph and prints the marginal
cost per added round. Results recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.operators import graph  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="bench-lpa-rounds")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("u"),
            (F.col("l_suppkey") + 1_000_000_000).alias("v"),
        )
        .distinct()
    )
    n_edges = e.count()
    prev = None
    for rounds in (1, 2, 3, 4):
        t0 = time.perf_counter()
        out = graph.label_propagation(e, rounds=rounds)
        n = out.count()
        w = time.perf_counter() - t0
        marginal = "" if prev is None else f"  (+{w - prev:.2f}s marginal)"
        print(f"rounds={rounds}: {n} nodes, {n_edges} edges, {w:.2f}s{marginal}")
        prev = w


if __name__ == "__main__":
    main()
