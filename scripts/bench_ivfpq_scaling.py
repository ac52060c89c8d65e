"""IVF-PQ candidate-restriction scaling A/B (round 8).

At the gate SFs the embeddings corpus is 500-2000 vectors (K=22-44
coarse cells), so flat-PQ ADC and cell-restricted ADC cost about the
same — the restriction's value only appears when n/K·nprobe ≪ n.
This script measures exactly that: the corpus is replicated R× with
deterministically remapped ids (vec_id + n·i; the replicas reuse the
original float payloads, so geometry is unchanged and everything
stays within the determinism contract), then flat ann-PQ and IVF-PQ
are timed on the SAME session, plus the EXACT candidate-row counts
each plan feeds its ADC stage (computed from the index frames, not
estimated).

Usage: python scripts/bench_ivfpq_scaling.py [sf_dir] [replications...]
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.operators import similarity as S  # noqa: E402


def replicated(embs, r: int, n: int):
    reps = None
    for i in range(r):
        part = embs.select(
            (F.col("vec_id") + n * i).alias("vec_id"), "embedding"
        )
        reps = part if reps is None else reps.unionByName(part)
    return reps


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark(app_name="ivfpq_scaling")
    spark.range(1).count()
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = base.count()
    print(f"base corpus n={n0}")
    for r in reps:
        embs = replicated(base, r, n0).localCheckpoint(eager=True)
        n = n0 * r
        stride = S.auto_stride(n)
        k_cells = embs.filter((F.col("vec_id") % stride) == 0).count()
        for name, fn in (("pq_flat", S.topk_pq), ("ivfpq", S.topk_ivfpq)):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            out = fn(embs, n_queries=10, k=5)
            cnt = out.count()
            dt = time.perf_counter() - t0
            print(f"r={r} n={n} K={k_cells} {name}: {dt:.2f}s rows={cnt}")
        # exact ADC candidate volume per plan (rows entering the
        # distance-table join), computed from the same index frames
        basev = embs.select("vec_id", S.quantized().alias("v"))
        cents = basev.filter((F.col("vec_id") % stride) == 0).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("cv")
        )
        expanded = basev.join(F.broadcast(cents)).select(
            "vec_id",
            F.struct(
                S.dist2_i(F.col("v"), F.col("cv")).alias("d2"),
                F.col("cell").alias("cell"),
            ).alias("dc"),
        )
        assign = (
            expanded.groupBy("vec_id").agg(F.min("dc").alias("m"))
            .select("vec_id", F.col("m.cell").alias("cell"))
        )
        from pyspark.sql.window import Window

        wq = Window.partitionBy("query_id").orderBy(
            F.col("_d2").asc(), F.col("cell").asc()
        )
        probes = (
            expanded.filter(F.col("vec_id") < 10)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("dc.cell").alias("cell"),
                F.col("dc.d2").alias("_d2"),
            )
            .withColumn("_r", F.row_number().over(wq))
            .filter(F.col("_r") <= S.N_PROBES)
            .select("query_id", "cell")
        )
        restricted = assign.join(probes, "cell").count()
        print(
            f"r={r} ADC pair volume: flat = 10 x {n} = {10 * n}, "
            f"restricted = {restricted} "
            f"({restricted / (10 * n):.1%} of flat)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
