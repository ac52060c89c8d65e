"""Measured A/B behind the r9 trained-quantizer capstone (VERDICT r8
ask #1): clustered-fixture recall@5 of IVF-PQ under (a) stride-sampled
quantizers (the r8 baseline, 0.52), (b) raw-code ADC with Lloyd-
TRAINED quantizers at rounds ∈ {1..6} (via the coarse_cents/pq_cents
overrides of topk_ivfpq), and (c) the residual-encoding IVFADC
RE-MEASURED on trained means — r8 measured residuals at 0.08 on
stride centroids and attributed the collapse to "stride centroids
aren't trained means"; this script CONFIRMED that attribution
(residual 0.60/0.66 at 2/3 rounds beats raw-code-trained 0.54/0.58),
so similarity.topk_ivfpq_trained ships the textbook residual form
with KM_TRAIN_ROUNDS = 3. Numbers in BENCH_NOTES r9.

Usage: python scripts/bench_ivfpq_training.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_kinesis_data_ingestion_restapi_spark import get_spark
from aws_kinesis_data_ingestion_restapi_spark.operators import similarity as S


def recall(approx, truth_set, nq=10, k=5):
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    return len(got & truth_set) / (nq * k)


def residual_ivfpq(embs, coarse, books_fn, nq=10, k=5, m=4, nprobe=3,
                   refine=20):
    """Textbook IVFADC on a given coarse quantizer (the EXPERIMENT
    form this script originally measured; the shipped implementation
    is similarity.topk_ivfpq_trained — kept here so the raw-vs-
    residual A/B stays reproducible with independent code): PQ codes
    encode the RESIDUAL v − centroid(cell); query distance tables are
    per (query, probed cell). books_fn(subs) -> (sub, cell, cv)."""
    base = embs.select("vec_id", S.quantized().alias("v"))
    cents = coarse.select("cell", "cv")
    expanded = base.join(F.broadcast(cents)).select(
        "vec_id", "v", "cv",
        F.struct(S.dist2_i(F.col("v"), F.col("cv")).alias("d2"),
                 F.col("cell").alias("cell")).alias("dc"),
    )
    assign = (
        expanded.groupBy("vec_id")
        .agg(F.min("dc").alias("mm"), F.first("v").alias("v"))
        .select("vec_id", F.col("mm.cell").alias("cell"), "v")
        .join(cents, "cell")
        .select("vec_id", "cell",
                F.zip_with("v", "cv", lambda a, b: a - b).alias("rv"))
    )
    # residual subvectors of every vector (for codebook training+codes)
    d_over_m = F.expr(f"size(rv) DIV {m}")
    rsubs = assign.select(
        "vec_id", "cell",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col("rv"),
    ).select(
        "vec_id", "cell", "sub",
        F.expr(f"slice(rv, sub * (size(rv) DIV {m}) + 1,"
               f" size(rv) DIV {m})").alias("sv"),
    )
    # codebook side never needs the coarse cell — drop it so the
    # codebook's own `cell` label can't collide
    rs = rsubs.select("vec_id", "sub", "sv")
    books = books_fn(rs)
    codes = (
        rs.join(F.broadcast(books), "sub")
        .select("vec_id", "sub",
                F.struct(S.dist2_i(F.col("sv"), F.col("cv")).alias("d2"),
                         F.col("cell").alias("cell")).alias("dc"))
        .groupBy("vec_id", "sub").agg(F.min("dc").alias("best"))
        .select(F.col("vec_id").alias("neighbor_id"), "sub",
                F.col("best.cell").alias("pcell"))
    )
    nassign = assign.select(F.col("vec_id").alias("neighbor_id"), "cell")
    # query probes + per-(query, cell) residual distance tables
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_d2").asc(), F.col("cell").asc())
    probes = (
        expanded.filter(F.col("vec_id") < nq)
        .select(F.col("vec_id").alias("query_id"),
                F.col("dc.cell").alias("cell"), F.col("dc.d2").alias("_d2"))
        .withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe).select("query_id", "cell")
    )
    qres = (
        base.filter(F.col("vec_id") < nq)
        .select(F.col("vec_id").alias("query_id"), "v")
        .join(F.broadcast(probes), "query_id")
        .join(F.broadcast(cents), "cell")
        .select("query_id", "cell",
                F.zip_with("v", "cv", lambda a, b: a - b).alias("rv"))
    )
    qsubs = qres.select(
        "query_id", "cell",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col("rv"),
    ).select(
        "query_id", "cell", "sub",
        F.expr(f"slice(rv, sub * (size(rv) DIV {m}) + 1,"
               f" size(rv) DIV {m})").alias("sv"),
    )
    dtab = qsubs.join(F.broadcast(books.withColumnRenamed("cell", "pcell")),
                      "sub").select(
        "query_id", "cell", "sub", "pcell",
        S.dist2_i(F.col("sv"), F.col("cv")).alias("qd2"))
    adc = (
        codes.join(nassign, "neighbor_id")
        .join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(dtab), ["query_id", "cell", "sub", "pcell"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd2").alias("_adc"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("_adc").asc(), F.col("neighbor_id").asc())
    shortlist = (adc.withColumn("_ar", F.row_number().over(wa))
                 .filter(F.col("_ar") <= refine)
                 .select("query_id", "neighbor_id"))
    qv = base.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    cv = base.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("v").alias("nv"))
    scored = (shortlist.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
              .select("query_id", "neighbor_id",
                      S.dot_i(F.col("qv"), F.col("nv")).alias("_score_i")))
    return S._topk(scored, k)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="ivfpq-training-ab")
    embs = S.clustered_embeddings(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    embs = embs.cache()
    n = embs.count()
    stride = S.auto_stride(n)
    truth = {(r.query_id, r.neighbor_id)
             for r in S.topk_brute(embs).collect()}

    t0 = time.perf_counter()
    r_stride = recall(S.topk_ivfpq(embs, centroid_stride=stride), truth)
    t_stride = time.perf_counter() - t0
    print(f"ivfpq stride          recall@5={r_stride:.2f}  {t_stride:.1f}s")

    # raw-code ADC over TRAINED quantizers (the r8 design + training)
    for rounds in (1, 2, 3, 4, 6):
        t0 = time.perf_counter()
        coarse = S.train_coarse_centroids(embs, rounds=rounds,
                                          centroid_stride=stride)
        books = S.train_pq_codebooks(embs, rounds=rounds,
                                     centroid_stride=stride)
        r_tr = recall(
            S.topk_ivfpq(embs, centroid_stride=stride,
                         coarse_cents=coarse, pq_cents=books), truth)
        print(f"raw-code trained r={rounds} recall@5={r_tr:.2f}  "
              f"{time.perf_counter() - t0:.1f}s")

    # flat-ivf reference point
    print(f"ivf-flat              recall@5="
          f"{recall(S.topk_ivf(embs, centroid_stride=stride), truth):.2f}")

    # residual IVFADC on trained means — the SHIPPED form
    # (similarity.topk_ivfpq_trained), swept over training rounds
    for rounds in (2, 3):
        t0 = time.perf_counter()
        r_res = recall(S.topk_ivfpq_trained(embs, rounds=rounds,
                                            centroid_stride=stride), truth)
        print(f"residual trained r={rounds} recall@5={r_res:.2f}  "
              f"{time.perf_counter() - t0:.1f}s  (shipped form)")

    # independent-check: the script's own residual implementation must
    # agree with the shipped one at the pinned config
    coarse = S.train_coarse_centroids(embs, rounds=S.KM_TRAIN_ROUNDS,
                                      centroid_stride=stride)

    def train_books(rs):
        return S.train_subspace_codebooks(rs, rounds=S.KM_TRAIN_ROUNDS,
                                          centroid_stride=stride)

    ship = {(r.query_id, r.neighbor_id, r.rank)
            for r in S.topk_ivfpq_trained(
                embs, centroid_stride=stride).collect()}
    expt = {(r.query_id, r.neighbor_id, r.rank)
            for r in residual_ivfpq(embs, coarse, train_books).collect()}
    assert ship == expt, "shipped residual form != experiment form"
    print(f"shipped == experiment at rounds={S.KM_TRAIN_ROUNDS}: OK "
          f"({len(ship)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
