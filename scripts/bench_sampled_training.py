"""Sample-bounded quantizer training A/B (round 10, VERDICT ask #3).

X113's full-corpus Lloyd training measured n^1.5 (98 s at 32k
vectors, BENCH_NOTES r9) because K = auto_stride ≈ √n AND every round
touches all n vectors. The FAISS-standard fix: pin K and train on a
fixed-size deterministic sample (the X79 md5 hash-rank sample), so
per-round cost is O(sample·K) — constant in corpus size — while
add/search stay full-corpus. This script measures BOTH halves of the
shipping decision:

1. RECALL — trained-residual IVFADC recall@5 (refine=IVFPQT_REFINE)
   under full-corpus training vs sampled training at several
   (sample_n, K) configs, on the raw corpus AND the clustered
   fixture, at the gate SFs. Ship only if sampled recall is within
   noise of full-corpus.
2. TRAINING WALL vs corpus size — the replicated-id harness
   (bench_ivfpq_scaling's remapping) at R ∈ {1, 4, 16}: full-corpus
   training wall should grow superlinearly, sampled training wall
   should stay ~flat.

Usage: python scripts/bench_sampled_training.py [sf_dir ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.operators import (  # noqa: E402
    similarity as S,
)

REFINE = 50  # registry IVFPQT_REFINE


def recall(approx, truth_set, nq=10, k=5):
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    return len(got & truth_set) / (nq * k)


def trained_recall(embs, truth_set, sample_n, k_seeds):
    coarse = S.train_coarse_centroids(
        embs, sample_n=sample_n, k_seeds=k_seeds
    )
    books = S.train_residual_books(
        embs, coarse, sample_n=sample_n, k_seeds=k_seeds
    )
    out = S.topk_ivfpq_trained(
        embs, n_queries=10, k=5, refine=REFINE,
        coarse_cents=coarse, books=books,
    )
    return recall(out, truth_set)


def replicated(embs, r: int, n: int):
    reps = None
    for i in range(r):
        part = embs.select(
            (F.col("vec_id") + n * i).alias("vec_id"), "embedding"
        )
        reps = part if reps is None else reps.unionByName(part)
    return reps


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01", "/root/testdata/sf0.1"
    ]
    spark = get_spark(app_name="sampled_training_ab")
    spark.range(1).count()

    for sf_dir in sf_dirs:
        base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        for label, embs in (
            ("raw", base),
            ("clustered", S.clustered_embeddings(base)),
        ):
            embs = embs.localCheckpoint(eager=True)
            truth = {
                (r.query_id, r.neighbor_id)
                for r in S.topk_brute(embs, n_queries=10, k=5).collect()
            }
            t0 = time.time()
            r_full = trained_recall(embs, truth, None, None)
            t_full = time.time() - t0
            print(
                f"{sf_dir} {label}: FULL-corpus recall@5={r_full:.2f}"
                f" ({t_full:.1f}s)"
            )
            for sample_n, k in [(512, 24), (1024, 24), (1024, 32),
                                (1024, 48)]:
                t0 = time.time()
                rr = trained_recall(embs, truth, sample_n, k)
                dt = time.time() - t0
                print(
                    f"{sf_dir} {label}: sampled n={sample_n} K={k}"
                    f" recall@5={rr:.2f} ({dt:.1f}s)"
                )

    # --- training wall vs corpus size (replicated ids) ---
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n0 = base.count()
    for r in (1, 4, 16):
        embs = replicated(base, r, n0).localCheckpoint(eager=True)
        t0 = time.time()
        c = S.train_coarse_centroids(embs)
        b = S.train_residual_books(embs, c)
        b.count()
        t_full = time.time() - t0
        t0 = time.time()
        c = S.train_coarse_centroids(embs, sample_n=1024, k_seeds=24)
        b = S.train_residual_books(embs, c, sample_n=1024, k_seeds=24)
        b.count()
        t_samp = time.time() - t0
        print(
            f"train wall n={n0 * r}: full={t_full:.1f}s"
            f" sampled(1024,24)={t_samp:.1f}s"
        )


if __name__ == "__main__":
    main()
