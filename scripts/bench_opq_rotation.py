"""OPQ-style rotation-before-PQ A/B (round 10, VERDICT ask #6).

OPQ (Ge et al. CVPR'13) rotates the space before product quantization
so per-subspace variance is balanced and the PQ codebooks stop
wasting capacity on unevenly-loaded subspaces. This script measures
whether that lifts recall ON THIS GEOMETRY before anything ships
(the X113 discipline: a registry entry only if the A/B supports it):

- baseline: unrotated PQ ADC top-k (X66) and trained residual IVFADC
  (X113, shipped sampled config) on the clustered fixture;
- PERM: variance-balancing dimension PERMUTATION only (the OPQ-P
  allocation half — snake-assign dimensions to the m=4 subspaces by
  descending variance; exactly expressible in Spark/SQL if it wins);
- PCA: full PCA rotation (OPQ-P's parametric form). The rotation is
  computed DRIVER-SIDE with numpy for this offline experiment (the
  fixture is ≤2000×64); a shipped form would need the X123 power
  iteration deflated to d components — only worth building if this
  measurement says the rotation wins.

Rotation is applied to the whole corpus (queries are corpus
vectors), so exact truth is rotation-invariant up to the 1e4
quantization; truth is recomputed per variant anyway.

Usage: python scripts/bench_opq_rotation.py [sf_dir ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.operators import (  # noqa: E402
    similarity as S,
)

M = 4
REFINE = 50


def recall(approx, truth_set, nq=10, k=5):
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    return len(got & truth_set) / (nq * k)


def variants(X):
    """(name, transformed ndarray) variants to measure."""
    d = X.shape[1]
    # variance-balancing permutation: snake-assign dims by variance
    v = X.var(axis=0)
    order = np.argsort(-v)
    groups = [[] for _ in range(M)]
    for i, dim in enumerate(order):
        g = i % (2 * M)
        groups[g if g < M else 2 * M - 1 - g].append(dim)
    perm = [dim for g in groups for dim in g]
    # full PCA rotation (descending eigenvalue), then the same snake
    # allocation over the rotated axes' eigenvalues
    C = np.cov(X, rowvar=False)
    w, V = np.linalg.eigh(C)
    idx = np.argsort(-w)
    R = V[:, idx]
    Xp = X @ R
    vp = w[idx]
    groups = [[] for _ in range(M)]
    for i in range(d):
        g = i % (2 * M)
        groups[g if g < M else 2 * M - 1 - g].append(i)
    pca_perm = [dim for g in groups for dim in g]
    return [
        ("unrotated", X),
        ("perm", X[:, perm]),
        ("pca", Xp[:, pca_perm]),
    ]


def measure(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clustered = S.clustered_embeddings(base)
    rows = clustered.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    for name, Xv in variants(X):
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, Xv)],
            ["vec_id", "embedding"],
        ).localCheckpoint(eager=True)
        truth = {
            (r.query_id, r.neighbor_id)
            for r in S.topk_brute(df, n_queries=10, k=5).collect()
        }
        r_pq = recall(S.topk_pq(df, n_queries=10, k=5), truth)
        coarse = S.train_coarse_centroids(
            df, sample_n=S.TRAIN_SAMPLE_N, k_seeds=S.TRAIN_K
        )
        books = S.train_residual_books(
            df, coarse, sample_n=S.TRAIN_SAMPLE_N, k_seeds=S.TRAIN_K
        )
        r_ivfpqt = recall(
            S.topk_ivfpq_trained(
                df, n_queries=10, k=5, refine=REFINE,
                coarse_cents=coarse, books=books,
            ),
            truth,
        )
        print(
            f"{sf_dir} clustered {name}: pq={r_pq:.2f}"
            f" ivfpq_trained={r_ivfpqt:.2f}"
        )


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01", "/root/testdata/sf0.1"
    ]
    spark = get_spark(app_name="opq_rotation_ab")
    spark.range(1).count()
    for sf_dir in sf_dirs:
        measure(spark, sf_dir)


if __name__ == "__main__":
    main()
