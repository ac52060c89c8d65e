"""X119 scale measurement: bigram-LM scoring on replicated corpora.

Claim under test: the trained model's size is VOCABULARY-bound (distinct
bigrams), not corpus-size-bound — so while the scoring join's stream
side grows linearly with the corpus, the model side plateaus and AQE
keeps choosing a broadcast model join; per-row scoring cost is flat.

Replicates the sf0.01 documents table x{1, 8, 64} (doc_id offsets keep
ids distinct; text unchanged, so the vocabulary — and therefore the
model — is identical by construction) and measures wall time and model
rows at each scale. Results recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.operators import text  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="bench-lm-scaling")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n0 = docs.count()
    for mult in (1, 8, 64):
        reps = spark.range(mult).select(F.col("id").alias("_r"))
        corpus = (
            docs.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("_r") * 10_000_000).alias("doc_id"),
                "text",
            )
        )
        # model rows = distinct bigrams (vocabulary-bound)
        toks = corpus.select(
            "doc_id", text.tokens_col("text").alias("tk")
        ).filter(F.size("tk") >= 2)
        bg = toks.select(
            F.explode(
                F.expr(
                    "transform(slice(tk, 1, size(tk) - 1),"
                    " (x, i) -> struct(x AS w1, tk[i + 1] AS w2))"
                )
            ).alias("b")
        ).select("b.w1", "b.w2")
        model_rows = bg.distinct().count()
        t0 = time.perf_counter()
        out = text.lm_bigram_score(corpus)
        n = out.count()
        wall = time.perf_counter() - t0
        print(
            f"x{mult:>2}: corpus={n0 * mult:>7} docs, scored={n:>7}, "
            f"model_rows={model_rows}, wall={wall:.2f}s, "
            f"per_1k_docs={1000 * wall / (n0 * mult):.3f}s"
        )


if __name__ == "__main__":
    main()
