"""r10 VERDICT ask #7 measurement: wall time of the three bounded-round
watch-list entries (text_unigram_vocab, graph_kcore_purchases,
graph_communities_lpa) before/after the shared round-driver batching.
One warm session, N reps each, solo; prints per-query medians.

Usage: python scripts/bench_round_driver.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.registry import QUERY_FNS  # noqa: E402

QUERIES = [
    "text_unigram_vocab",
    "graph_kcore_purchases",
    "graph_communities_lpa",
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    # one throwaway scan to absorb session/scan warmup
    QUERY_FNS["graph_triangles_cosupply"](spark, sf).count()
    total = 0.0
    for q in QUERIES:
        ts = []
        for _ in range(reps):
            t0 = time.time()
            QUERY_FNS[q](spark, sf).count()
            ts.append(time.time() - t0)
        # text_unigram_vocab rides the _unigram_pair session cache, so
        # only the FIRST run pays the EM loop — report first-run for
        # it, median for the uncached graph loops
        rep = ts[0] if q == "text_unigram_vocab" else statistics.median(ts)
        total += rep
        print(f"{q}: reported {rep:.2f}s (all: "
              + ", ".join(f"{t:.2f}" for t in ts) + ")")
    print(f"TOTAL (reported): {total:.2f}s")


if __name__ == "__main__":
    main()
