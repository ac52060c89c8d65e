"""Isolated per-query probe for the optimization rounds (guide §1):
one warm session, noop-sink timing (§1.4), labeled jobs (§1.5), and
optional .explain("formatted") capture for plan pinning.

Usage:
  python scripts/opt_probe.py [--sf DIR] [--reps N] [--plan OUTDIR] q1 q2 ...

Timings print per rep (first rep carries any session-cache build, the
same way bench.py's first family entry does); plans are written as
<OUTDIR>/<query>.txt. Session caches make entry cost depend on what ran
before — probe families in bench order when that matters.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.registry import QUERY_FNS  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--plan", default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="opt_probe")
    spark.range(1).count()
    for name in args.queries:
        fn = QUERY_FNS[name]
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.plan, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        for rep in range(args.reps):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"probe:{name}#{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"PROBE {name} rep{rep} {dt:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
