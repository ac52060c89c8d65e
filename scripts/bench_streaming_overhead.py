"""Streaming drain cost attribution (round-6 VERDICT ask #7).

The ~9 streaming registry entries cost ~35 s of the sf0.1 bench. This
script splits each entry's wall time into FIXED drain overhead vs
actual work, with one instrumented run:

- ``floor``: a minimal drain — a 2-row NDJSON file streamed through
  the same availableNow + memory-sink + fresh-checkpoint harness with
  a trivial projection. Everything it costs (stream query planning,
  state-store init, checkpoint commit protocol, micro-batch setup ×2
  batches) is overhead every entry pays regardless of data volume.
- per-entry ``total`` at the bench SF, and ``work = total − floor``:
  the part that actually scales with data.

Interpretation at 100 TB: the floor is per-QUERY-START, not per-byte —
amortized to nothing on a long-running stream; these gate entries pay
it once per run because each builds, drains, and discards a fresh
stream. A large ``work`` share indicates real data-path cost worth
optimizing; a floor-dominated entry is already at harness minimum.

Run:  python scripts/bench_streaming_overhead.py [sf_dir]
Prints one JSON line; numbers recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_kinesis_data_ingestion_restapi_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

ENTRIES = [
    "streaming_dedup_replay",
    "streaming_running_totals_final",
    "streaming_enriched_nation_totals",
    "streaming_payment_match",
    "streaming_payment_match_outer",
    "streaming_late_data_policy",
    "streaming_session_windows",
    "streaming_value_quantiles",
    "events_tumbling_30s",  # batch form — included as the non-drain control
]


def _floor_drain(spark) -> float:
    """Time the minimal two-batch drain through the same harness."""
    from aws_kinesis_data_ingestion_restapi_spark.streaming import (
        registry_stream as rs,
    )

    d = tempfile.mkdtemp(prefix="floor_drain_")
    try:
        indir = os.path.join(d, "in")
        os.makedirs(indir)
        for i in range(2):
            with open(os.path.join(indir, f"b{i}.json"), "w") as f:
                f.write('{"k": "a", "v": 1}\n{"k": "b", "v": 2}\n')
        t0 = time.time()
        stream = (
            spark.readStream.schema("k string, v long")
            .option("maxFilesPerTrigger", 1)
            .json(indir)
        )
        out = rs._drain(stream.select("k", "v"), "append", "floor")
        out.count()
        return round(time.time() - t0, 2)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    import __spark_entry__ as entry

    spark = get_spark(app_name="bench-streaming-overhead")
    qs = entry.queries()

    # floor measured twice: first includes one-time streaming-engine
    # class loading, second is the steady-state per-drain overhead
    floor_cold = _floor_drain(spark)
    floor = _floor_drain(spark)

    rows = {}
    for name in ENTRIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        total = round(time.time() - t0, 2)
        rows[name] = {
            "total": total,
            "work": round(max(0.0, total - floor), 2),
            "overhead_pct": round(100 * min(floor, total) / total)
            if total > 0
            else 0,
        }

    print(json.dumps({
        "metric": "streaming_drain_attribution",
        "unit": "sec",
        "sf_dir": SF_DIR,
        "floor_cold": floor_cold,
        "floor": floor,
        "entries": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
