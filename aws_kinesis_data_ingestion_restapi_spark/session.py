"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads in
one JVM), but every config here is chosen to also make sense on a
1000-executor cluster: AQE on (runtime coalescing + skew-join
handling), shuffle partitions sized to the parallelism, UTC session
timezone (so results compare bit-exact against the DuckDB oracle,
which is UTC-naive), and Arrow enabled for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "aws-kinesis-data-ingestion-restapi-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``shuffle_partitions`` defaults to the local core count; on a real
    cluster you would set it (or rely on AQE coalescing, which is
    enabled) to ~2-3× total executor cores.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic join-strategy switching. Essential at 100 TB where
        # static planning misguesses sizes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalesces shuffle partitions by BYTES; compute-heavy
        # operators over byte-small data (shingle arrays, candidate
        # pairs) get crushed onto 1-2 tasks by the 1 MB default floor.
        # A 64 KB floor keeps those stages parallel (measured 3× on
        # the n-gram similarity join); at production sizes partitions
        # are far above either floor, so this only affects the tails.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_FLOOR", "64k"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # FAIR scheduling between pools: a single job (every batch
        # query — there is only ever one pool active) schedules exactly
        # as FIFO did, but CONCURRENT streaming drains that opt into
        # per-query pools (streaming/registry_stream._intake_verdicts)
        # time-slice the executor slots instead of queueing whole
        # stages behind each other — the difference between sum() and
        # max() wall for the multiplexed intake gates.
        .config("spark.scheduler.mode", "FAIR")
        # Deterministic oracle comparison: DuckDB timestamps are
        # UTC-naive; pin Spark to UTC so date/timestamp values match.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas_udf / mapInPandas / toPandas paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Snappy parquet like the reference (terraform/variables.tf:56-60).
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Local mode: don't let tiny test tables trigger giant broadcasts
        # of the wrong side; 64 MB is a sane cluster-ish default too.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode = one JVM for driver+executors: give it real heap
        # (the box has 128 GiB; undersized heap shows up as GC stalls
        # on the string/array-heavy nested-event operators).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
        # The driver testdata's events.ts is parquet TIMESTAMP(NANOS),
        # which Spark's vectorized reader rejects; read as long (ns
        # since epoch) and convert with functions.nanos_ts().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Backstop for the reliable-checkpoint knob (operators/ckpt):
        # let the ContextCleaner delete checkpoint files of GC'd RDDs.
        # Eager deletion of superseded rounds is ckpt.release's job;
        # this catches whatever release couldn't attribute.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


#: Confs that correctness depends on AND that Spark allows changing on a
#: live session. The driver's correctness harness builds its OWN
#: SparkSession (without the builder confs above), so every query entry
#: point re-asserts these at runtime via :func:`ensure_runtime_confs`
#: (round-1 lesson: 4 events_* queries failed with PARQUET_TYPE_ILLEGAL
#: because nanosAsLong was builder-only).
RUNTIME_CONFS = {
    # Older events.parquet generations carried TIMESTAMP(NANOS); this
    # conf made them arrive as epoch-nanos longs. Newer Spark builds
    # ignore it (and newer testdata is TIMESTAMP(MICROS) anyway) — the
    # query path branches on the actual schema via
    # functions.exact.as_timestamp/as_epoch_nanos, so either
    # representation works. Kept for older-build compatibility.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB oracle timestamps are UTC-naive; pin Spark to UTC.
    "spark.sql.session.timeZone": "UTC",
    # Arrow batching for the mapInPandas operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Keep compute-heavy, byte-small shuffle stages parallel (see the
    # builder comment in get_spark); runtime-settable, so harness
    # sessions get it too. SPARK_GRAFT_AQE_FLOOR overrides for A/B
    # benchmark attribution (e.g. "1m" = Spark's default).
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
        "SPARK_GRAFT_AQE_FLOOR", "64k"
    ),
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Idempotently apply :data:`RUNTIME_CONFS` to an existing session."""
    for key, value in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:  # pragma: no cover - non-settable conf on some builds
            pass
    return spark


def spread_scan(df):
    """Re-spread a scan whose parallelism collapsed to a handful of
    tasks (the driver testdata writes each table as ONE parquet row
    group — the atomic split unit — so every scan becomes effectively
    single-task and serializes all downstream map work).

    No-op whenever the scan already parallelizes (any real multi-file
    / multi-row-group layout, i.e. production), so plans at scale are
    untouched; on degenerate inputs one round-robin exchange buys full
    map-side parallelism for the CPU-heavy operators (decimal
    aggregation, JSON/base64 codec, shingling). Catalyst still pushes
    filters and column pruning THROUGH the repartition, so the
    exchange carries only the columns and rows the query needs.

    ``SPARK_GRAFT_NO_SPREAD=1`` disables the exchange — an A/B switch
    for attributing its cost in benchmarks, not a production mode.
    """
    if os.environ.get("SPARK_GRAFT_NO_SPREAD") == "1":
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 4):
        return df.repartition(target)
    return df
