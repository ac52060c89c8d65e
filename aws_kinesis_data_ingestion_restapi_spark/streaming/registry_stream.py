"""Driver-contract adapters for the stateful streaming operators.

``queries()`` callables must return a batch DataFrame from
``(spark, sf_dir)``; these adapters drive the real streaming operators
(``streaming/stateful.py``) through an actual Structured Streaming
query — file source, micro-batches, checkpoint, state store — and
return the drained result. The cross-batch MECHANISM (state store,
timeouts) is not SQL-expressible, but the two drained RESULTS here are
plain SQL over ``orders`` — see the ``streaming_*`` entries in
registry.ORACLE_SQL, which upgrade both from rows-only to full
value-hash checks.

Each adapter replays its input (two identical NDJSON batch files,
``maxFilesPerTrigger=1``), so the result VALUES prove the stateful
semantics, not just the plumbing:

- ``streaming_dedup_replay``: emits each (customer_id, order_id)
  exactly once although every record arrives twice → row count ==
  distinct keys, and a second emission of any key would double it.
- ``streaming_running_totals_final``: per-customer totals after both
  deliveries → every count is exactly 2× the per-customer order count.

The memory-sink collect is harness-side (bounded by the sf of the
gate); the operators themselves never touch the driver.
"""

from __future__ import annotations

import atexit
import glob
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark import analytics
from aws_kinesis_data_ingestion_restapi_spark.functions.exact import (
    as_timestamp,
    dsum,
)
from aws_kinesis_data_ingestion_restapi_spark.streaming.enrichment import (
    enrich_stream,
)
from aws_kinesis_data_ingestion_restapi_spark.streaming.stateful import (
    streaming_dedup_builtin,
    streaming_running_totals,
)

_seq = itertools.count()

#: Measurement hook: when a probe sets this to a list, _drain appends
#: (qname, recentProgress dicts) after each drain terminates — the
#: commitTimeMs / stateOnCurrentVersionSizeBytes decomposition the
#: optimization rounds use for attribution. Never set in query paths.
_PROGRESS_SINK: list | None = None

#: (applicationId, sf_dir) -> (orders_dir, payments_dir): the dual
#: payment-join NDJSON feed, generated once and shared by the inner
#: and leftOuter gates (checkpoints stay per-drain; see
#: _payment_match_streams).
_PAYMENT_FEED_CACHE: dict = {}


def _scratch_dir(prefix: str) -> str:
    """mkdtemp for EPHEMERAL streaming-gate scratch (fixture dumps,
    availableNow checkpoints — all removed on exit paths already).

    r12 optimization (guide §5/§6): the drained state stores commit
    one delta file per state partition per micro-batch; on a
    disk-backed /tmp those commits contend with whatever else is on
    the box (measured A/B on the two-stateful-op topk drain: mean
    13.6 s on /tmp vs 7.5 s on tmpfs under background IO load, equal
    within noise on an idle box). Throwaway checkpoints belong on the
    fastest ephemeral medium available — the exact local-SSD/ramdisk
    scratch choice a production job makes for availableNow audit
    drains whose checkpoints never need to survive the process.
    ``SPARK_GRAFT_STREAM_SCRATCH`` overrides (set it to a durable
    path to restore the old behavior or to bound memory use)."""
    root = os.environ.get("SPARK_GRAFT_STREAM_SCRATCH")
    if not root:
        # r13 (ADVICE r12): tmpfs is RAM-backed with no capacity guard —
        # a large fixture dump on a memory-constrained host could
        # exhaust shared memory mid-drain. Use /dev/shm only while it
        # has comfortable headroom (4 GiB ≫ any gate/bench fixture;
        # sf0.1's largest dual feed is ~50 MB); otherwise fall back to
        # the default disk-backed tmp dir.
        if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
            try:
                st = os.statvfs("/dev/shm")
                if st.f_bavail * st.f_frsize >= 4 << 30:
                    root = "/dev/shm"
            except OSError:
                pass
    return tempfile.mkdtemp(prefix=prefix, dir=root)


#: Target FEED bytes per streaming state partition (overridable for
#: A/B attribution). The state-partition count of a stateful streaming
#: query is frozen into its checkpoint at start() from
#: spark.sql.shuffle.partitions; every HDFS-backed state store instance
#: then commits one delta file per micro-batch PLUS pays provider
#: init/maintenance — a per-partition FLOOR that is pure overhead when
#: the state is tiny. Sizing the count to the DATA (feed bytes /
#: target, capped by the session default) instead of the core count is
#: the r12 VERDICT ask #2 fix: at sf0.1 the payment trio carried
#: 32 partitions × 4 join state stores × ~3 commits each for a ~20 MB
#: feed (measured commitTimeMs sums in OPTIMIZATION_r13.md), and the
#: driver's own 8-core run (8 state partitions) beat the 32-core run
#: 3-5 s vs 12-17 s per drain. At production volumes the byte-derived
#: count hits the session-default cap and the setting is a no-op —
#: scale-adaptive, not a local[32] constant (brief rule: no
#: core-count-tuned config wins).
_STATE_PART_TARGET = int(
    os.environ.get("SPARK_GRAFT_STATE_PART_BYTES", str(4 * 1024 * 1024))
)


def _state_partitions(spark: SparkSession, feed_dirs) -> int:
    """Data-derived state-partition count for a fresh-checkpoint drain:
    ceil(feed bytes / _STATE_PART_TARGET), at least 1, never more than
    the session's configured shuffle partitions (the production
    value)."""
    total = 0
    for p in feed_dirs:
        for root, _dirs, files in os.walk(p):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(cap, -(-total // _STATE_PART_TARGET)))


def _dump_single_ndjson(
    df: DataFrame,
    workdir: str,
    stage_name: str,
    target: str,
    mtime: int | None = None,
) -> None:
    """Write ``df`` as ONE NDJSON file at ``target``: distributed
    ``write.json`` then a driver-side part concat (no collect — the
    driver only streams bytes). The single shared definition of the
    delivery-assembly rule (sorted part order, byte concat) every
    streaming fixture uses. ``mtime`` pins the file's modification
    time — the file source orders batches by mtime, not name."""
    staged = os.path.join(workdir, stage_name)
    df.write.mode("overwrite").json(staged)
    with open(target, "wb") as out:
        for part in sorted(glob.glob(os.path.join(staged, "part-*"))):
            with open(part, "rb") as f:
                shutil.copyfileobj(f, out)
    if mtime is not None:
        os.utime(target, (mtime, mtime))


def _replayed_stream(
    spark: SparkSession, df: DataFrame, schema: str, replays: int, prefix: str
):
    """The shared stream fixture: write ``df`` as NDJSON once
    (distributed ``write.json``, no driver collect — the driver merely
    concatenates part files), copy the delivery into ``replays``
    identical batch files, and open a micro-batched file stream (one
    file per trigger ⇒ every file after the first is a full
    at-least-once redelivery). Returns (stream, tmpdir); the caller
    passes tmpdir to ``_drain(cleanup_dir=...)`` so it is removed on
    every exit path, including a failed drain."""
    d = _scratch_dir(prefix)
    stream_dir = os.path.join(d, "in")
    os.makedirs(stream_dir)
    src = os.path.join(d, "delivery.json")
    _dump_single_ndjson(df, d, "staged", src)
    for i in range(replays):
        shutil.copyfile(src, os.path.join(stream_dir, f"b{i}.json"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(stream_dir)
    )
    return stream, d


def _order_stream(spark: SparkSession, sf_dir: str, replays: int = 2):
    """The replayed order stream: five columns straight off ``orders``
    with the SAME expressions build_order_events uses for them (its
    nested product-array construction — the expensive collect_list
    shuffle — contributes nothing to these columns, so the fixture
    skips it)."""
    orders = analytics._t(spark, sf_dir, "orders")
    events = orders.select(
        F.col("o_custkey").cast("string").alias("customer_id"),
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.concat(
            F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")
        ).alias("order_date"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("amount"),
    )
    schema = (
        "customer_id string, order_id string, order_date string, "
        "status string, amount double"
    )
    return _replayed_stream(spark, events, schema, replays, "stream_gate_")


def _drain(
    decorated: DataFrame,
    mode: str,
    name: str,
    cleanup_dir: str | list[str] | None = None,
    state_feed_dirs: list[str] | None = None,
) -> DataFrame:
    """Run an availableNow drain into a memory sink and return the
    drained table. ``cleanup_dir`` (the adapter's NDJSON dump — one
    path or, for multiplexed multi-source drains, a list) and the
    checkpoint are removed on EVERY exit path — a failed or timed-out
    drain must not leak multi-copy table dumps across gate retries.

    ``state_feed_dirs``: STATEFUL drains pass their feed dirs here and
    the query starts with a data-derived state-partition count
    (:func:`_state_partitions`) instead of the session default — set
    around ``start()`` only: StreamExecution clones the session at
    start, so the restored conf never leaks into the caller's batch
    plans or a concurrently starting query (drains here are started
    sequentially on the driver thread)."""
    qname = f"{name}_{next(_seq)}"
    ckpt = _scratch_dir(f"ckpt_{qname}_")
    spark = decorated.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if state_feed_dirs is not None:
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(_state_partitions(spark, state_feed_dirs)),
            )
        try:
            q = (
                decorated.writeStream.outputMode(mode)
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        # awaitTermination(timeout) returns False on TIMEOUT with the
        # query still running — returning the memory table then would
        # silently hand back a truncated result. Stop the query and
        # raise instead; a gate row must fail loudly, never truncate.
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError(
                f"streaming drain {qname} did not finish within 600s; "
                "refusing to return a partially-filled memory table"
            )
        if _PROGRESS_SINK is not None:
            _PROGRESS_SINK.append((qname, list(q.recentProgress)))
    finally:
        # The memory sink holds the drained rows; the checkpoint is
        # dead weight once the availableNow query terminates.
        shutil.rmtree(ckpt, ignore_errors=True)
        if cleanup_dir is not None:
            dirs = (
                cleanup_dir if isinstance(cleanup_dir, list) else [cleanup_dir]
            )
            for cd in dirs:
                shutil.rmtree(cd, ignore_errors=True)
    return decorated.sparkSession.table(qname)


def streaming_enriched_nation_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the replayed order stream broadcast-
    joined per micro-batch against the static customer⋈nation dim, then
    a streaming per-nation aggregate (complete mode — the memory sink
    holds exactly the final state). After two full deliveries every
    total is exactly 2× the batch aggregate; the amount sum rides the
    decimal-exact contract (functions.exact.dsum), so the result
    value-hashes against the SQL oracle."""
    stream, d = _order_stream(spark, sf_dir, replays=2)
    customer = analytics._t(spark, sf_dir, "customer")
    nation = analytics._t(spark, sf_dir, "nation")
    dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(
        F.col("c_custkey").cast("string").alias("customer_id"),
        F.col("n_name").alias("nation"),
    )
    totals = (
        enrich_stream(stream, dim, on="customer_id")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("amount", alias="total_amount"),
        )
    )
    out = _drain(totals, "complete", "senrich", cleanup_dir=d,
                 state_feed_dirs=[d])
    return out.orderBy("nation")


def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch streaming dedup under replay: every order delivered
    twice (two micro-batches), emitted once. Row count == distinct
    (customer_id, order_id) pairs in sf_dir's orders.

    Uses the engine-native keyed-state form
    (``streaming_dedup_builtin`` — JVM state store, measured ~10×
    faster than the applyInPandasWithState form, which stays
    unit-tested for the custom-state cases)."""
    stream, d = _order_stream(spark, sf_dir, replays=2)
    deduped = streaming_dedup_builtin(stream)
    out = _drain(deduped, "append", "sdedup", cleanup_dir=d,
                 state_feed_dirs=[d])
    return out


def streaming_running_totals_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running totals after two full deliveries of the
    order stream. The memory sink keeps every update emission; totals
    are monotone, so max() per customer is the final state — each
    n_orders is exactly 2× the customer's order count."""
    stream, d = _order_stream(spark, sf_dir, replays=2)
    # streaming_running_totals reads purchaise_details.amount; rebuild
    # the nested shape from the flat stream columns
    nested = stream.select(
        "customer_id",
        F.struct(F.col("amount")).alias("purchaise_details"),
    )
    totals = streaming_running_totals(nested)
    drained = _drain(totals, "update", "stotals", cleanup_dir=d,
                     state_feed_dirs=[d])
    return (
        drained.groupBy("customer_id")
        .agg(
            F.max("n_orders").alias("n_orders"),
            F.max("total_amount").alias("total_amount"),
        )
        .orderBy("customer_id")
    )


def _payment_match_streams(spark: SparkSession, sf_dir: str, prefix: str):
    """Shared plumbing of the two stream-stream interval-join gates
    (inner + leftOuter): the synthesized payment stream (per-order
    delay = o_orderkey mod 96 hours), the dual NDJSON dumps, the
    metadata-file sweep, and both watermarked readStreams. One
    definition so a fix to the interval, watermark, schemas, or sweep
    cannot silently apply to only one of the two gates. Returns
    (left, right); the shared feed dir outlives the drains and is
    removed at process exit."""
    # The dual NDJSON dump is identical for the inner and leftOuter
    # gates (only the join mode differs), so it is generated ONCE per
    # (session, sf_dir) and shared — the second drain skips the whole
    # orders-table write (r6 VERDICT ask #7). Sharing is safe because
    # checkpoints are NOT shared: every _drain call creates a fresh
    # checkpoint dir, and a fresh file-source checkpoint re-reads all
    # feed files from scratch. The shared dirs are swept at process
    # exit instead of per-drain (atexit below).
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _PAYMENT_FEED_CACHE:
        a_dir, b_dir = _PAYMENT_FEED_CACHE[key]
    else:
        orders = analytics._t(spark, sf_dir, "orders")
        base = orders.select(
            F.col("o_orderkey").cast("string").alias("order_id"),
            F.col("o_custkey").cast("string").alias("customer_id"),
            F.col("o_totalprice").alias("amount"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_ts"),
            F.date_format(
                F.col("o_orderdate")
                + F.make_interval(hours=(F.col("o_orderkey") % 96).cast("int")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("p_ts"),
            (F.col("o_orderkey") % 96).cast("long").alias("delay_hours"),
        )
        d = _scratch_dir(prefix)
        # register cleanup BEFORE the dumps: a failed write.json (disk
        # full, interrupt) must not leak the dir across gate retries —
        # the same every-exit-path rule _drain enforces for its own
        # checkpoints
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        a_dir, b_dir = os.path.join(d, "orders"), os.path.join(d, "payments")
        # r12 optimization: the orders scan is one parquet row group →
        # one task → ONE json part per side, so every drain parsed the
        # whole feed single-threaded. Spread the dump across the
        # default parallelism: N part files parse in parallel in the
        # drain; with no maxFilesPerTrigger the availableNow drain
        # still processes all files in ONE micro-batch, so the
        # join/watermark semantics (and the emitted rows) are
        # unchanged — only the parse parallelism moved.
        n_parts = spark.sparkContext.defaultParallelism
        base.repartition(n_parts).select(
            "order_id", "customer_id", "amount", "o_ts"
        ).write.mode("overwrite").json(a_dir)
        base.repartition(n_parts).select(
            "order_id", "p_ts", "delay_hours"
        ).write.mode("overwrite").json(b_dir)
        for sub in (a_dir, b_dir):
            for f in glob.glob(os.path.join(sub, "_*")):
                os.remove(f)
        _PAYMENT_FEED_CACHE[key] = (a_dir, b_dir)
    left = (
        spark.readStream.schema(
            "order_id string, customer_id string, amount double, o_ts string"
        )
        .json(a_dir)
        .withColumn("o_ts", F.to_timestamp("o_ts"))
        .withWatermark("o_ts", "1 hour")
    )
    right = (
        spark.readStream.schema(
            "order_id string, p_ts string, delay_hours long"
        )
        .json(b_dir)
        .withColumnRenamed("order_id", "p_order_id")
        .withColumn("p_ts", F.to_timestamp("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    return left, right


def _payment_match_drain(
    spark: SparkSession, sf_dir: str, how: str, prefix: str, qname: str
) -> DataFrame:
    left, right = _payment_match_streams(spark, sf_dir, prefix)
    joined = left.join(
        right,
        F.expr(
            "order_id = p_order_id AND "
            "p_ts >= o_ts AND p_ts <= o_ts + INTERVAL 72 HOURS"
        ),
        how,
    )
    feed = _PAYMENT_FEED_CACHE[(spark.sparkContext.applicationId, sf_dir)]
    return _drain(
        joined.select("order_id", "customer_id", "amount", "delay_hours"),
        "append",
        qname,
        state_feed_dirs=list(feed),
    )


def streaming_payment_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time interval join: an order stream joined
    against a payment stream on order_id where the payment lands
    within 72 h of the order. Payments are synthesized with a
    deterministic per-order delay of (o_orderkey mod 96) hours, so
    orders with delay > 72 h provably drop out of the inner join —
    the time-range predicate is exercised, not decorative.

    Both sides carry watermarks; with the range condition that bounds
    the join state (Spark evicts rows older than watermark − range),
    which is THE scale requirement for stream-stream joins — without
    it state grows with the stream. The drained result is plain SQL
    over orders (registry.ORACLE_SQL), so the gate hash-checks values.
    """
    return _payment_match_drain(
        spark, sf_dir, "inner", "stream_join_", "sjoin"
    )


def streaming_payment_match_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the unmatched-side
    NULL-emission semantics under dual watermarks, the part of
    stream-stream joins teams actually get wrong. Same synthesized
    payment stream as ``streaming_payment_match`` (per-order delay =
    o_orderkey mod 96 hours, 72 h join range), joined ``leftOuter``.

    The emission contract, PINNED by the oracle (verified
    deterministic across runs at 14994/15000 rows on sf0.01):
    - matched orders (delay ≤ 72 h) emit on arrival — all of them;
    - unmatched orders emit WITH NULL payment columns only once the
      global watermark (min of both stream watermarks = max(o_ts) −
      1 h here) proves no match can arrive: o_ts + 72 h < watermark;
    - unmatched orders inside the final watermark window are WITHHELD
      at stream end (state that never finalizes — the documented
      outer-join tail, analogous to X40's unfinalized window).

    State stays bounded exactly as in the inner form: the range
    condition lets Spark evict rows older than watermark − 72 h."""
    return _payment_match_drain(
        spark, sf_dir, "leftOuter", "stream_ojoin_", "sojoin"
    )


def streaming_late_data_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark finalization under out-of-order delivery, PROVEN: the
    event stream arrives as two micro-batches — recent events first
    (advancing the watermark to max(ts) − 1 h), then every event older
    than the 2024-01-05 cutoff, all of it far below the established
    watermark. The append-mode daily aggregate must emit EXACTLY the
    windows whose end the final watermark has passed — the unfinalized
    tail day is withheld — and that boundary is SQL-expressible, so
    the oracle checks the values.

    Observed engine semantics (pinned here): this Spark build
    aggregates sub-watermark arrivals into their (already-evictable)
    windows and emits them at the same commit rather than discarding
    the rows — no data loss on out-of-order delivery; the watermark
    governs WHEN windows finalize, which is what bounds window state.

    CAVEAT — non-contractual: Spark documents late-beyond-watermark
    handling as "may or may not be aggregated"; the oracle bakes in
    this build's observed behavior, so RE-VERIFY this query after any
    Spark upgrade (scripts/check_correctness.py runs it; if a future
    build drops sub-watermark rows, the oracle's late-day rows must
    move behind the same boundary the engine guarantees).

    Scale note: without the watermark a streaming agg retains every
    open window forever; this query is the proof that finalization
    happens at the documented boundary.
    """
    events = analytics._t(spark, sf_dir, "events")
    cutoff = "2024-01-05"
    base = events.select(
        "event_id",
        F.date_format(as_timestamp(events, "ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "value",
    )
    d = _scratch_dir("stream_late_")
    stream_dir = os.path.join(d, "in")
    os.makedirs(stream_dir)
    # the file source orders batches by MODIFICATION TIME, not name —
    # pin mtimes so the on-time delivery is provably batch 0 and the
    # late delivery provably arrives after the watermark advanced
    for i, (name, part) in enumerate(
        (
            ("b0_ontime", base.filter(F.col("ts") >= cutoff)),
            ("b1_late", base.filter(F.col("ts") < cutoff)),
        )
    ):
        _dump_single_ndjson(
            part, d, name, os.path.join(stream_dir, f"{name}.json"),
            mtime=1_700_000_000 + i * 600,
        )
    stream = (
        spark.readStream.schema("event_id long, ts string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(stream_dir)
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "1 hour")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=6, alias="total_value"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("day"), "n_events", "total_value"
        )
    )
    out = _drain(agg, "append", "slate", cleanup_dir=d,
                 state_feed_dirs=[d])
    return out


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGINE-NATIVE session windows in streaming mode: the event
    stream is aggregated with ``session_window(ts, 30 min)`` per user
    under a 1-hour watermark, append mode — the JVM keyed-state merge
    path (dynamic-gap window coalescing), complementing the batch
    ``events_sessionization`` (same operator, batch plan) and the
    applyInPandasWithState operators (custom state logic).

    Emission boundary: a session finalizes once the watermark passes
    its end (last event + gap). The drain delivers every event in one
    file batch; the final watermark is max(ts) − 1 h (the no-data
    flush batch emits everything finalized by it), so the oracle is
    gaps-and-islands sessionization filtered to session_end ≤ that
    boundary — the same observed ``end <= wm`` emission rule the
    tumbling-window query pins (streaming_late_data_policy docstring
    has the non-contractual caveat; it applies here identically).

    Scale note: session state is per-(user, open-session) and bounded
    by the watermark — the reason to sessionize IN the stream instead
    of re-scanning history each day at 100 TB.
    """
    events = analytics._t(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        F.date_format(as_timestamp(events, "ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "value",
    )
    raw, d = _replayed_stream(
        spark, base, "user_id long, ts string, value double", 1,
        "stream_sess_",
    )
    stream = raw.withColumn("ts", F.to_timestamp("ts")).withWatermark(
        "ts", "1 hour"
    )
    agg = (
        stream.groupBy("user_id", F.session_window("ts", "30 minutes").alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=6, alias="total_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    out = _drain(agg, "append", "ssess", cleanup_dir=d,
                 state_feed_dirs=[d])
    return out


def streaming_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUSLY-MAINTAINED quantile sketch: the events value
    stream aggregated into the log₂-binned histogram
    (operators/sketch.quantile_sketch_histogram applied to the STREAM
    — the identical code path batch uses), drained in complete mode
    after TWO full deliveries, then read with
    quantile_sketch_estimates.

    This makes the sketch's two scale claims literal:

    - streaming state = the histogram itself — ≤ a few hundred bin
      counters, bounded forever, no watermark needed (a complete-mode
      agg over an unbounded key space would be a leak; over a
      log-bounded bin space it is THE way to keep live percentiles of
      an infinite stream at 100 TB/day);
    - merge-by-adding-counts — each micro-batch's partial histogram
      folds into the state exactly like the batch unionByName merge
      the unit test pins.

    The replay doubles every count (n = 2N), and the output pins rank
    SCALE-INVARIANCE: est must be bit-identical to the single-delivery
    estimate (100·2c ≥ q·2n ⟺ 100·c ≥ q·n), surfaced as est_single +
    replay_invariant so the oracle value-checks the claim rather than
    trusting it."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import sketch

    events = analytics._t(spark, sf_dir, "events")
    base = events.select("event_id", "value")
    stream, d = _replayed_stream(
        spark, base, "event_id long, value double", 2, "stream_quant_"
    )
    hist_state = sketch.quantile_sketch_histogram(stream, "value")
    drained = _drain(hist_state, "complete", "squant", cleanup_dir=d,
                     state_feed_dirs=[d])
    q_pcts = [50, 90, 99]
    est2 = sketch.quantile_sketch_estimates(drained, q_pcts)
    est1 = sketch.quantile_sketch_estimates(
        sketch.quantile_sketch_histogram(base, "value"), q_pcts
    ).select("q_pct", F.col("est").alias("est_single"))
    return (
        est2.join(est1, "q_pct")
        .select(
            "q_pct",
            "n",
            "est",
            "est_single",
            (F.col("est") == F.col("est_single")).alias("replay_invariant"),
        )
        .orderBy("q_pct")
    )


def streaming_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING form of the sliding-window aggregate (r7 VERDICT ask
    #6 — X100 landed batch-only and its own docstring promised this):
    the event stream aggregated over 1 h windows advancing every
    15 min under a 1-hour watermark, append mode — each event feeds
    window/slide = 4 open windows, and the watermark is what BOUNDS
    that state (4 windows per slide step stay open per key-space;
    without it a sliding agg retains every window forever — the whole
    point of running sliding windows IN the stream at 100 TB).

    Emission boundary: append mode emits exactly the windows whose END
    the final watermark (max(ts) − 1 h) has passed — the ≤ 4 unfinished
    tail windows are withheld. SQL-expressible, so the oracle replays
    the identical k∈[0,4) window explode filtered to window_end ≤ wm
    (the same observed end ≤ wm rule streaming_late_data_policy pins,
    non-contractual caveat included by reference).

    n_users is deliberately absent vs the batch form: streaming
    aggregations do not support exact COUNT(DISTINCT) (state would be
    unbounded per window); the batch query keeps it, the stream keeps
    the bounded aggregates."""
    events = analytics._t(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        F.date_format(as_timestamp(events, "ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "value",
    )
    raw, d = _replayed_stream(
        spark, base, "event_id long, ts string, value double", 1,
        "stream_slide_",
    )
    stream = raw.withColumn("ts", F.to_timestamp("ts")).withWatermark(
        "ts", "1 hour"
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=6, alias="total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )
    out = _drain(agg, "append", "sslide", cleanup_dir=d,
                 state_feed_dirs=[d])
    return out.orderBy("window_start")


def streaming_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental dedup (r8 VERDICT ask #4 — the streaming
    form of X90): new DOCUMENTS arrive on a micro-batched stream and
    each batch probes the persisted corpus MinHash band index via
    STREAM-STATIC equi-joins on (band, band_key) — the X17 enrichment
    shape applied to the X90 index, and the deployment form of
    incremental dedup: the corpus is never re-shingled, never
    self-joined, and the stream side carries only the arriving batch.

    In-stream stages are all STATELESS (the point): signatures are
    pure projections (minhash_signatures), banding carries the sig
    through the explode (minhash_band_keys ``carry`` — avoiding the
    stream-stream self-join a sig re-join would be), the index probe
    and the signature verify are stream-static joins, and the τ ≥ 0.5
    filter prunes in-batch. The drained match rows are then reduced
    batch-side to the per-document verdict (best corpus match: est
    DESC, match_id — the X90 tie-break), exactly the
    streaming_running_totals_final drain-then-reduce pattern.

    Replay-idempotence is proven by the gate itself: the fixture
    delivers the delta TWICE (two identical micro-batches) while the
    oracle computes the single-copy corpus probe — duplicate
    emissions are collapsed by the post-drain DISTINCT, so the
    value-hash can only match if re-delivery changed nothing (the
    streaming_dedup_replay contract). Scope note: this form emits
    corpus verdicts only — in-delta (cross-batch stream-side) dedup
    is X16's keyed-state job; X90's batch form resolves both.

    Output: (doc_id, is_dup, match_doc_id, est_jaccard) for every
    sketchable delta document, match columns NULL when novel —
    pinned in pytest to agree with X90's dup_of_corpus verdicts."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import dedup
    from aws_kinesis_data_ingestion_restapi_spark.operators.registry_ext import (
        _DELTA_PCT,
        _docs,
        _minhash_sigs,
    )
    from pyspark.sql.window import Window

    is_delta = F.col("doc_id") % 10 >= _DELTA_PCT
    corpus_sigs = _minhash_sigs(spark, sf_dir).filter(~is_delta)
    corpus_bands = dedup.minhash_band_keys(corpus_sigs).select(
        F.col("doc_id").alias("match_id"), "band", "band_key"
    )
    corpus_sig_b = corpus_sigs.select(
        F.col("doc_id").alias("match_id"), F.col("sig").alias("sig_b")
    )
    delta_docs = _docs(spark, sf_dir).filter(is_delta).select("doc_id", "text")
    stream, d = _replayed_stream(
        spark, delta_docs, "doc_id bigint, text string", 2, "stream_sdelta_"
    )
    bands_stream = dedup.minhash_band_keys(
        dedup.minhash_signatures(stream), carry=("sig",)
    ).select(
        F.col("doc_id").alias("delta_id"),
        F.col("sig").alias("sig_a"),
        "band",
        "band_key",
    )
    matches = (
        bands_stream.join(corpus_bands, ["band", "band_key"])
        .join(corpus_sig_b, "match_id")
        .select(
            "delta_id",
            "match_id",
            dedup._est_jaccard_col(32).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= 0.5)
    )
    drained = _drain(matches, "append", "sddelta", cleanup_dir=d)
    w = Window.partitionBy("delta_id").orderBy(
        F.desc("est_jaccard"), "match_id"
    )
    best = (
        drained.distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    universe = _minhash_sigs(spark, sf_dir).filter(is_delta).select("doc_id")
    return (
        universe.join(best, universe.doc_id == best.delta_id, "left")
        .select(
            "doc_id",
            F.col("match_id").isNotNull().alias("is_dup"),
            F.col("match_id").alias("match_doc_id"),
            "est_jaccard",
        )
        .orderBy("doc_id")
    )


def streaming_payment_match_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the X34/X83
    join-mode family (inner, leftOuter, now fullOuter): BOTH unmatched
    sides emit NULL-padded rows once the watermark proves no partner
    can arrive. Same synthesized payment stream (per-order delay =
    o_orderkey mod 96 h, 72 h range), same shared feed cache.

    Emission contract, MEASURED then pinned by the oracle (sf0.01:
    11412 matched + 3582 left-only + 3582 right-only — both
    hypotheses landed exactly):
    - matched orders (delay ≤ 72 h) emit on arrival;
    - unmatched ORDERS emit with NULL payment columns once
      o_ts + 72 h < final watermark (identical to the leftOuter rule);
    - unmatched PAYMENTS emit with NULL order columns once
      p_ts < final watermark — a payment's candidate orders satisfy
      o_ts ≤ p_ts, so the watermark passing p_ts is what proves no
      match remains;
    - both tails inside the final watermark window are withheld
      (the documented outer-join tail).

    The output key is COALESCE(order_id, p_order_id): NULL-padded
    sides still identify their entity. State bounded by the range
    condition exactly as in the other two modes."""
    left, right = _payment_match_streams(spark, sf_dir, "stream_fjoin_")
    joined = left.join(
        right,
        F.expr(
            "order_id = p_order_id AND "
            "p_ts >= o_ts AND p_ts <= o_ts + INTERVAL 72 HOURS"
        ),
        "fullOuter",
    )
    feed = _PAYMENT_FEED_CACHE[(spark.sparkContext.applicationId, sf_dir)]
    return _drain(
        joined.select(
            F.coalesce("order_id", "p_order_id").alias("order_key"),
            "customer_id",
            "amount",
            "delay_hours",
        ),
        "append",
        "sfjoin",
        state_feed_dirs=list(feed),
    )


def streaming_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X127: STREAMING form of X70's TVD drift gate — the deployment
    shape of distribution monitoring: a continuously-trained pipeline
    does not diff two static periods after the fact, it watches the
    LIVE stream and scores every CLOSED window against the trusted
    reference distribution before admitting that window's data.

    Stream side (the stateful part): per-(6 h tumbling window,
    event_type) counts under a 1-hour watermark in append mode — the
    watermark BOUNDS the open-window state and fixes the emission set
    (windows whose end ≤ final watermark, the pinned rule
    streaming_late_data_policy documents). The drift arithmetic runs
    on the DRAINED panel (closed windows × ≤5 types — metadata-scale)
    against the STATIC corpus baseline using X70's log-free decimal
    cross-product TVD: per type |n_w·T − b_t·N_w| in DECIMAL(19,0),
    ONE final division per window; types ABSENT from a window
    contribute b_t/(2T) via the baseline grid (a panel crossJoin of
    broadcast metadata frames, never corpus-sized).

    SQL-expressible end to end: the oracle replays the tumbling
    window explode, the wm emission filter, and the identical TVD
    arithmetic."""
    events = analytics._t(spark, sf_dir, "events")
    base_cols = events.select(
        "event_id",
        F.date_format(as_timestamp(events, "ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "event_type",
    )
    raw, d = _replayed_stream(
        spark,
        base_cols,
        "event_id long, ts string, event_type string",
        1,
        "stream_drift_",
    )
    stream = raw.withColumn("ts", F.to_timestamp("ts")).withWatermark(
        "ts", "1 hour"
    )
    agg = (
        stream.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
    panel = _drain(agg, "append", "sdrift", cleanup_dir=d,
                   state_feed_dirs=[d])
    baseline = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("b")
    )
    btot = baseline.agg(F.sum("b").cast("long").alias("t"))
    tot = panel.groupBy("window_start", "window_end").agg(
        F.sum("n").cast("long").alias("nw")
    )
    # self-join of the drained panel (tot derives from it): rename the
    # probe side's keys so the analyzer never sees conflicting refs
    probe = panel.select(
        F.col("window_start").alias("_ws"),
        F.col("event_type").alias("_et"),
        "n",
    )
    grid = (
        tot.crossJoin(F.broadcast(baseline))
        .join(
            probe,
            (F.col("window_start") == F.col("_ws"))
            & (F.col("event_type") == F.col("_et")),
            "left",
        )
        .crossJoin(F.broadcast(btot))
        .select(
            "window_start",
            "window_end",
            "nw",
            "t",
            F.abs(
                F.coalesce(F.col("n"), F.lit(0)).cast("decimal(19,0)")
                * F.col("t")
                - F.col("b").cast("decimal(19,0)") * F.col("nw")
            ).alias("_diff"),
        )
    )
    return (
        grid.groupBy("window_start", "window_end", "nw", "t")
        .agg(F.sum("_diff").alias("_sd"))
        .select(
            "window_start",
            "window_end",
            F.col("nw").alias("n_events"),
            (
                F.col("_sd").cast("double")
                / (
                    F.lit(2.0)
                    * F.col("nw").cast("double")
                    * F.col("t").cast("double")
                )
            ).alias("tvd"),
        )
        .orderBy("window_start")
    )


def streaming_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X137: streaming top-k heavy hitters — the live-dashboard form
    the monitoring family lacked (r9 VERDICT ask #4): per CLOSED
    tumbling window, the top-5 users by exact event count, under the
    pinned X40 emission rule (append mode emits exactly the windows
    whose end ≤ final watermark = max on-time ts − 1 h).

    Replay-invariance is DESIGNED IN and pinned by the value-hash:
    the fixture delivers the event dump TWICE (at-least-once
    redelivery), and the pipeline counts exactly once anyway —
    ``dropDuplicatesWithinWatermark`` on event_id ahead of the
    windowed aggregate (the first multi-stateful-operator pipeline in
    the surface: streaming dedup feeding a streaming agg in one
    query, Spark 3.5+ semantics). Duplicates inside the watermark
    horizon hit the dedup state; duplicates below it are dropped as
    late by the watermark itself — either way an emitted window's
    count equals the single-delivery count, which is exactly what
    the static oracle computes.

    The top-k ranking runs POST-drain on the drained counts panel
    (row_number per window, (count DESC, user_id) tie-break) — the
    panel is (closed windows × active users per window); the rank is
    a per-window-partition window function, never a global sort.

    Scale note: exact per-(window, user) counts shuffle on the
    (window, user) composite — the state is bounded by the watermark
    and the per-window active-user cardinality. For a key space too
    hot for exact counts, X69's Count-Min sketch is the documented
    degradation path; this query is the exact form a dashboard wants
    when the key cardinality is operational (users, hosts, tenants).
    """
    events = analytics._t(spark, sf_dir, "events")
    base_cols = events.select(
        "event_id",
        F.date_format(as_timestamp(events, "ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
    )
    raw, d = _replayed_stream(
        spark,
        base_cols,
        "event_id long, ts string, user_id long",
        2,
        "stream_topk_",
    )
    stream = raw.withColumn("ts", F.to_timestamp("ts")).withWatermark(
        "ts", "1 hour"
    )
    deduped = stream.dropDuplicatesWithinWatermark(["event_id"])
    agg = (
        deduped.groupBy(F.window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "user_id",
            "n_events",
        )
    )
    panel = _drain(agg, "append", "stopk", cleanup_dir=d,
                   state_feed_dirs=[d])
    from pyspark.sql.window import Window

    wr = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        panel.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 5)
        .select(
            "window_start",
            "window_end",
            F.col("rank").cast("int").alias("rank"),
            "user_id",
            "n_events",
        )
        .orderBy("window_start", "rank")
    )


def streaming_cusum_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X140: the STREAMING deployment shape of X138's CUSUM detector —
    the live pipeline does not batch-scan history, it watches the
    stream: per-day exact counts under a 1-hour watermark in append
    mode (only watermark-CLOSED days emit — the X40 rule), then the
    X138 closed-form CUSUM (analytics.cusum_scores — literally the
    same function the batch query calls, so the two cannot diverge)
    runs on the DRAINED day panel: baseline = the first 14 closed
    days, two-sided alarm, first-alarm changepoint.

    The stream side's state is one count per open day (watermark-
    bounded); the CUSUM arithmetic runs post-drain on the metadata-
    scale day table. The oracle shares the batch oracle's generated
    core (one template, two day universes — here restricted to days
    whose end ≤ final watermark)."""
    events = analytics._t(spark, sf_dir, "events")
    base_cols = events.select(
        F.date_format(as_timestamp(events, "ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts")
    )
    raw, d = _replayed_stream(
        spark, base_cols, "ts string", 1, "stream_cusum_"
    )
    stream = raw.withColumn("ts", F.to_timestamp("ts")).withWatermark(
        "ts", "1 hour"
    )
    agg = (
        stream.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.to_date(F.col("w.start")).alias("day"), "n")
    )
    panel = _drain(agg, "append", "scusum", cleanup_dir=d,
                   state_feed_dirs=[d])
    return analytics.cusum_scores(panel)


def streaming_user_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X155: the STREAMING deployment shape of X154's per-entity
    detector (the same relationship streaming_cusum_gate has to
    X138): per-(user, day) exact counts under a 1-hour watermark in
    append mode — only watermark-CLOSED days emit, the X40 rule —
    drained to a (users × closed days) panel that feeds
    registry_ext.user_anomaly_scores, LITERALLY the function the
    batch query calls, so the two detectors cannot diverge. Stream
    state is one counter per open (user, day); the scoring windows
    run post-drain, partitioned by user."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.registry_ext import (
        user_anomaly_scores,
    )

    events = analytics._t(spark, sf_dir, "events")
    base_cols = events.select(
        F.date_format(as_timestamp(events, "ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
    )
    raw, d = _replayed_stream(
        spark, base_cols, "ts string, user_id long", 1, "stream_uanom_"
    )
    stream = raw.withColumn("ts", F.to_timestamp("ts")).withWatermark(
        "ts", "1 hour"
    )
    agg = (
        stream.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id", F.to_date(F.col("w.start")).alias("day"), "n"
        )
    )
    panel = _drain(agg, "append", "suanom", cleanup_dir=d,
                   state_feed_dirs=[d])
    return user_anomaly_scores(panel)


def _er_dirty_universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-ER delta fixture (static form): X144's dirty
    customers plus the engineered-unmatchable 'zq-' records (every
    custkey % 10 == 5, offset +20M, edit distance ≥ 3 from every
    canonical name) so the NOVEL verdict path is exercised. Factored
    from :func:`_er_delta_stages` so the post-drain verdict reduction
    can rebuild the record universe WITHOUT re-opening a stream
    fixture (the shared-drain path, r11 VERDICT ask #3)."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.registry_ext import (
        _dirty_customers,
    )

    cust = analytics._t(spark, sf_dir, "customer")
    novel = cust.filter(F.col("c_custkey") % 10 == 5).select(
        (F.col("c_custkey") + 20_000_000).alias("dirty_id"),
        F.concat(F.lit("zq-"), F.col("c_name")).alias("dirty_name"),
        "c_nationkey",
        "c_mktsegment",
    )
    return _dirty_customers(spark, sf_dir).unionByName(novel)


def _er_delta_stages(spark: SparkSession, sf_dir: str):
    """The in-stream stages of :func:`streaming_er_delta`, factored so
    tests can ASSERT statelessness on the analyzed stream plan without
    draining. Returns (links_stream, cleanup_dir, dirty_universe).

    Stream side: arriving dirty records explode into their k=1
    deletion neighborhood (a pure projection) and probe the STATIC
    canonical customer index by STREAM-STATIC equi-join on
    (variant, nationkey, mktsegment) — X136's blocking key with the
    agreement attributes folded in, so records disagreeing on
    attributes never meet in the shuffle; one exact Levenshtein per
    candidate verifies in-batch. No watermark, no stateful operator:
    every stage is a projection, a stream-static join, or a filter.

    The delta is delivered TWICE (the X115 replay fixture): duplicate
    link emissions are collapsed post-drain, so matching the
    single-copy oracle is itself the replay-idempotence proof. Every
    3rd-ish record (custkey % 10 == 5, offset +20M) carries an
    engineered UNMATCHABLE name ('zq-' prefix, edit distance ≥ 3 from
    every canonical name) so the NOVEL verdict path is exercised."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import fuzzy

    cust = analytics._t(spark, sf_dir, "customer")
    dirty = _er_dirty_universe(spark, sf_dir)
    canon = cust.select(
        F.col("c_custkey").alias("right_key"),
        F.col("c_name").alias("_sb"),
        "c_nationkey",
        "c_mktsegment",
        F.explode(fuzzy._deletion_variants("c_name")).alias("_v"),
    )
    stream, d = _replayed_stream(
        spark,
        dirty,
        "dirty_id bigint, dirty_name string, "
        "c_nationkey int, c_mktsegment string",
        2,
        "stream_er_",
    )
    # single-file deliveries plan as one partition — fan the variant
    # explode + probe join out across the executors (stateless
    # exchange; same rationale as _doc_gate_stages)
    stream = stream.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    probe = stream.select(
        F.col("dirty_id").alias("left_key"),
        F.col("dirty_name").alias("_sa"),
        "c_nationkey",
        "c_mktsegment",
        F.explode(fuzzy._deletion_variants("dirty_name")).alias("_v"),
    )
    links = (
        probe.join(canon, ["_v", "c_nationkey", "c_mktsegment"])
        .select(
            "left_key",
            "right_key",
            F.levenshtein("_sa", "_sb").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
    )
    return links, d, dirty


def streaming_er_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X157: STREAMING entity resolution — the deployment shape of the
    X136/X144 batch family (r10 VERDICT ask #2) and the X115 pattern
    applied to the ER index: new dirty records arrive on a
    micro-batched stream and probe the persisted canonical dimension
    via stream-static equi-joins on the blocking key (deletion
    variant + agreement attrs); the canonical dimension is never
    re-exploded per batch by Spark's scan reuse, never self-joined,
    and the stream side carries only the arriving delta.

    Post-drain, duplicate emissions from the double delivery collapse
    (per-pair MIN — the fuzzy_join contract) and the shared
    :func:`fuzzy.link_verdicts` reducer — LITERALLY the code path the
    batch pin uses — produces one verdict per delta record: the
    CLOSEST matching entity (min dist, ties by min custkey), its
    distance, candidate count, or NOVEL. Batch/stream agreement is
    pinned in pytest (test_streaming.py) against
    fuzzy_join(left_attrs=...) over the identical fixture.

    Drained through the shared intake harness (:func:`_intake_verdicts`
    — one fixture write + one drain for all four stateless gates);
    stages and output values unchanged.

    Output: (dirty_id, matched, entity_custkey, dist, n_candidates),
    one row per delta record including novel ones."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import fuzzy

    drained = _intake_verdicts(spark, sf_dir, "er")
    links = drained.groupBy("left_key", "right_key").agg(
        F.min("dist").alias("dist")
    )
    dirty = _er_dirty_universe(spark, sf_dir)
    return fuzzy.link_verdicts(links, dirty.select("dirty_id")).select(
        F.col("record_key").alias("dirty_id"),
        "matched",
        F.col("entity_key").alias("entity_custkey"),
        "dist",
        "n_candidates",
    )


def streaming_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X164: STREAMING mergeable distinct sketch — the X158 registers
    maintained IN the stream (the monitoring family's first
    approximate streaming aggregate, and the production shape for
    "distinct users per day" at a volume where exact streaming
    distinct would hold unbounded per-window state): each event maps
    to its (register, rho) pair map-side (sketch.hll_reg_cols —
    LITERALLY the batch arithmetic), a watermarked per-(day, reg) MAX
    keeps AT MOST 64 state rows per open day regardless of traffic,
    and append mode emits closed days only (the X40 rule).

    Replay-idempotence is ALGEBRAIC here, not just tested: register
    MAX is idempotent, so the double-delivery fixture cannot change a
    single register — at-least-once delivery + idempotent merge =
    exact sketch state, the exactly-once argument production systems
    actually rely on. Post-drain, the estimate and the exact audit
    (from the static batch over the same closed days) mirror X163's
    columns, so the streaming and batch sketches are comparable row
    for row."""
    from aws_kinesis_data_ingestion_restapi_spark.functions.exact import (
        as_timestamp as _as_ts,
    )
    from aws_kinesis_data_ingestion_restapi_spark.operators import (
        sketch as sk,
    )

    events = analytics._t(spark, sf_dir, "events")
    base = events.select(
        F.date_format(
            _as_ts(events, "ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("ts"),
        "user_id",
    )
    raw, d = _replayed_stream(
        spark, base, "ts string, user_id long", 2, "stream_hll_"
    )
    stream = raw.withColumn("ts", F.to_timestamp("ts")).withWatermark(
        "ts", "1 hour"
    )
    reg, rho = sk.hll_reg_cols(F.col("user_id").cast("string"))
    regs = (
        stream.select("ts", reg.alias("reg"), rho.alias("rho"))
        .groupBy(F.window("ts", "1 day").alias("wnd"), "reg")
        .agg(F.max("rho").alias("rho"))
        .select(
            F.to_date(F.col("wnd.start")).cast("string").alias("scope"),
            "reg",
            "rho",
        )
    )
    drained = _drain(regs, "append", "shll", cleanup_dir=d,
                     state_feed_dirs=[d])
    est = sk.hll_estimate(drained, ["scope"])
    keyed = events.select(
        _as_ts(events, "ts").cast("date").cast("string").alias("scope"),
        F.col("user_id").cast("string").alias("uid"),
    )
    exact = keyed.groupBy("scope").agg(
        F.countDistinct("uid").alias("exact_distinct")
    )
    return (
        est.join(exact, "scope")
        .select(
            "scope",
            "n_zero_regs",
            "est_distinct",
            "exact_distinct",
            (
                (
                    F.col("est_distinct")
                    - F.col("exact_distinct").cast("double")
                )
                / F.col("exact_distinct").cast("double")
            ).alias("rel_err"),
        )
        .orderBy("scope")
    )


def _fk_gate_stages(spark: SparkSession, sf_dir: str):
    """The in-stream stages of :func:`streaming_fk_gate` (fixture +
    stream-static LEFT ANTI probe), factored for the shared intake
    drain. Returns (orphans_stream, cleanup_dir)."""
    orders = analytics._t(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.when(
            F.col("o_custkey") % 13 == 0,
            F.col("o_custkey") + 10_000_000,
        )
        .otherwise(F.col("o_custkey"))
        .alias("customer_id"),
    )
    stream, d = _replayed_stream(
        spark,
        base,
        "order_id bigint, customer_id bigint",
        2,
        "stream_fk_",
    )
    dim = analytics._t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id")
    )
    orphans = stream.join(F.broadcast(dim), "customer_id", "left_anti")
    return orphans, d


def _doc_gate_stages(spark: SparkSession, sf_dir: str):
    """The in-stream stages of the two DOCUMENT intake gates —
    decontamination (X179) and quality floor (X187) — built over ONE
    shared delta-docs fixture (both gates consume the identical
    (doc_id, text) delta, so dumping it twice was pure harness waste).
    Returns (hits_stream, scored_stream, cleanup_dir)."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import dedup, text
    from aws_kinesis_data_ingestion_restapi_spark.operators.registry_ext import (
        _DELTA_PCT,
        _docs,
        QUALITY_FLOOR,
    )

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") < 25)
    bgrams = (
        dedup.tokenized(bench)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.explode(
                dedup.hashed_ngrams(5, F.col("_toks"))
            ).alias("gram"),
        )
        .distinct()
    )
    delta = docs.filter(F.col("doc_id") % 10 >= _DELTA_PCT).select(
        "doc_id", "text"
    )
    stream, d = _replayed_stream(
        spark, delta, "doc_id bigint, text string", 2, "stream_docgate_"
    )
    # REPARTITION before the heavy stages: each replayed delivery is
    # ONE NDJSON file, and the file-source micro-batch plans it as ONE
    # partition — without the exchange the gram explode + probe join
    # ran on a single task (measured 14.2 s -> 6.0 s at sf0.1 with the
    # fan-out; the exchange is stateless, so append mode is untouched)
    stream = stream.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    # per-doc DISTINCT grams BEFORE the explode: the verdict counts
    # distinct grams anyway, so in-doc repeats only inflate the
    # exploded row count (measured 11.3 s -> the explode dominates);
    # array_distinct keeps the emitted verdict set bit-identical
    sgrams = stream.select(
        "doc_id",
        F.explode(
            F.array_distinct(dedup.hashed_ngrams(5, dedup.tokens_col()))
        ).alias("gram"),
    )
    hits = sgrams.join(F.broadcast(bgrams), "gram").select(
        "doc_id", "gram", "bench_id"
    )
    scored = text.quality_score(stream).filter(
        F.col("quality_score") < QUALITY_FLOOR
    ).select("doc_id", "n_tokens", "quality_score")
    return hits, scored, d


def _bp_gate_stages(spark: SparkSession, sf_dir: str):
    """The in-stream stages of :func:`streaming_boilerplate_gate`:
    arriving template pages (the X188 lined fixture's DELTA slice)
    posexplode into lines — a pure projection — and probe the STATIC
    flagged-line dimension (X188's per-source boilerplate table,
    learned offline from the full corpus, BROADCAST — template
    dimensions are tiny) by an inner equi-join on (source, line);
    only boilerplate hits emit. Stateless. Returns (hits, d)."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import dedup
    from aws_kinesis_data_ingestion_restapi_spark.operators.registry_ext import (
        _DELTA_PCT,
        _lined_docs,
        BOILERPLATE_MAX_SHARE,
        BOILERPLATE_MIN_DOCS,
    )

    lined = _lined_docs(spark, sf_dir)
    flagged = dedup.line_stats(
        lined,
        min_docs=BOILERPLATE_MIN_DOCS,
        max_share=BOILERPLATE_MAX_SHARE,
    ).filter(F.col("is_boilerplate")).select("source", "line")
    delta = lined.filter(F.col("doc_id") % 10 >= _DELTA_PCT)
    stream, d = _replayed_stream(
        spark,
        delta,
        "doc_id bigint, source string, text string",
        2,
        "stream_bp_",
    )
    lines = stream.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", "\n")).alias("pos", "line"),
    )
    hits = lines.join(F.broadcast(flagged), ["source", "line"]).select(
        "doc_id", "pos"
    )
    return hits, d


def _bloom_probe_docs(spark: SparkSession, sf_dir: str):
    """The X216 fixture pair: (retained corpus, probe batch). Retained
    = the 70% doc_id head (the already-indexed corpus whose keys fold
    into the Bloom bits); probes = the 30% delta (mostly fresh — any
    flag is a measured false positive) UNION every 7th retained doc
    re-delivered verbatim (engineered TRUE duplicates — the Bloom
    no-false-negative guarantee makes flagging them mandatory)."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.registry_ext import (
        _DELTA_PCT,
        _docs,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    retained = docs.filter(F.col("doc_id") % 10 < _DELTA_PCT)
    probes = docs.filter(F.col("doc_id") % 10 >= _DELTA_PCT).unionByName(
        retained.filter(F.col("doc_id") % 7 == 0)
    )
    return retained, probes


def _bloom_gate_stages(spark: SparkSession, sf_dir: str):
    """The in-stream stages of :func:`streaming_bloom_gate`: arriving
    documents hash into their BLOOM_K md5-derived bit positions (a
    k-way explode — pure projection) and probe the STATIC bit set
    built offline from the retained corpus (distinct positions —
    2^16 bits ≈ 8 KB of state, BROADCAST; the whole point at 100 TB:
    the corpus KEY SET cannot be broadcast, its Bloom fold can).
    Set positions emit as (doc_id, hi) hits; the membership verdict
    (all k hit) is a post-drain aggregate. Stateless. Returns
    (hits, d)."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import sketch

    retained, probes = _bloom_probe_docs(spark, sf_dir)
    bits = (
        sketch.bloom_positions(retained, "text")
        .select("pos")
        .distinct()
    )
    stream, d = _replayed_stream(
        spark, probes, "doc_id bigint, text string", 2, "stream_bloom_"
    )
    idx = F.explode(
        F.array(*[F.lit(i) for i in range(sketch.BLOOM_K)])
    ).alias("hi")
    h = F.md5(
        F.concat(F.col("text"), F.lit(":"), F.col("hi").cast("string"))
    )
    ppos = stream.select("doc_id", "text", idx).select(
        "doc_id",
        "hi",
        (
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
            % F.lit(sketch.BLOOM_M)
        ).alias("pos"),
    )
    hits = ppos.join(F.broadcast(bits), "pos").select("doc_id", "hi")
    return hits, d


#: (applicationId, sf_dir) -> {gate: drained memory table} for the
#: stateless intake gates (fk / er / dcn / qg / bp / bloom)
_INTAKE_GATE_CACHE: dict = {}


def _intake_verdicts(spark: SparkSession, sf_dir: str, gate: str) -> DataFrame:
    """ONE shared fixture pass + CONCURRENT availableNow drains for the
    four STATELESS intake gates (r11 VERDICT ask #3): FK (X175),
    entity resolution (X157), decontamination (X179), and quality
    floor (X187). Each gate previously paid its own NDJSON dump and a
    serial drain whose micro-batches spend most of their wall on
    single-task file scans and static-side rebuilds; here the two
    DOCUMENT gates share one delta fixture (:func:`_doc_gate_stages`)
    and all four queries START together, so the per-gate idle time
    overlaps (measured 18.0 s serial -> ~8 s concurrent at sf0.1).

    Every gate keeps its OWN unchanged in-stream plan (the factored
    ``_*_stages`` builders the plan-pin tests import) and its own
    memory sink, so per-gate outputs are bit-identical to the
    dedicated drains; only the harness scheduling changed. The
    session cache hands each registry entry its drained table."""
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _INTAKE_GATE_CACHE.get(key)
    if got is not None:
        return got[gate]
    # the three fixture dumps are independent batch writes (~5 s
    # serial at sf0.1) — build them on threads so the jobs overlap
    # under the FAIR scheduler like the drains below do
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=5) as pool:
        f_fk = pool.submit(_fk_gate_stages, spark, sf_dir)
        f_doc = pool.submit(_doc_gate_stages, spark, sf_dir)
        f_er = pool.submit(_er_delta_stages, spark, sf_dir)
        f_bp = pool.submit(_bp_gate_stages, spark, sf_dir)
        f_bloom = pool.submit(_bloom_gate_stages, spark, sf_dir)
        orphans, d_fk = f_fk.result()
        hits, scored, d_doc = f_doc.result()
        links, d_er, _ = f_er.result()
        bp_hits, d_bp = f_bp.result()
        bloom_hits, d_bloom = f_bloom.result()
    staged = {
        "fk": orphans,
        "er": links,
        "dcn": hits,
        "qg": scored,
        "bp": bp_hits,
        "bloom": bloom_hits,
    }
    queries: list = []
    ckpts: list[str] = []
    tables: dict[str, DataFrame] = {}
    sc = spark.sparkContext
    try:
        for g, df in staged.items():
            qname = f"intake_{g}_{next(_seq)}"
            ckpt = _scratch_dir(f"ckpt_{qname}_")
            ckpts.append(ckpt)
            # each drain gets its own FAIR pool (session.py sets
            # spark.scheduler.mode=FAIR): the four queries time-slice
            # the executor slots instead of queueing whole stages —
            # streaming queries capture the local property at start()
            sc.setLocalProperty("spark.scheduler.pool", f"intake_{g}")
            queries.append(
                df.writeStream.outputMode("append")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            tables[g] = spark.table(qname)
        sc.setLocalProperty("spark.scheduler.pool", None)
        for q in queries:
            # same truncation discipline as _drain: a timed-out drain
            # must raise, never hand back a partially-filled table
            if not q.awaitTermination(600):
                raise RuntimeError(
                    "intake-gate drain did not finish within 600s; "
                    "refusing to return partially-filled memory tables"
                )
    except BaseException:
        for q in queries:
            try:
                q.stop()
            except Exception:
                pass
        raise
    finally:
        for ckpt in ckpts:
            shutil.rmtree(ckpt, ignore_errors=True)
        for d in (d_fk, d_doc, d_er, d_bp, d_bloom):
            shutil.rmtree(d, ignore_errors=True)
    _INTAKE_GATE_CACHE[key] = tables
    return tables[gate]


def streaming_fk_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X175: STREAMING referential-integrity gate — X170's audit moved
    to the intake boundary (the cheapest place to stop an orphan: an
    order referencing a customer the dimension has never seen should
    quarantine ON ARRIVAL, not surface as undercounted revenue in a
    nightly audit): the replayed order stream probes the customer
    dimension by a STREAM-STATIC LEFT ANTI join on the customer key —
    stateless, the dimension broadcast — and every orphan emits as a
    verdict row. The fixture CORRUPTS every 13th order's customer key
    (+10M offset) so the orphan path is exercised deterministically;
    double delivery collapses post-drain (the X115 replay contract).

    Drained through the shared intake harness (:func:`_intake_verdicts`
    — one fixture write + one drain for all four stateless gates);
    stages and output values unchanged.

    Output: (order_id, customer_id) for every orphaned order."""
    drained = _intake_verdicts(spark, sf_dir, "fk")
    return drained.select("order_id", "customer_id").distinct().orderBy(
        "order_id"
    )


def streaming_decontamination_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X179: STREAMING decontamination — the third stream-static probe
    (dedup X115, ER X157, FK X175) and the deployment shape of X5/
    X122: newly arriving documents are checked for benchmark n-gram
    overlap ON ARRIVAL (the eval-leak gate belongs at the intake — a
    contaminated doc that reaches the training corpus costs a
    re-crawl of the decontamination audit), by exploding each delta
    doc's hashed 5-grams map-side (pure projections — the 28-bit
    int-gram arithmetic X5 uses) and probing the BROADCAST distinct
    benchmark gram set; every (doc, gram, bench_doc) hit emits,
    stateless. Post-drain, double-delivery duplicates collapse and
    the per-doc verdict aggregates exactly the batch report's
    columns — pinned row-identical to contamination_report's delta
    rows in the oracle.

    Drained through the shared intake harness (:func:`_intake_verdicts`);
    stages and output values unchanged.

    Output: (doc_id, n_hit_grams, n_benchmark_docs) per contaminated
    delta document."""
    drained = _intake_verdicts(spark, sf_dir, "dcn")
    return (
        drained.distinct()
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").cast("long").alias("n_hit_grams"),
            F.countDistinct("bench_id")
            .cast("long")
            .alias("n_benchmark_docs"),
        )
        .filter(F.col("n_hit_grams") >= 1)
        .orderBy("doc_id")
    )


def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X187: STREAMING quality-floor gate — the last member of the
    intake-gate family (dedup X115, ER X157, FK X175, decontamination
    X179): arriving documents score through the X9 heuristic MAP-SIDE
    (quality_score is pure column arithmetic — no state, no shuffle)
    and below-floor documents emit as quarantine verdicts with their
    component-level evidence. At 100 TB this is the cheapest possible
    gate: the score rides the ingest scan; only rejects move.

    Drained through the shared intake harness (:func:`_intake_verdicts`);
    stages and output values unchanged.

    Output: (doc_id, n_tokens, quality_score) per below-floor delta
    document; double delivery collapses post-drain."""
    drained = _intake_verdicts(spark, sf_dir, "qg")
    return drained.distinct().orderBy("doc_id")


def streaming_boilerplate_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X195: STREAMING boilerplate gate — the fifth stateless intake
    gate (dedup X115, ER X157, FK X175, decontamination X179, quality
    X187) and the deployment shape of X188/X189: the boilerplate line
    dimension is learned OFFLINE from the corpus (X188's per-source
    flags) and arriving template pages probe it ON ARRIVAL — each
    boilerplate line emits as a hit, stateless, so the intake can
    strip templates before they pollute near-dup signatures. Double
    delivery collapses post-drain on the (doc, line-position) key.

    Drained through the shared intake harness (:func:`_intake_verdicts`).

    Output: (doc_id, n_boilerplate_lines) per affected delta doc."""
    drained = _intake_verdicts(spark, sf_dir, "bp")
    return (
        drained.select("doc_id", "pos")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_boilerplate_lines"))
        .orderBy("doc_id")
    )


def _rate_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The X223 static side: the X21 monthly rate quotes COMPILED into
    non-overlapping validity intervals offline (valid_from = the quote
    date, valid_to = the next quote's date via LEAD, NULL-open tail).
    This compilation is the trick that makes streaming as-of
    enrichment STATELESS: a raw as-of needs a per-key latest-match
    (aggregation = stream state), an interval table needs only
    containment — a pure stream-static inner join."""
    orders = analytics._t(spark, sf_dir, "orders")
    m = F.col("m")
    quotes = (
        orders.select("o_orderpriority")
        .distinct()
        .select(
            "o_orderpriority",
            F.explode(F.sequence(F.lit(0), F.lit(83))).alias("m"),
        )
        .select(
            "o_orderpriority",
            F.add_months(F.to_date(F.lit("1995-01-01")), m).alias(
                "quote_date"
            ),
            (
                F.lit(1.0)
                + ((m * 7 + F.length("o_orderpriority")) % 13)
                / F.lit(100.0)
            ).alias("rate"),
        )
    )
    from pyspark.sql.window import Window as W

    nxt = W.partitionBy("o_orderpriority").orderBy("quote_date")
    return quotes.withColumn(
        "valid_to", F.lead("quote_date").over(nxt)
    )


def _asof_rate_stages(spark: SparkSession, sf_dir: str):
    """In-stream stages of :func:`streaming_asof_rates`: arriving
    orders (the deterministic 10% o_orderkey slice) join the broadcast
    interval dimension by priority + date containment — non-equi
    stream-static inner join, stateless. Returns (enriched, d)."""
    orders = analytics._t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 10 == 0
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.to_date("o_orderdate").cast("string").alias("od"),
    )
    stream, d = _replayed_stream(
        spark,
        orders,
        "o_orderkey bigint, o_orderpriority string, od string",
        2,
        "stream_asof_",
    )
    iv = _rate_intervals(spark, sf_dir)
    s = stream.select(
        "o_orderkey", "o_orderpriority", F.to_date("od").alias("odate")
    )
    enriched = (
        s.join(
            F.broadcast(iv),
            (s.o_orderpriority == iv.o_orderpriority)
            & (F.col("odate") >= F.col("quote_date"))
            & (
                F.col("valid_to").isNull()
                | (F.col("odate") < F.col("valid_to"))
            ),
        )
        .select(
            "o_orderkey",
            s.o_orderpriority.alias("priority"),
            "quote_date",
            "rate",
        )
    )
    return enriched, d


def streaming_asof_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X223: STREAMING as-of enrichment — X21's point-in-time rate
    lookup moved to the intake boundary (enrich-on-arrival is the
    production shape: pricing, FX, and config dimensions are all
    'latest version at event time'): the as-of dimension is COMPILED
    offline into non-overlapping validity intervals
    (:func:`_rate_intervals` — one LEAD window over the quote table),
    and the stream probes it by containment, a stateless broadcast
    join. A raw streaming as-of would need per-key latest-match state;
    the interval compilation is what deletes that state — the same
    offline-dimension discipline as the X195 boilerplate and X216
    Bloom gates. Double delivery collapses on the (order, interval)
    key post-drain; pytest pins row-identity against the batch X21
    as-of join on the same slice and plan statelessness.

    Output: (o_orderkey, priority, quote_date, rate) for the streamed
    slice."""
    enriched, d = _asof_rate_stages(spark, sf_dir)
    drained = _drain(enriched, "append", "sasof", cleanup_dir=d)
    return drained.distinct().orderBy("o_orderkey")


def streaming_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X216: STREAMING Bloom pre-dedup gate — the sixth stateless
    intake gate (dedup X115, ER X157, FK X175, decontamination X179,
    quality X187, boilerplate X195) and the deployment shape of X211's
    audited sketch: at 100 TB the corpus CONTENT-KEY SET cannot sit on
    every ingest executor, but its Bloom fold (2^16 bits ≈ 8 KB) can —
    arriving documents probe the broadcast bit set map-side and only
    PROBABLE duplicates route onward to the exact X115/X90 check, so
    the expensive path sees the ~fill^k fraction instead of the full
    feed. Zero false negatives by the filter guarantee (every
    engineered re-crawl MUST flag — pinned in pytest); false
    positives are the measured, bounded cost (X211's audit is the
    instrument that sizes m and k). Double delivery collapses on the
    (doc, hash-index) key post-drain.

    Drained through the shared intake harness (:func:`_intake_verdicts`).

    Output: (doc_id, is_true_dup) per flagged probe — is_true_dup
    joins the batch truth (text membership in the retained corpus),
    so the row set separates caught re-crawls from false positives."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import sketch

    drained = _intake_verdicts(spark, sf_dir, "bloom")
    flagged = (
        drained.distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_n_set"))
        .filter(F.col("_n_set") == sketch.BLOOM_K)
        .select("doc_id")
    )
    retained, probes = _bloom_probe_docs(spark, sf_dir)
    truth = retained.select("text").distinct().withColumn(
        "_m", F.lit(1)
    )
    return (
        flagged.join(probes, "doc_id")
        .join(truth, "text", "left")
        .select("doc_id", F.col("_m").isNotNull().alias("is_true_dup"))
        .orderBy("doc_id")
    )
