"""Sinks: partitioned Parquet tables, keyed upsert serving view, error sink.

Storage mirrors the reference at rest — Snappy Parquet in Hive-style
partition layouts (terraform/main.tf:675, 883, 1095, 1306;
compression variables.tf:56-60) — but with one strict upgrade: Spark
REGISTERS the partition columns, so they are queryable and prunable
(the reference's Glue tables declare no partition_keys — SURVEY §1.2).

The serving sink is the DynamoDB analog (main.tf:347-370): an
idempotent keyed upsert on (customer_id, order_id). Without Delta in
this environment, the MERGE is emulated with a hash-bucketed partial
rewrite: the store is laid out as ``bucket=K/`` Hive partitions keyed
by ``pmod(xxhash64(keys), n_buckets)``, and an upsert rewrites ONLY the
buckets the batch touches — untouched bucket files stay byte-identical.
Rewrite cost scales with the batch's key spread, not the store size
(the parquet analog of DynamoDB touching only the written partitions;
on Delta/Iceberg the same logic is ``MERGE INTO``).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark.schema import TABLE_PARTITIONS

SERVING_KEYS = ["customer_id", "order_id"]


#: Columnar formats write_partitioned accepts — both built into Spark
#: (no external jars), both footer-statistics formats so the pruning
#: story (min/max row-group skipping, partition directories) is
#: identical. Parquet is the default and the reference's format
#: (Firehose parquet conversion, main.tf:654-719); ORC is the drop-in
#: alternative for Hive-ecosystem consumers.
COLUMNAR_FORMATS = ("parquet", "orc")


def write_partitioned(
    df: DataFrame,
    path: str,
    table: str | None = None,
    partition_cols: list[str] | None = None,
    mode: str = "append",
    max_records_per_file: int = 1_000_000,
    format: str = "parquet",
) -> None:
    """K1+K2: partitioned Snappy columnar write (parquet by default,
    ORC via ``format="orc"`` — same layout, same pruning semantics).

    ``maxRecordsPerFile`` bounds file sizes like the Firehose 128 MB
    buffer (main.tf:668) bounds flush sizes — at 100 TB you want many
    right-sized files per partition, not one giant or thousands tiny.
    """
    if format not in COLUMNAR_FORMATS:
        raise ValueError(
            f"format={format!r} not supported; choose from {COLUMNAR_FORMATS}"
        )
    if partition_cols is None and table is not None:
        partition_cols = TABLE_PARTITIONS.get(table, [])
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if format == "orc":
        writer.option("compression", "snappy").orc(path)
    else:
        writer.parquet(path)


def write_errors(
    bad: DataFrame, base_path: str, batch_id: int | None = None
) -> None:
    """E1: quarantine failed records under ``errors/`` (main.tf:676).

    With ``batch_id`` the quarantine lands in a deterministic
    ``bid={batch_id}`` partition dir in OVERWRITE mode — a replayed
    micro-batch rewrites the same directory instead of appending
    duplicates (the same exactly-once recipe as the table sinks;
    streaming/pipeline.py). Without it (batch callers), plain append."""
    if batch_id is None:
        bad.write.mode("append").parquet(os.path.join(base_path, "errors"))
    else:
        bad.write.mode("overwrite").parquet(
            os.path.join(base_path, "errors", f"bid={batch_id}")
        )


SERVING_N_BUCKETS = 16


def _bucket_expr(n_buckets: int):
    """Stable key→bucket hash (xxhash64 is version-stable and cheap)."""
    return F.pmod(F.xxhash64(*SERVING_KEYS), F.lit(n_buckets)).cast("int")


def _is_bucketed_layout(store_path: str) -> bool:
    return any(
        e.startswith("bucket=")
        for e in os.listdir(store_path)
        if not e.startswith(("_", "."))
    )


def serving_upsert(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    n_buckets: int = SERVING_N_BUCKETS,
) -> None:
    """K4+E3: idempotent keyed upsert — the DynamoDB ``put_item`` analog.

    Semantics (lambda_kinesis_consumer:48 + at-least-once Kinesis):
    last-write-wins per (customer_id, order_id); replaying a batch is a
    no-op. Batch-internal dups are collapsed first (put_item order
    within one poll is arbitrary in the reference too).

    Scale design: the store is hash-bucketed on the key
    (``bucket=pmod(xxhash64(keys), n_buckets)`` Hive partitions). An
    upsert reads and rewrites ONLY the touched buckets — the anti-join
    scan is partition-pruned, and untouched bucket files are never
    opened, let alone rewritten. The touched-bucket list collected to
    the driver is bounded by ``n_buckets`` (partition metadata, not
    data). Each bucket swap is a rename-aside (old dir renamed away,
    new dir renamed in, aside deleted) — NOT atomic, but the
    unrecoverable window is two pure renames and a crash never leaves
    the store without the bucket's data on disk; cross-bucket
    atomicity needs a transactional format (``MERGE INTO`` on
    Delta/Iceberg — the documented production target), matching the
    reference's per-item (non-transactional) DynamoDB batch writes.

    Size ``n_buckets`` so a bucket ≈ one task's comfortable rewrite
    unit; at a larger store, raise it (resizing = one full rewrite, the
    same migration path as the legacy flat layout below).
    """
    deduped = batch.dropDuplicates(SERVING_KEYS).withColumn(
        "bucket", _bucket_expr(n_buckets)
    )
    staging = store_path.rstrip("/") + f"._staging_{uuid.uuid4().hex}"

    # crash recovery FIRST — before any existence check or read: a
    # prior run may have died inside a rename-aside window, leaving
    # the only copy of the store (or of a bucket) under an aside name
    _recover_debris(store_path)

    if not os.path.exists(store_path):
        deduped.write.mode("overwrite").partitionBy("bucket").parquet(store_path)
        return

    if not _is_bucketed_layout(store_path):
        # legacy flat store: one full merge-rewrite migrates it into the
        # bucketed layout; every later upsert is partial.
        existing = spark.read.parquet(store_path).withColumn(
            "bucket", _bucket_expr(n_buckets)
        )
        survivors = existing.join(
            F.broadcast(deduped.select(*SERVING_KEYS)), SERVING_KEYS, "left_anti"
        )
        merged = survivors.unionByName(deduped)
        merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        _replace_store(staging, store_path)
        return

    touched = sorted(
        r[0] for r in deduped.select("bucket").distinct().collect()
    )
    # partition-pruned scan: only the touched bucket dirs are read
    existing = spark.read.parquet(store_path).filter(
        F.col("bucket").isin(touched)
    )
    survivors = existing.join(
        F.broadcast(deduped.select(*SERVING_KEYS)), SERVING_KEYS, "left_anti"
    ).withColumn("bucket", F.col("bucket").cast("int"))
    merged = survivors.unionByName(deduped)
    merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
    _swap_buckets(staging, store_path, touched)


def _restore_or_drop_aside(aside: str, primary: str) -> None:
    """The one recovery rule both rename-aside schemes share: an
    aside whose primary is MISSING holds the only copy (the crash hit
    between the two replaces) — rename it back; an aside next to an
    intact primary is a stale copy from after the second replace —
    delete it."""
    if not os.path.exists(aside):
        return
    if os.path.exists(primary):
        shutil.rmtree(aside)
    else:
        os.replace(aside, primary)


def _recover_debris(store_path: str) -> None:
    """Entry-time crash recovery, run before ANY read of the store.

    Three debris classes, in dependency order:

    1. Legacy-migration aside (``<store>._aside_migrate``): restore
       or drop via the shared rule — a restored store is flat and
       re-migrates on this run.
    2. Per-bucket asides (``._old_bucket=K`` inside the store): a
       missing ``bucket=K`` means the aside holds that bucket's ONLY
       rows; without the restore the partition-pruned scan sees zero
       existing rows for K and every key not in the new batch is
       silently lost.
    3. Crashed staging siblings (``<store>._staging_<uuid>``): a run
       that died between its staging write and the swap leaves a full
       merged copy of the touched buckets under a uuid name no later
       run ever references — readers never see it (hidden), but each
       crash would otherwise leak a store-sized directory forever.

    Single-writer contract (documented on serving_upsert): no
    concurrent upsert's LIVE staging dir can be present here."""
    _restore_or_drop_aside(
        store_path.rstrip("/") + "._aside_migrate", store_path
    )
    if os.path.isdir(store_path):
        for entry in os.listdir(store_path):
            if entry.startswith("._old_bucket="):
                _restore_or_drop_aside(
                    os.path.join(store_path, entry),
                    os.path.join(store_path, "bucket=" + entry.split("=", 1)[1]),
                )
    parent, name = os.path.split(store_path.rstrip("/"))
    parent = parent or "."
    if os.path.isdir(parent):
        for entry in os.listdir(parent):
            if entry.startswith(name + "._staging_"):
                shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)


def _replace_store(staging: str, store_path: str) -> None:
    """Whole-store rename-aside swap (migration path): the old store
    stays on disk under the aside name until the new one is in place,
    so a crash BETWEEN the two replaces leaves the store recoverable —
    :func:`_recover_debris` renames the aside back at the next entry.
    The aside-exists guard is defensive only: entry recovery already
    cleared any aside before the caller read the store."""
    aside = store_path.rstrip("/") + "._aside_migrate"
    if os.path.exists(aside):
        shutil.rmtree(aside)
    os.replace(store_path, aside)
    os.replace(staging, store_path)
    shutil.rmtree(aside)


def _swap_buckets(staging: str, store_path: str, touched: list[int]) -> None:
    """Swap each touched bucket via rename-aside: old data stays
    readable (under a hidden aside dir) until the new dir is in place,
    so a crash anywhere leaves every bucket's rows on disk — between
    the two replaces they sit under the aside name, which
    :func:`_recover_debris` renames back at the next upsert's
    entry. Cross-bucket atomicity still needs a transactional table
    format (Delta/Iceberg MERGE INTO — the documented production
    target). A touched bucket with NO staged dir (every row deleted)
    is removed."""
    for b in touched:
        src = os.path.join(staging, f"bucket={b}")
        dst = os.path.join(store_path, f"bucket={b}")
        # leading dot: Spark's file listing ignores hidden entries, so
        # a crash-leftover aside dir is invisible to readers
        aside = os.path.join(store_path, f"._old_bucket={b}")
        if os.path.exists(aside):
            # entry recovery ran before the store was read, so any
            # aside still present alongside its bucket is stale
            shutil.rmtree(aside)
        had_old = os.path.exists(dst)
        if had_old:
            os.replace(dst, aside)
        if os.path.exists(src):
            os.replace(src, dst)
        if had_old:
            shutil.rmtree(aside)
    shutil.rmtree(staging, ignore_errors=True)


def serving_apply_changes(
    spark: SparkSession,
    changes: DataFrame,
    new_snapshot: DataFrame,
    store_path: str,
    n_buckets: int = SERVING_N_BUCKETS,
) -> None:
    """CDC APPLY: feed a keyed change feed — the exact output shape of
    ``operators/cdc.snapshot_diff`` (key columns + ``change_type`` ∈
    insert/update/delete) — into the bucketed serving store.
    Inserts/updates take their payload rows from ``new_snapshot``
    (snapshot_diff carries only keys + digests, by design — the shuffle
    stays key-sized); deletes remove the key. Replaying the same feed
    is a no-op (idempotent, like serving_upsert).

    Scale shape mirrors serving_upsert: only the buckets touched by
    ANY change are scanned (partition-pruned) and rewritten; the
    touched-bucket list is bounded by ``n_buckets``. A bucket whose
    rows are all deleted is dropped from the store entirely.
    """
    keyed = changes.filter(
        F.col("change_type").isin("insert", "update", "delete")
    ).dropDuplicates(SERVING_KEYS)
    ups = new_snapshot.join(
        F.broadcast(
            keyed.filter(F.col("change_type") != "delete").select(*SERVING_KEYS)
        ),
        SERVING_KEYS,
    ).withColumn("bucket", _bucket_expr(n_buckets))
    all_keys = keyed.select(*SERVING_KEYS).withColumn(
        "bucket", _bucket_expr(n_buckets)
    )

    # same crash recovery as serving_upsert, before any read
    _recover_debris(store_path)

    if not os.path.exists(store_path):
        ups.write.mode("overwrite").partitionBy("bucket").parquet(store_path)
        return

    if not _is_bucketed_layout(store_path):
        # a flat store can reach this path two ways: a legacy layout
        # never upserted against, or a migration-crash restore by
        # _recover_debris just above. Either way the bucketed read
        # below would fail on the missing 'bucket' column — migrate
        # first (pure re-bucket, no batch fused in), then apply the
        # change feed through the normal partial path.
        flat = spark.read.parquet(store_path).withColumn(
            "bucket", _bucket_expr(n_buckets)
        )
        staging = store_path.rstrip("/") + f"._staging_{uuid.uuid4().hex}"
        flat.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        _replace_store(staging, store_path)

    touched = sorted(r[0] for r in all_keys.select("bucket").distinct().collect())
    if not touched:
        return
    existing = spark.read.parquet(store_path).filter(F.col("bucket").isin(touched))
    survivors = existing.join(
        F.broadcast(all_keys.select(*SERVING_KEYS)), SERVING_KEYS, "left_anti"
    ).withColumn("bucket", F.col("bucket").cast("int"))
    merged = survivors.unionByName(ups)
    staging = store_path.rstrip("/") + f"._staging_{uuid.uuid4().hex}"
    merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
    _swap_buckets(staging, store_path, touched)
