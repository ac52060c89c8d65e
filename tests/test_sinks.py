"""Serving-store upsert: hash-bucketed partial rewrite (K4+E3).

The scale property under test: an upsert rewrites ONLY the buckets its
batch touches — every file in an untouched bucket is byte-identical
afterwards (not merely equal-valued), so rewrite cost scales with the
batch's key spread, not the store size.
"""

from __future__ import annotations

import glob
import hashlib
import os

from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark.sinks import (
    SERVING_KEYS,
    _bucket_expr,
    serving_upsert,
)

N_BUCKETS = 8


def _rows(spark, keys, status):
    return spark.createDataFrame(
        [(c, o, status) for c, o in keys],
        "customer_id string, order_id string, status string",
    )


def _file_hashes(store):
    out = {}
    for path in glob.glob(os.path.join(store, "bucket=*", "*.parquet")):
        with open(path, "rb") as f:
            out[os.path.relpath(path, store)] = hashlib.md5(f.read()).hexdigest()
    return out


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    store = str(tmp_path / "serving")
    keys = [(f"c{i}", f"o{i}") for i in range(200)]
    serving_upsert(spark, _rows(spark, keys, "pending"), store, n_buckets=N_BUCKETS)

    before = _file_hashes(store)
    buckets_present = {p.split(os.sep)[0] for p in before}
    assert len(buckets_present) > 1, "need multiple buckets for the test to bite"

    # upsert a single key → exactly one touched bucket
    target = keys[7]
    serving_upsert(spark, _rows(spark, [target], "shipped"), store, n_buckets=N_BUCKETS)
    touched = _rows(spark, [target], "x").select(
        _bucket_expr(N_BUCKETS).alias("b")
    ).first()["b"]

    after = _file_hashes(store)
    for rel, digest in before.items():
        bucket = int(rel.split(os.sep)[0].split("=")[1])
        if bucket != touched:
            assert rel in after, f"untouched file {rel} disappeared"
            assert after[rel] == digest, f"untouched file {rel} was rewritten"
    # ...and the touched bucket actually changed
    changed = {
        rel for rel in set(before) | set(after)
        if before.get(rel) != after.get(rel)
    }
    assert changed
    assert {int(r.split(os.sep)[0].split("=")[1]) for r in changed} == {touched}

    # merge semantics: count unchanged, updated row visible, rest intact
    serving = spark.read.parquet(store)
    assert serving.count() == len(keys)
    assert (
        serving.filter(
            (F.col("customer_id") == target[0]) & (F.col("order_id") == target[1])
        ).first()["status"]
        == "shipped"
    )
    assert serving.filter(F.col("status") == "pending").count() == len(keys) - 1


def test_upsert_replay_is_idempotent_bucketed(spark, tmp_path):
    store = str(tmp_path / "serving")
    keys = [(f"c{i}", f"o{i}") for i in range(50)]
    batch = _rows(spark, keys, "pending")
    serving_upsert(spark, batch, store, n_buckets=N_BUCKETS)
    serving_upsert(spark, batch, store, n_buckets=N_BUCKETS)  # full replay
    serving = spark.read.parquet(store)
    assert serving.count() == len(keys)
    assert serving.dropDuplicates(SERVING_KEYS).count() == len(keys)


def test_upsert_migrates_legacy_flat_store(spark, tmp_path):
    """A pre-bucketing flat store is merged and migrated into the
    bucketed layout on the first upsert; later upserts are partial."""
    store = str(tmp_path / "serving")
    legacy = _rows(spark, [(f"c{i}", f"o{i}") for i in range(20)], "pending")
    legacy.write.parquet(store)  # flat layout, no bucket dirs

    serving_upsert(spark, _rows(spark, [("c0", "o0")], "shipped"), store,
                   n_buckets=N_BUCKETS)
    serving = spark.read.parquet(store)
    assert serving.count() == 20
    assert "bucket" in serving.columns
    assert serving.filter(F.col("status") == "shipped").count() == 1


def _snap(spark, rows):
    return spark.createDataFrame(
        rows, "customer_id string, order_id string, amount double"
    )


def test_apply_changes_roundtrips_snapshot_diff(spark, tmp_path):
    """Store built from v1 + applied diff(v1→v2) must equal v2 exactly
    — inserts present, updates new-valued, deletes gone — and a replay
    of the same feed must be a no-op."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.cdc import snapshot_diff
    from aws_kinesis_data_ingestion_restapi_spark.sinks import serving_apply_changes

    store = str(tmp_path / "store")
    v1 = _snap(spark, [(f"c{i}", f"o{i}", 10.0 * i) for i in range(40)])
    # v2: delete multiples of 7, bump multiples of 5, insert 3 new keys
    v2 = _snap(
        spark,
        [
            (f"c{i}", f"o{i}", 10.0 * i + (1.0 if i % 5 == 0 else 0.0))
            for i in range(40)
            if i % 7 != 0
        ]
        + [(f"c{i}", f"o{i}", 99.0) for i in (100, 101, 102)],
    )
    serving_upsert(spark, v1, store, n_buckets=N_BUCKETS)
    changes = snapshot_diff(
        v1, v2, keys=SERVING_KEYS, compare_cols=["amount"]
    )
    serving_apply_changes(spark, changes, v2, store, n_buckets=N_BUCKETS)

    def contents():
        return sorted(
            (r["customer_id"], r["order_id"], r["amount"])
            for r in spark.read.parquet(store).collect()
        )

    want = sorted(tuple(r) for r in v2.collect())
    assert contents() == want
    # replay: same feed, same snapshot → byte-equal result set
    serving_apply_changes(spark, changes, v2, store, n_buckets=N_BUCKETS)
    assert contents() == want


def test_apply_changes_restores_bucket_lost_mid_swap(spark, tmp_path):
    """serving_apply_changes shares serving_upsert's rename-aside swap
    and must run the same entry recovery: with bucket=K gone and
    ._old_bucket=K holding its only rows, applying a change feed that
    touches K must first restore the aside — otherwise every
    unchanged key in K is silently dropped from the store."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.cdc import snapshot_diff
    from aws_kinesis_data_ingestion_restapi_spark.sinks import serving_apply_changes

    store = str(tmp_path / "store_crash")
    v1 = _snap(spark, [(f"c{i}", f"o{i}", 1.0 * i) for i in range(40)])
    serving_upsert(spark, v1, store, n_buckets=N_BUCKETS)
    # v2 updates exactly one key; find that key's bucket and crash it
    v2 = _snap(
        spark,
        [(f"c{i}", f"o{i}", 1.0 * i if i != 3 else 999.0) for i in range(40)],
    )
    b = _rows(spark, [("c3", "o3")], "x").select(
        _bucket_expr(N_BUCKETS).alias("b")
    ).first()["b"]
    os.replace(
        os.path.join(store, f"bucket={b}"),
        os.path.join(store, f"._old_bucket={b}"),
    )

    changes = snapshot_diff(v1, v2, keys=SERVING_KEYS, compare_cols=["amount"])
    serving_apply_changes(spark, changes, v2, store, n_buckets=N_BUCKETS)
    got = sorted(
        (r["customer_id"], r["order_id"], r["amount"])
        for r in spark.read.parquet(store).collect()
    )
    assert got == sorted(tuple(r) for r in v2.collect()), (
        "unchanged keys sharing the crashed bucket must survive"
    )


def test_apply_changes_migrates_flat_store_first(spark, tmp_path):
    """A flat (never-bucketed) store — including one just restored by
    the migration-crash recovery — must be migrated to the bucketed
    layout before the change feed is applied; the old code read it
    assuming a 'bucket' column and threw."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.cdc import snapshot_diff
    from aws_kinesis_data_ingestion_restapi_spark.sinks import serving_apply_changes

    store = str(tmp_path / "store_flat")
    v1 = _snap(spark, [(f"c{i}", f"o{i}", 1.0 * i) for i in range(20)])
    v1.write.parquet(store)  # legacy flat layout, no bucket column
    v2 = _snap(
        spark,
        [(f"c{i}", f"o{i}", 1.0 * i if i != 2 else 77.0) for i in range(20)],
    )
    changes = snapshot_diff(v1, v2, keys=SERVING_KEYS, compare_cols=["amount"])
    serving_apply_changes(spark, changes, v2, store, n_buckets=N_BUCKETS)
    out = spark.read.parquet(store)
    assert "bucket" in out.columns, "store must come out bucketed"
    got = sorted(
        (r["customer_id"], r["order_id"], r["amount"]) for r in out.collect()
    )
    assert got == sorted(tuple(r) for r in v2.collect())


def test_upsert_reclaims_crashed_staging_litter(spark, tmp_path):
    """A run that dies between its staging write and the swap leaves a
    full merged copy under <store>._staging_<uuid> that no later run
    references — entry recovery must reclaim it or every crash leaks
    a store-sized directory."""
    store = str(tmp_path / "serving_lit")
    serving_upsert(
        spark, _rows(spark, [("c1", "o1")], "a"), store, n_buckets=N_BUCKETS
    )
    litter = store + "._staging_deadbeefcafe"
    os.makedirs(os.path.join(litter, "bucket=0"))
    with open(os.path.join(litter, "bucket=0", "junk"), "w") as f:
        f.write("x")
    serving_upsert(
        spark, _rows(spark, [("c2", "o2")], "b"), store, n_buckets=N_BUCKETS
    )
    assert not os.path.exists(litter)
    assert spark.read.parquet(store).count() == 2


def test_apply_changes_drops_fully_deleted_bucket(spark, tmp_path):
    """Deleting every key of a bucket removes its directory."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.cdc import snapshot_diff
    from aws_kinesis_data_ingestion_restapi_spark.sinks import serving_apply_changes

    store = str(tmp_path / "store")
    v1 = _snap(spark, [(f"c{i}", f"o{i}", 1.0) for i in range(12)])
    v2 = v1.limit(0)  # delete everything
    serving_upsert(spark, v1, store, n_buckets=N_BUCKETS)
    changes = snapshot_diff(v1, v2, keys=SERVING_KEYS, compare_cols=["amount"])
    serving_apply_changes(spark, changes, v2, store, n_buckets=N_BUCKETS)
    remaining = [
        e for e in os.listdir(store)
        if e.startswith("bucket=") and os.listdir(os.path.join(store, e))
    ]
    assert remaining == []


def test_upsert_recovers_from_crashed_swap_debris(spark, tmp_path):
    """A crash between _swap_buckets' two renames leaves a hidden
    ._old_bucket=K aside dir. The NEXT upsert touching that bucket
    must clear the debris and land the new values — and readers never
    see the aside (leading dot = hidden to Spark listing)."""
    import shutil

    store = str(tmp_path / "serving")
    keys = [(f"c{i}", f"o{i}") for i in range(50)]
    serving_upsert(spark, _rows(spark, keys, "pending"), store, n_buckets=N_BUCKETS)

    target = keys[3]
    b = _rows(spark, [target], "x").select(
        _bucket_expr(N_BUCKETS).alias("b")
    ).first()["b"]
    # simulate the crash window: the old bucket was renamed aside and
    # the process died before the cleanup
    src = os.path.join(store, f"bucket={b}")
    aside = os.path.join(store, f"._old_bucket={b}")
    shutil.copytree(src, aside)

    serving_upsert(spark, _rows(spark, [target], "shipped"), store,
                   n_buckets=N_BUCKETS)
    assert not os.path.exists(aside), "crash debris must be cleared"
    out = spark.read.parquet(store)
    assert out.count() == 50
    got = out.filter(
        (F.col("customer_id") == target[0]) & (F.col("order_id") == target[1])
    ).collect()
    assert len(got) == 1 and got[0]["status"] == "shipped"


def test_upsert_restores_bucket_lost_mid_swap(spark, tmp_path):
    """The OTHER crash window: the process died BETWEEN the two
    renames, so bucket=K is GONE and ._old_bucket=K holds its only
    rows. The next upsert must rename the aside back BEFORE reading —
    otherwise the pruned scan sees zero existing rows for K and every
    key not in the new batch is silently lost."""
    store = str(tmp_path / "serving")
    keys = [(f"c{i}", f"o{i}") for i in range(50)]
    serving_upsert(spark, _rows(spark, keys, "pending"), store,
                   n_buckets=N_BUCKETS)

    target = keys[3]
    b = _rows(spark, [target], "x").select(
        _bucket_expr(N_BUCKETS).alias("b")
    ).first()["b"]
    # simulate the mid-swap crash: dst renamed away, new dir never
    # landed — the aside is the bucket's ONLY copy
    src = os.path.join(store, f"bucket={b}")
    aside = os.path.join(store, f"._old_bucket={b}")
    os.replace(src, aside)

    serving_upsert(spark, _rows(spark, [target], "shipped"), store,
                   n_buckets=N_BUCKETS)
    assert not os.path.exists(aside)
    out = spark.read.parquet(store)
    assert out.count() == 50, "keys sharing the crashed bucket must survive"
    got = out.filter(
        (F.col("customer_id") == target[0]) & (F.col("order_id") == target[1])
    ).collect()
    assert len(got) == 1 and got[0]["status"] == "shipped"


def test_legacy_migration_restores_store_lost_mid_swap(spark, tmp_path):
    """A migration crash BETWEEN its two replaces leaves NOTHING at
    the store path and the whole flat store under ._aside_migrate.
    The next upsert must restore it (and then re-migrate) instead of
    bootstrapping a fresh store from the current batch."""
    store = str(tmp_path / "serving_legacy2")
    _rows(spark, [(f"c{i}", f"o{i}") for i in range(30)], "old").write.parquet(
        store
    )
    os.replace(store, store.rstrip("/") + "._aside_migrate")
    assert not os.path.exists(store)

    serving_upsert(spark, _rows(spark, [("c1", "o1")], "new"), store,
                   n_buckets=N_BUCKETS)
    assert not os.path.exists(store.rstrip("/") + "._aside_migrate")
    out = spark.read.parquet(store)
    assert out.count() == 30, "pre-crash rows must survive the recovery"
    assert out.filter(F.col("order_id") == "o1").first()["status"] == "new"
    assert "bucket" in out.columns


def test_legacy_migration_survives_stale_aside(spark, tmp_path):
    """The flat→bucketed migration swaps via rename-aside; a stale
    aside sibling from an earlier crashed migration must not block the
    next one, and every legacy row must survive the migration."""
    store = str(tmp_path / "serving_legacy")
    # legacy FLAT layout: plain parquet, no bucket= dirs
    _rows(spark, [(f"c{i}", f"o{i}") for i in range(30)], "old").write.parquet(store)
    os.makedirs(store.rstrip("/") + "._aside_migrate", exist_ok=True)
    with open(os.path.join(store.rstrip("/") + "._aside_migrate", "junk"), "w") as f:
        f.write("stale")

    serving_upsert(spark, _rows(spark, [("c1", "o1")], "new"), store,
                   n_buckets=N_BUCKETS)
    assert not os.path.exists(store.rstrip("/") + "._aside_migrate")
    out = spark.read.parquet(store)
    assert out.count() == 30
    assert out.filter(F.col("order_id") == "o1").first()["status"] == "new"
    assert "bucket" in out.columns  # migrated to the bucketed layout


def test_write_errors_batch_mode_empty_and_replay(spark, tmp_path):
    """bid-keyed quarantine: an empty batch writes an empty (readable)
    bid dir, and replaying a batch id REWRITES it instead of
    appending duplicates."""
    from aws_kinesis_data_ingestion_restapi_spark.sinks import write_errors

    base = str(tmp_path / "q")
    empty = _rows(spark, [], "ProcessingFailed")
    write_errors(empty, base, batch_id=0)
    two = _rows(spark, [("c1", "o1"), ("c2", "o2")], "ProcessingFailed")
    write_errors(two, base, batch_id=1)
    write_errors(two, base, batch_id=1)  # replay
    out = spark.read.parquet(os.path.join(base, "errors"))
    assert out.count() == 2
    assert sorted(r["bid"] for r in out.select("bid").collect()) == [1, 1]


def test_write_partitioned_orc_round_trip(spark, tmp_path):
    """format="orc" writes the same Hive layout with the same
    values — ORC is the built-in columnar alternative for
    Hive-ecosystem consumers; partition-directory pruning and footer
    statistics work the same way. Bad format names fail loudly."""
    import pytest
    from pyspark.sql import functions as F

    from aws_kinesis_data_ingestion_restapi_spark.sinks import write_partitioned

    df = spark.createDataFrame(
        [(f"o{i:05d}", ["ES", "US"][i % 2], 10.0 * i) for i in range(20)],
        ["order_id", "country", "amount"],
    )
    p = str(tmp_path / "orc_out")
    write_partitioned(
        df, p, partition_cols=["country"], mode="overwrite", format="orc"
    )
    back = spark.read.orc(p)
    assert back.count() == 20
    assert set(back.columns) == {"order_id", "country", "amount"}
    # partition pruning works on the ORC layout too
    es = back.filter(F.col("country") == "ES")
    assert es.count() == 10
    # directory-level pruning reaches the ORC scan (inputFiles() does
    # not reflect runtime pruning on this read path — assert the plan)
    from aws_kinesis_data_ingestion_restapi_spark.plans import (
        has_partition_filters,
    )

    assert has_partition_filters(es, "country")
    with pytest.raises(ValueError, match="not supported"):
        write_partitioned(df, p, format="avro")
