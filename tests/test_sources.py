"""Envelope decode (S4), corrupt-record routing (E1), generator invariants."""

from __future__ import annotations

import base64
import json

from aws_kinesis_data_ingestion_restapi_spark.schema import ENVELOPE_SCHEMA
from aws_kinesis_data_ingestion_restapi_spark.sources.events import (
    decode_envelope,
    split_corrupt,
)
from aws_kinesis_data_ingestion_restapi_spark.sources.generator import (
    envelope_records,
    generate_order_events,
)


def test_generator_deterministic_and_in_domain():
    a = generate_order_events(50, seed=7)
    b = generate_order_events(50, seed=7)
    assert a == b
    for ev in a:
        assert ev["order_date"].endswith("Z")
        assert ev["status"] == "pending"
        assert len(ev["product_details"]) == 2
        pd = ev["purchaise_details"]
        assert 10.0 <= pd["amount"] <= 100.0
        assert round(pd["amount"], 2) == pd["amount"]
        assert 1 <= pd["instalments"] <= 13
        for p in ev["product_details"]:
            assert 1 <= p["quantity"] <= 5


def test_envelope_roundtrip(spark):
    records = envelope_records(25, seed=3)
    env_df = spark.createDataFrame(records, ENVELOPE_SCHEMA)
    decoded = decode_envelope(env_df)
    good, bad = split_corrupt(decoded)
    assert bad.count() == 0
    rows = {r["order_id"]: r for r in good.collect()}
    originals = generate_order_events(25, seed=3)
    assert len(rows) == 25
    ev = originals[0]
    row = rows[ev["order_id"]]
    assert row["customer_id"] == ev["customer_id"]
    assert row["purchaise_details"]["payment_type"] == ev["purchaise_details"]["payment_type"]
    assert row["product_details"][1]["item_details"]["size"] == \
        ev["product_details"][1]["item_details"]["size"]


def test_corrupt_records_quarantined_not_fatal(spark):
    records = envelope_records(5, seed=1)
    # one non-JSON payload and one JSON missing the key fields
    records.append({"StreamName": "s", "PartitionKey": "k",
                    "Data": base64.b64encode(b"not json at all").decode()})
    records.append({"StreamName": "s", "PartitionKey": "k",
                    "Data": base64.b64encode(json.dumps({"foo": 1}).encode()).decode()})
    env_df = spark.createDataFrame(records, ENVELOPE_SCHEMA)
    good, bad = split_corrupt(decode_envelope(env_df))
    assert good.count() == 5
    bad_rows = bad.collect()
    assert len(bad_rows) == 2
    assert all(r["result"] == "ProcessingFailed" for r in bad_rows)


def test_transport_corrupt_record_keeps_original_payload(spark):
    """Base64-corrupt transport records decode to NULL; the quarantine
    row must carry the ORIGINAL Data field — a NULL raw_payload would
    quarantine bytes nobody can inspect or replay."""
    records = envelope_records(2, seed=7)
    records.append(
        {"StreamName": "s", "PartitionKey": "k", "Data": "!!!not-base64!!!"}
    )
    env_df = spark.createDataFrame(records, ENVELOPE_SCHEMA)
    good, bad = split_corrupt(decode_envelope(env_df))
    assert good.count() == 2
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert bad_rows[0]["raw_payload"] == "!!!not-base64!!!"
