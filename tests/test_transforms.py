"""Unit tests for the four table derivations (SURVEY §2.2)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark.operators.transforms import (
    derive_all_tables,
    parse_event_timestamp,
    to_orders,
    to_product_details,
    to_purchase_details,
    to_serving_items,
    to_shipping_addresses,
    with_partition_columns,
)
from aws_kinesis_data_ingestion_restapi_spark.schema import (
    ORDER_EVENT_SCHEMA,
    ORDERS_TABLE_SCHEMA,
    PRODUCT_DETAILS_TABLE_SCHEMA,
    PURCHASE_DETAILS_TABLE_SCHEMA,
    SHIPPING_ADDRESSES_TABLE_SCHEMA,
)


def test_timestamp_parse_strips_all_trailing_z(spark):
    # the reference uses rstrip("Z"): ALL trailing Z's removed (orders lambda:24)
    df = spark.createDataFrame(
        [("c1", "o1", "2024-07-15T10:30:00ZZ", "pending", None, None, None)],
        ORDER_EVENT_SCHEMA,
    )
    row = parse_event_timestamp(df).select("_event_ts").first()
    assert row["_event_ts"] == datetime.datetime(2024, 7, 15, 10, 30, 0)


def test_partition_columns_zero_padded(spark):
    df = spark.createDataFrame(
        [("c1", "o1", "2024-07-05T03:08:09Z", "pending", None, None, None)],
        ORDER_EVENT_SCHEMA,
    )
    row = with_partition_columns(parse_event_timestamp(df)).first()
    assert (row["year"], row["month"], row["day"], row["hour"]) == (
        "2024", "07", "05", "03",
    )


def test_orders_schema_and_date_cast(events_df, events_raw):
    orders = to_orders(events_df)
    assert orders.schema == ORDERS_TABLE_SCHEMA
    assert orders.count() == len(events_raw)  # 1 row per event
    got = {r["order_id"]: r for r in orders.collect()}
    for ev in events_raw[:20]:
        row = got[ev["order_id"]]
        expected_date = datetime.date.fromisoformat(ev["order_date"][:10])
        assert row["order_date"] == expected_date  # time-of-day dropped (T3)
        assert row["customer_id"] == ev["customer_id"]
        assert row["status"] == "pending"


def test_product_details_explode(events_df, events_raw):
    pd_tbl = to_product_details(events_df)
    assert pd_tbl.schema == PRODUCT_DETAILS_TABLE_SCHEMA
    # exactly-2-products invariant (FIXTURES §7)
    assert pd_tbl.count() == 2 * len(events_raw)
    per_order = pd_tbl.groupBy("order_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_order] == [2]
    # nested item_details pulled up correctly
    ev = events_raw[0]
    rows = pd_tbl.filter(F.col("order_id") == ev["order_id"]).collect()
    got = {(r["product_id"], r["name"], r["quantity"], r["color"], r["size"]) for r in rows}
    want = {
        (p["product_id"], p["name"], p["quantity"],
         p["item_details"]["color"], p["item_details"]["size"])
        for p in ev["product_details"]
    }
    assert got == want


def test_shipping_addresses_flatten(events_df, events_raw):
    sa = to_shipping_addresses(events_df)
    assert sa.schema == SHIPPING_ADDRESSES_TABLE_SCHEMA
    assert sa.count() == len(events_raw)
    ev = events_raw[0]
    row = sa.filter(F.col("order_id") == ev["order_id"]).first()
    for field in ("country", "state", "city", "street", "zip"):
        assert row[field] == ev["shipping_address"][field]


def test_purchase_details_flatten_reads_typo_field(events_df, events_raw):
    pdet = to_purchase_details(events_df)
    assert pdet.schema == PURCHASE_DETAILS_TABLE_SCHEMA
    ev = events_raw[0]
    row = pdet.filter(F.col("order_id") == ev["order_id"]).first()
    src = ev["purchaise_details"]
    assert row["payment_type"] == src["payment_type"]
    assert abs(row["amount"] - src["amount"]) < 1e-9
    assert row["currency"] == "USD"
    assert row["instalments"] == src["instalments"]


def test_serving_items_drop_purchaise_details(events_df):
    item = to_serving_items(events_df)
    assert "purchaise_details" not in item.columns
    assert set(item.columns) == {
        "customer_id", "order_id", "order_date", "status",
        "shipping_address", "product_details",
    }


def test_derive_all_tables_partition_columns(events_df):
    tables = derive_all_tables(events_df, with_partitions=True)
    assert "year" in tables["product_details"].columns
    assert {"year", "month"} <= set(tables["purchase_details"].columns)
    # orders/shipping partition on existing data columns
    assert "customer_id" in tables["orders"].columns
    assert "country" in tables["shipping_addresses"].columns
