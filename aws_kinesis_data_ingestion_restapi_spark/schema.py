"""Canonical schemas for the order-event pipeline.

The single source record type is one nested JSON document per order,
defined by the reference's producer
(``python_post_producer/python_producer.py:55-93``) and consumed
field-by-field in every Lambda. The four derived relational tables have
fixed, declared schemas (the Glue catalog declarations in
``terraform/main.tf:755-774, 956-985, 1168-1197, 1379-1403``).

NOTE the ``purchaise_details`` field name: the typo is load-bearing in
the reference (every consumer reads ``payload['purchaise_details']``,
e.g. ``lambda_purchase_details_transformation/lambda_function.py:33-36``)
and is preserved here for event-shape fidelity. The *derived table* is
spelled correctly (``purchase_details``), as in the reference.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Transport envelope (producer.py:100-108; API Gateway maps it 1:1 into a
# Kinesis PutRecord, terraform/main.tf:109-118). `data` is base64 JSON.
# ---------------------------------------------------------------------------
ENVELOPE_SCHEMA = StructType(
    [
        StructField("StreamName", StringType()),
        StructField("PartitionKey", StringType()),
        StructField("Data", StringType()),  # base64-encoded JSON event
    ]
)

SHIPPING_ADDRESS_STRUCT = StructType(
    [
        StructField("street", StringType()),
        StructField("city", StringType()),
        StructField("state", StringType()),
        StructField("zip", StringType()),
        StructField("country", StringType()),
    ]
)

PURCHAISE_DETAILS_STRUCT = StructType(
    [
        StructField("payment_type", StringType()),
        StructField("amount", DoubleType()),
        StructField("currency", StringType()),
        StructField("instalments", IntegerType()),
    ]
)

ITEM_DETAILS_STRUCT = StructType(
    [
        StructField("color", StringType()),
        StructField("size", StringType()),
    ]
)

PRODUCT_STRUCT = StructType(
    [
        StructField("product_id", StringType()),
        StructField("name", StringType()),
        StructField("quantity", IntegerType()),
        StructField("item_details", ITEM_DETAILS_STRUCT),
    ]
)

# The canonical order-event type (producer.py:55-93).
ORDER_EVENT_SCHEMA = StructType(
    [
        StructField("customer_id", StringType()),
        StructField("order_id", StringType()),
        StructField("order_date", StringType()),  # raw ISO-8601 + trailing "Z"
        StructField("status", StringType()),
        StructField("shipping_address", SHIPPING_ADDRESS_STRUCT),
        StructField("purchaise_details", PURCHAISE_DETAILS_STRUCT),
        StructField("product_details", ArrayType(PRODUCT_STRUCT)),
    ]
)

# ---------------------------------------------------------------------------
# Derived table schemas (Glue declarations).
# ---------------------------------------------------------------------------

# terraform/main.tf:755-774; produced by lambda_orders_transformation:35-40.
ORDERS_TABLE_SCHEMA = StructType(
    [
        StructField("customer_id", StringType()),
        StructField("order_id", StringType()),
        StructField("order_date", DateType()),
        StructField("status", StringType()),
    ]
)

# terraform/main.tf:956-985; lambda_product_details_tranformation:36-43.
PRODUCT_DETAILS_TABLE_SCHEMA = StructType(
    [
        StructField("product_id", StringType()),
        StructField("order_id", StringType()),
        StructField("name", StringType()),
        StructField("quantity", IntegerType()),
        StructField("color", StringType()),
        StructField("size", StringType()),
    ]
)

# terraform/main.tf:1168-1197; lambda_shipping_addresses_transformation:32-39.
SHIPPING_ADDRESSES_TABLE_SCHEMA = StructType(
    [
        StructField("order_id", StringType()),
        StructField("country", StringType()),
        StructField("state", StringType()),
        StructField("city", StringType()),
        StructField("street", StringType()),
        StructField("zip", StringType()),
    ]
)

# terraform/main.tf:1379-1403; lambda_purchase_details_transformation:31-37.
PURCHASE_DETAILS_TABLE_SCHEMA = StructType(
    [
        StructField("order_id", StringType()),
        StructField("payment_type", StringType()),
        StructField("amount", DoubleType()),
        StructField("currency", StringType()),
        StructField("instalments", IntegerType()),
    ]
)

# Serving view (DynamoDB analog, terraform/main.tf:347-370): the six
# top-level event fields excluding `purchaise_details`
# (lambda_kinesis_consumer/lambda_function.py:33-40); floats coerced to
# Decimal on this path (consumer:46) — there are none among the kept
# fields, but the type policy is recorded here for extension columns.
SERVING_TABLE_SCHEMA = StructType(
    [
        StructField("customer_id", StringType()),
        StructField("order_id", StringType()),
        StructField("order_date", StringType()),
        StructField("status", StringType()),
        StructField("shipping_address", SHIPPING_ADDRESS_STRUCT),
        StructField("product_details", ArrayType(PRODUCT_STRUCT)),
    ]
)

SERVING_DECIMAL_TYPE = DecimalType(10, 2)

# Hive-style partition layouts per derived table (the S3 prefixes in
# terraform/main.tf:675, 883, 1095, 1306). Each table materializes only
# a SUBSET of the partition keys its lambda computes (SURVEY §2 K2).
TABLE_PARTITIONS: dict[str, list[str]] = {
    "orders": ["customer_id"],
    "product_details": ["year"],
    "shipping_addresses": ["country"],
    "purchase_details": ["year", "month"],
}

DERIVED_TABLE_SCHEMAS: dict[str, StructType] = {
    "orders": ORDERS_TABLE_SCHEMA,
    "product_details": PRODUCT_DETAILS_TABLE_SCHEMA,
    "shipping_addresses": SHIPPING_ADDRESSES_TABLE_SCHEMA,
    "purchase_details": PURCHASE_DETAILS_TABLE_SCHEMA,
}

# Driver-provided TPC-H-ish testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
