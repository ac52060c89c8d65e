"""Operators: the four table derivations + extension operators."""

from aws_kinesis_data_ingestion_restapi_spark.operators.transforms import (
    parse_event_timestamp,
    with_partition_columns,
    to_orders,
    to_product_details,
    to_shipping_addresses,
    to_purchase_details,
    to_serving_items,
    derive_all_tables,
)

__all__ = [
    "parse_event_timestamp",
    "with_partition_columns",
    "to_orders",
    "to_product_details",
    "to_shipping_addresses",
    "to_purchase_details",
    "to_serving_items",
    "derive_all_tables",
]
