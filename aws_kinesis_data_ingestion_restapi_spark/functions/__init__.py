"""Engine-level column functions (exact aggregation, portable hashing)."""

from aws_kinesis_data_ingestion_restapi_spark.functions.exact import (
    charge_expr,
    davg,
    disc_price_expr,
    dsum,
)

__all__ = ["dsum", "davg", "disc_price_expr", "charge_expr"]
