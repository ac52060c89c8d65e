"""Sources: order-event generator, envelope decode, testdata loaders."""

from aws_kinesis_data_ingestion_restapi_spark.sources.events import (
    decode_envelope,
    read_envelope_json,
    read_envelope_stream,
)
from aws_kinesis_data_ingestion_restapi_spark.sources.generator import (
    generate_order_events,
    order_events_df,
    envelope_records,
)
from aws_kinesis_data_ingestion_restapi_spark.sources.tables import (
    load_table,
    register_testdata,
)

__all__ = [
    "decode_envelope",
    "read_envelope_json",
    "read_envelope_stream",
    "generate_order_events",
    "order_events_df",
    "envelope_records",
    "load_table",
    "register_testdata",
]
