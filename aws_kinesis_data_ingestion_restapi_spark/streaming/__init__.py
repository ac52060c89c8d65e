"""Structured Streaming layer: the whole reference architecture as ONE query.

The reference fans out one Kinesis stream to five consumers (4 Firehose
delivery streams + 1 DynamoDB Lambda, terraform/main.tf:658, 867, 1079,
1290, 255-279), each re-reading the stream. Here the same topology is a
single Structured Streaming query whose ``foreachBatch`` reads each
micro-batch ONCE and writes all six outputs (4 tables + serving upsert
+ error quarantine) — strictly less I/O at any scale.
"""

from aws_kinesis_data_ingestion_restapi_spark.streaming.observability import (
    AuditListener,
    with_audit_metrics,
)
from aws_kinesis_data_ingestion_restapi_spark.streaming.pipeline import (
    IngestionPipeline,
    run_pipeline_once,
    tumbling_order_stats,
)

__all__ = [
    "AuditListener",
    "IngestionPipeline",
    "run_pipeline_once",
    "tumbling_order_stats",
    "with_audit_metrics",
]
