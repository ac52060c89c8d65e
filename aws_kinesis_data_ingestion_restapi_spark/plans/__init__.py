"""Physical-plan inspection utilities (scale guardrails).

The reference delegates all planning to Athena/Presto (SURVEY §3.4);
this engine delegates to Catalyst — but at 100 TB the difference
between a good plan and a bad one (filter pushed into the parquet
scan vs. evaluated after a full read; broadcast vs. shuffled join of
a small dim) is the whole game. These helpers make plan properties
ASSERTABLE, so tests lock in the plan shape the same way they lock in
result values.
"""

from aws_kinesis_data_ingestion_restapi_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    has_partition_filters,
    pushed_filters,
    read_schema_columns,
    scan_count,
    whole_stage_codegen_ids,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_partition_filters",
    "pushed_filters",
    "read_schema_columns",
    "scan_count",
    "whole_stage_codegen_ids",
]
