"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in aws_kinesis_data_ingestion_restapi_spark/
(registry.py maps names → Spark fns + oracle SQL); this module is the
thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_kinesis_data_ingestion_restapi_spark.registry import (  # noqa: E402
    ORACLE_SQL,
    QUERY_FNS,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the reference's headline analytics query (TotalSalesPerCountry)
    through the full pipeline: TPC-H tables → nested order events →
    flatten/explode transforms → join + exact aggregate + sort.
    """
    return QUERY_FNS["ref_total_sales_per_country"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    genuinely non-SQL-expressible ops → driver does rows-only check).
    """
    return dict(ORACLE_SQL)
