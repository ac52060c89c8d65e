"""Loaders for the driver-provided TPC-H-ish testdata (TESTDATA.md).

Parquet scans with Catalyst pushdown; ``register_testdata`` exposes all
tables as temp views so the SQL surface (``spark.sql``) works against
the same names the DuckDB oracle uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from aws_kinesis_data_ingestion_restapi_spark.schema import TESTDATA_TABLES
from aws_kinesis_data_ingestion_restapi_spark.session import ensure_runtime_confs

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_runtime_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the frames."""
    frames: dict[str, DataFrame] = {}
    ensure_runtime_confs(spark)
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        frames[name] = df
    return frames
