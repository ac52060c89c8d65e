from __future__ import annotations

import os

import pytest

# Small-local session for tests: tiny frames don't benefit from 32
# threads, and fewer partitions means far less per-job overhead.
os.environ.setdefault("SPARK_MASTER", "local[8]")

from aws_kinesis_data_ingestion_restapi_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="tests",
        shuffle_partitions=4,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def events_df(spark):
    from aws_kinesis_data_ingestion_restapi_spark.sources.generator import order_events_df

    return order_events_df(spark, 200, seed=42).cache()


@pytest.fixture(scope="session")
def events_raw():
    from aws_kinesis_data_ingestion_restapi_spark.sources.generator import generate_order_events

    return generate_order_events(200, seed=42)
