"""Catalog registration (K5): the Glue-catalog analog.

The reference declares 4 EXTERNAL Parquet tables over S3 prefixes
(terraform/main.tf:731-776, 932-987, 1144-1199, 1355-1405). Here each
derived table directory is registered in the Spark session catalog so
the SQL surface (`spark.sql`) resolves the same underscore table names
the rebuild uses (the reference's hyphenated Athena names like
``purchase-details-ingestion-dev-table`` are normalized — SURVEY §2.4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def register_parquet_table(spark: SparkSession, name: str, path: str) -> DataFrame:
    """Register a parquet directory as a temp view (partition columns
    are discovered from the Hive-style layout and ARE queryable —
    unlike the reference's Glue decls, SURVEY §1.2)."""
    df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    return df


def register_derived_tables(spark: SparkSession, base_path: str) -> dict[str, DataFrame]:
    """Register all four derived tables written under ``base_path``."""
    out: dict[str, DataFrame] = {}
    for name in ("orders", "product_details", "shipping_addresses", "purchase_details"):
        path = os.path.join(base_path, name)
        if os.path.exists(path):
            out[name] = register_parquet_table(spark, name, path)
    return out
