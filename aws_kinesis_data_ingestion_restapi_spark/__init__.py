"""aws_kinesis_data_ingestion_restapi_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference pipeline ``Andresmup/aws-kinesis-data-ingestion-restapi``
(an AWS API Gateway → Kinesis → {Lambda→DynamoDB, 4× Firehose→S3
Parquet} → Athena stack), re-expressed Spark-first:

- one Structured-Streaming (or batch) source of nested order-event JSON,
- four derived relational tables (projection / struct-flatten / explode)
  written as partitioned Parquet,
- a keyed idempotent-upsert serving view (``foreachBatch`` merge),
- the reference's five analytics queries (joins, hash aggregates,
  global aggregates, descending sorts) as DataFrame + SQL,
- plus large-scale training-data-pipeline extensions: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard), similarity search over
  embeddings, text analysis, and multimodal column plumbing.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy and AQE; the design targets a multi-executor
cluster at 100 TB even though tests run on local[*].
"""

from aws_kinesis_data_ingestion_restapi_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
