"""Durable-metastore form of K5 (the actual Glue-parity claim).

``create_external_tables`` issues real ``CREATE TABLE ... USING PARQUET
LOCATION`` DDL (catalog.py); against the default in-memory catalog that
DDL dies with the session. The reference's Glue registrations
(terraform/main.tf:731-776) are durable — so prove the same DDL is
durable here: two SEPARATE python processes (separate JVMs, separate
SparkSessions) share one Derby metastore; the first registers, the
second — a cold start — must still see the table, its partitions, and
prune on them.

Subprocesses, not in-process sessions: PySpark allows one JVM per
process and the suite's session fixture owns it; Derby also permits a
single connection, so serial processes are the faithful restart shape.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMMON = """
import os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

d = {d!r}
spark = (
    SparkSession.builder.master("local[4]")
    .appName("durable-catalog-{phase}")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalogImplementation", "hive")
    .config("spark.sql.warehouse.dir", os.path.join(d, "warehouse"))
    .config(
        "javax.jdo.option.ConnectionURL",
        "jdbc:derby:;databaseName={{}}/metastore_db;create=true".format(d),
    )
    .config("spark.ui.enabled", "false")
    .enableHiveSupport()
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
"""

_REGISTER = _COMMON + """
from aws_kinesis_data_ingestion_restapi_spark.catalog import create_external_tables

orders_dir = os.path.join(d, "tables", "orders")
df = spark.createDataFrame(
    [("o%05d" % i, "2024-01-0%d" % (i % 9 + 1), "pending", "user%04d" % (i % 3))
     for i in range(30)],
    "order_id string, order_date string, status string, customer_id string",
)
df.write.partitionBy("customer_id").mode("overwrite").parquet(orders_dir)
out = create_external_tables(spark, os.path.join(d, "tables"))
assert "orders" in out, out
print("REGISTERED", out["orders"].count())
spark.stop()
"""

_RESTART = _COMMON + """
# cold start: no registration calls — everything must come from the metastore
tables = [t.name for t in spark.catalog.listTables()]
assert "orders" in tables, tables
n = spark.table("orders").count()
parts = spark.sql("SHOW PARTITIONS orders").count()
plan = (
    spark.table("orders")
    .filter("customer_id = 'user0001'")
    ._jdf.queryExecution().executedPlan().toString()
)
assert "PartitionFilters" in plan and "customer_id" in plan, plan[:2000]
pruned = spark.table("orders").filter("customer_id = 'user0001'").count()
print("RESTART", n, parts, pruned)
spark.stop()
"""


def _run(code: str) -> str:
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    return proc.stdout


def test_external_tables_survive_session_restart(tmp_path):
    d = str(tmp_path)
    out1 = _run(_REGISTER.format(repo=REPO, d=d, phase="register"))
    assert "REGISTERED 30" in out1, out1[-2000:]
    # the metastore files must exist on disk between sessions
    assert os.path.isdir(os.path.join(d, "metastore_db"))
    out2 = _run(_RESTART.format(repo=REPO, d=d, phase="restart"))
    # 30 rows, 3 customer_id partitions, 10 rows for the pruned customer
    assert "RESTART 30 3 10" in out2, out2[-2000:]
