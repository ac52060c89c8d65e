"""The analytics query surface: the reference's five Athena queries.

Each query exists twice, by design (SURVEY §2.4 — queries arrive as raw
SQL text in the reference, so the engine must accept both forms):

- a DataFrame function (``q_*``) — declarative, Catalyst-optimized;
- SQL text (``REFERENCE_SQL``) runnable via ``spark.sql`` once the
  derived tables are registered (catalog.register_derived_tables).

Table names are underscore-normalized (the reference's hyphenated
``purchase-details-ingestion-dev-table`` etc. only parse because Athena
is lenient — SURVEY §2.4).

Scale notes: the GROUP BYs are partial+final hash aggregates (Spark
default); the ORDER BY ... DESC stays a distributed range-partitioned
sort (never collected); the order_id joins let Catalyst/AQE pick
broadcast vs sort-merge — at 100 TB both sides are big, so the engine
leaves the strategy to AQE rather than forcing a broadcast hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def q_total_sales_per_country(
    purchase_details: DataFrame, shipping_addresses: DataFrame
) -> DataFrame:
    """TotalSalesPerCountry.sql: join on order_id, SUM(amount) per
    country, descending (Q2+Q4+Q6)."""
    return (
        purchase_details.join(shipping_addresses, "order_id", "inner")
        .groupBy("country")
        .agg(F.sum("amount").alias("total_sales"))
        .orderBy(F.desc("total_sales"))
    )


def q_average_order_value(purchase_details: DataFrame) -> DataFrame:
    """GetAverageOrderValue.sql: global AVG(amount) → 1 row (Q5)."""
    return purchase_details.agg(F.avg("amount").alias("average_order_value"))


def q_total_income_per_payment_method(purchase_details: DataFrame) -> DataFrame:
    """TotalIncomePerPaymentMethod.sql: SUM(amount) per payment_type,
    descending (Q4+Q6)."""
    return (
        purchase_details.groupBy("payment_type")
        .agg(F.sum("amount").alias("total_income"))
        .orderBy(F.desc("total_income"))
    )


def q_most_sales_products(product_details: DataFrame) -> DataFrame:
    """MostSalesProducts.sql: SUM(quantity) grouped by NAME — not
    product_id; same-named products merge (Q8, semantics preserved)."""
    return (
        product_details.groupBy("name")
        .agg(F.sum("quantity").alias("total_quantity_sold"))
        .orderBy(F.desc("total_quantity_sold"))
    )


def q_order_and_client_details(
    orders: DataFrame, shipping_addresses: DataFrame
) -> DataFrame:
    """OrderAndClientDetails.sql: orders ⋈ shipping_addresses on
    order_id, 9-column projection (Q3)."""
    return orders.join(shipping_addresses, "order_id", "inner").select(
        "customer_id", "order_id", "order_date", "status",
        "country", "state", "city", "street", "zip",
    )


# SQL forms (spark.sql passthrough surface) over the registered
# underscore table names. Verbatim semantics of athena_sql_query_examples/.
REFERENCE_SQL: dict[str, str] = {
    "total_sales_per_country": """
        SELECT sa.country, SUM(pd.amount) AS total_sales
        FROM purchase_details pd
        JOIN shipping_addresses sa ON pd.order_id = sa.order_id
        GROUP BY sa.country
        ORDER BY total_sales DESC
    """,
    "average_order_value": """
        SELECT AVG(pd.amount) AS average_order_value
        FROM purchase_details pd
    """,
    "total_income_per_payment_method": """
        SELECT pd.payment_type, SUM(pd.amount) AS total_income
        FROM purchase_details pd
        GROUP BY pd.payment_type
        ORDER BY total_income DESC
    """,
    "most_sales_products": """
        SELECT p.name, SUM(p.quantity) AS total_quantity_sold
        FROM product_details p
        GROUP BY p.name
        ORDER BY total_quantity_sold DESC
    """,
    "order_and_client_details": """
        SELECT o.customer_id, o.order_id, o.order_date, o.status,
               sa.country, sa.state, sa.city, sa.street, sa.zip
        FROM orders o
        JOIN shipping_addresses sa ON o.order_id = sa.order_id
    """,
}
