"""Seeded synthetic order-event generator (test fixtures).

Replicates the value domains of the reference's load generator
(``python_post_producer/python_producer.py``), per FIXTURES.md:

- customer pool: 30 fixed ids (producer.py:25-33)
- order_id: ``"o" + zfill(5)`` of uniform int 0..99999 (producer.py:57)
- order_date: ISO-8601 datetime + literal ``"Z"`` suffix (producer.py:44,58)
- status: constant ``"pending"`` (producer.py:59)
- payment_type ∈ {debit_card, credit_card, cash, coupon, wallet} (:18)
- amount = round(uniform(10,100),2); currency "USD"; instalments 1..13
- exactly 2 products per order (producer.py:73-92); product_id =
  ``"p" + zfill(5)`` of uniform int 0..999999 (6-digit values exceed the
  pad → ids are 6-7 chars, non-uniform width — kept deliberately)
- size ∈ {XXS,XS,S,M,L,XL,XXL,XXXL} (producer.py:11); quantity 1..5

Driver-side generation is fine here: fixtures are small (tests). The
100 TB-scale ingest path reads real streams; see sources/events.py.
"""

from __future__ import annotations

import base64
import json
import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from aws_kinesis_data_ingestion_restapi_spark.schema import ORDER_EVENT_SCHEMA

CUSTOMER_POOL = [f"user{3542 + i * 58}" for i in range(30)]  # 30 fixed ids
SIZES = ["XXS", "XS", "S", "M", "L", "XL", "XXL", "XXXL"]
PAYMENT_TYPES = ["debit_card", "credit_card", "cash", "coupon", "wallet"]
COLORS = ["red", "blue", "green", "black", "white", "amber", "teal", "plum"]
PRODUCT_NAMES = [
    "lamp", "chair", "table", "mug", "notebook", "pen", "monitor",
    "keyboard", "cable", "stand", "bottle", "bag", "shirt", "hat",
]
COUNTRIES = ["USA", "Spain", "France", "Germany", "Japan", "Brazil", "India", "Canada"]
STATES = ["CA", "NY", "TX", "WA", "FL", "IL", "OR", "MA"]
STREET_SUFFIXES = ["St", "Ave", "Blvd", "Ln", "Dr", "Way"]

BASE_DATE = datetime(2024, 7, 1, 0, 0, 0)  # fixed month, like producer's this-month dates


def generate_order_events(
    n: int,
    seed: int = 42,
    unique_order_ids: bool = True,
) -> list[dict]:
    """Generate ``n`` order-event dicts, deterministically from ``seed``.

    ``unique_order_ids=True`` widens the 5-digit id space to avoid
    collisions in small fixtures (FIXTURES.md §7 allows this); set False
    to reproduce the reference's collision-possible behavior exactly.
    """
    rng = random.Random(seed)
    events = []
    for i in range(n):
        if unique_order_ids:
            order_id = "o" + str(i).zfill(5)
        else:
            order_id = "o" + str(rng.randint(0, 99999)).zfill(5)
        ts = BASE_DATE + timedelta(
            days=rng.randint(0, 27), hours=rng.randint(0, 23),
            minutes=rng.randint(0, 59), seconds=rng.randint(0, 59),
        )
        products = []
        for _ in range(2):  # exactly 2 per order (producer.py:73-92)
            products.append(
                {
                    "product_id": "p" + str(rng.randint(0, 999999)).zfill(5),
                    "name": rng.choice(PRODUCT_NAMES),
                    "quantity": rng.randint(1, 5),
                    "item_details": {
                        "color": rng.choice(COLORS),
                        "size": rng.choice(SIZES),
                    },
                }
            )
        events.append(
            {
                "customer_id": rng.choice(CUSTOMER_POOL),
                "order_id": order_id,
                "order_date": ts.isoformat() + "Z",
                "status": "pending",
                "shipping_address": {
                    "street": f"{rng.randint(1, 9999)} {rng.choice(PRODUCT_NAMES).title()} {rng.choice(STREET_SUFFIXES)}",
                    "city": f"City{rng.randint(1, 50)}",
                    "state": rng.choice(STATES),
                    "zip": str(rng.randint(10000, 99999)),
                    "country": rng.choice(COUNTRIES),
                },
                "purchaise_details": {  # typo is load-bearing (SURVEY §1.1)
                    "payment_type": rng.choice(PAYMENT_TYPES),
                    "amount": round(rng.uniform(10, 100), 2),
                    "currency": "USD",
                    "instalments": rng.randint(1, 13),
                },
                "product_details": products,
            }
        )
    return events


def order_events_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Order events as a typed DataFrame (bypasses the transport layer)."""
    return spark.createDataFrame(generate_order_events(n, seed), ORDER_EVENT_SCHEMA)


def envelope_records(
    n: int,
    seed: int = 42,
    stream_name: str = "ingestion-dev",
    partition_key: str = "test-partition-01",
) -> list[dict]:
    """Events wrapped in the transport envelope (producer.py:100-108):
    JSON → base64 → {StreamName, PartitionKey, Data}. The constant
    partition key mirrors producer.py:105.
    """
    return [
        {
            "StreamName": stream_name,
            "PartitionKey": partition_key,
            "Data": base64.b64encode(json.dumps(e).encode("utf-8")).decode("ascii"),
        }
        for e in generate_order_events(n, seed)
    ]
