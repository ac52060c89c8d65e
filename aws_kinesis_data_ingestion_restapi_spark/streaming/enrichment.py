"""Stream-static enrichment join.

The reference pipeline denormalizes each order event against customer
data carried INSIDE the envelope (lambda_orders_transformation flattens
``shipping_address``/``purchaise_details`` — SURVEY §2.2 T5-T7); the
engine additionally supports the inverse, cluster-native shape: a
lean event stream enriched at read time against a catalog dimension.

Scale design: Structured Streaming re-plans the static side of a
stream-static join on every micro-batch, so with ``F.broadcast`` on
the dim the stream side never shuffles — the canonical pattern for
enriching a high-volume event stream against a small dimension
(customer, nation, product). The dim is re-read per batch, which is
what you want (slowly-changing dims pick up updates between batches);
pin it with ``.cache()`` only if staleness is acceptable. For dims too
large to broadcast, pre-bucket both sides on the join key instead
(operators/scale.py) so the per-batch join is co-located.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Broadcast stream-static equi-join: each micro-batch of
    ``stream`` is joined against the static ``dim`` without shuffling
    the stream side. ``how='left'`` keeps unmatched events (enrichment
    columns null) — use it when the dim may lag the stream."""
    return stream.join(F.broadcast(dim), on=on, how=how)
