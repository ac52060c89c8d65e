"""Connected components over pair graphs (dedup clustering).

Near-dup operators (MinHash LSH, SimHash, n-gram Jaccard) emit PAIRS;
production dedup needs CLUSTERS — every document labeled with a
canonical component id so "keep one per cluster" is a groupBy away.
This is min-label propagation expressed in DataFrame ops: each node
repeatedly adopts the smallest label among itself and its neighbors
until fixpoint. The component id is therefore the smallest doc_id in
the component — deterministic, engine-independent, and exactly what a
DuckDB recursive CTE computes for the oracle.

Scale shape: each iteration is one equi-join (edges ⋈ labels, shuffled
on the node key) plus one aggregate — no driver-side graph, no
adjacency materialization beyond the edge list. Iteration count is
bounded by the component diameter; near-dup graphs are clique-like
(diameter 1-3), so the loop converges in 2-4 rounds. For adversarial
long-chain graphs the alternating large-star/small-star variant
(Kiveris et al., SoCC'14) converges in O(log n) rounds — the loop
below is the simple form, with ``max_iter`` as the guard rail.
``localCheckpoint`` truncates the lineage each round so the plan does
not grow with iterations (the standard iterative-DataFrame trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Label every node with its component's minimum node id.

    ``pairs``: two-column DataFrame of undirected edges (any names;
    taken positionally). ``nodes``: optional one-column universe —
    nodes with no edges become singleton components of themselves
    (pass the full doc_id set for dedup so every document gets a
    label). Returns (node, component).

    Min-label propagation needs ~graph-diameter rounds; if the loop
    exhausts ``max_iter`` before fixpoint the labels are PARTIAL, so
    that case raises rather than returning plausible-looking wrong
    components (near-dup graphs have tiny diameters — clusters of
    mutual near-copies — so 20 rounds is generous there; raise
    ``max_iter`` for long-chain graphs).
    """
    a, b = pairs.columns[:2]
    edges = pairs.select(
        F.col(a).alias("u"), F.col(b).alias("v")
    ).union(pairs.select(F.col(b).alias("u"), F.col(a).alias("v")))
    edges = edges.distinct().localCheckpoint(eager=True)

    universe = edges.select(F.col("u").alias("node"))
    if nodes is not None:
        universe = universe.union(
            nodes.select(F.col(nodes.columns[0]).alias("node"))
        )
    labels = universe.distinct().select(
        "node", F.col("node").alias("component")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("_nbr"))
        )
        updated = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                "component",
                F.least(
                    F.col("component"), F.coalesce("_nbr", F.col("component"))
                ).alias("_new"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.filter(F.col("_new") < F.col("component")).count()
        labels = updated.select("node", F.col("_new").alias("component"))
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within max_iter={max_iter} "
        f"rounds (last round still relabeled {changed} nodes); labels would "
        "be partially propagated — raise max_iter for long-chain graphs"
    )
