"""Iterative graph operators: connected components over near-dup pair graphs.

The dedup pipeline's final step: pairwise near-duplicate edges (from
MinHash-LSH / SimHash / embedding-cosine) must be grouped into clusters so
one canonical document per cluster survives. This generalizes the
reference's cluster-labeling stage (its raster connected-component labeling,
classification.py — here the graph is the document near-dup graph instead of
a pixel adjacency grid).

Algorithm: hash-min label propagation — label(v) starts at v, every
iteration each vertex takes the min label over itself and its neighbors,
until a fixpoint. Converges in O(graph diameter) rounds; near-dup clusters
are shallow (duplicates of a common source), so 3-5 rounds in practice.

Scale notes (100 TB): each round is one shuffle (edges ⋈ labels on src,
then a hash-agg min by vertex) — both map-side combinable. Labels and
edges are persisted across rounds and the convergence check piggybacks on
the aggregation (one count per round, no extra pass over edges). For
pathological high-diameter graphs (chains), switch to the large-star/
small-star variant which converges in O(log n) rounds; dedup graphs don't
need it. Skewed hub vertices (a boilerplate document near-dup to millions)
are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, cluster_id) for every node in `edges`; cluster_id = the
    minimum node id reachable through the undirected edge set.

    `edges` may be directed/one-sided (a < b pairs); it is symmetrized
    here. Output covers nodes that appear in at least one edge —
    singletons are their own cluster by definition and can be added by a
    left join at the call site.
    """
    und = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct().persist()

    labels = und.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("nbr_min")
    ).select(
        "node", F.least(F.col("node"), F.col("nbr_min")).alias("label")
    ).persist()
    labels.count()  # materialize round 0

    for _ in range(max_iter):
        # propagate: each node pulls the min label among its neighbors
        nbr = (
            und.join(labels, und["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label"))
                .cast("int").alias("changed"),
            )
            .persist()
        )
        n_changed = new_labels.agg(F.sum("changed")).first()[0] or 0
        old = labels
        labels = new_labels.select("node", "label").persist()
        labels.count()
        old.unpersist()
        new_labels.unpersist()
        if n_changed == 0:
            break

    und.unpersist()
    return labels.select("node", F.col("label").alias("cluster_id"))
