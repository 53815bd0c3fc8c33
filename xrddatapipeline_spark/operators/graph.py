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
pathological high-diameter graphs (chains), `connected_components_star`
(alternating large-star/small-star, Kiveris et al. "Connected Components
in MapReduce and Beyond", SOCC'14) converges in O(log n) rounds; dedup
graphs are shallow so hash-min's O(diameter) usually wins on constant
factors. Skewed hub vertices (a boilerplate document near-dup to
millions) are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xrddatapipeline_spark.barrier import release


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
    ).localCheckpoint()  # barrier: truncate lineage (round 0)

    for _ in range(max_iter):
        # propagate: each node pulls the min label among its neighbors
        nbr = (
            und.join(labels, und["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # localCheckpoint per round: `persist` caches data but the
        # logical plan would still double each round (labels appears
        # twice), and Catalyst re-analyzes the whole tree per action —
        # O(2^rounds) driver work. The barrier cuts the plan to a
        # LogicalRDD scan; `release` frees the previous round's RDD.
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
            .localCheckpoint()
        )
        n_changed = new_labels.agg(F.sum("changed")).first()[0] or 0
        old = labels
        labels = new_labels.select("node", "label")
        release(old)
        if n_changed == 0:
            break

    und.unpersist()
    return labels.select("node", F.col("label").alias("cluster_id"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 40,
) -> DataFrame:
    """(node, cluster_id) via alternating large-star / small-star rounds.

    Same contract as :func:`connected_components` (cluster_id = min node
    id reachable through the undirected edge set; nodes appearing in at
    least one non-self edge), but converges in O(log n) rounds regardless
    of graph diameter — the scale path for chain-/mesh-shaped components
    where hash-min label propagation needs O(diameter) shuffles.

    Per round (Kiveris et al., SOCC'14):

    - large-star: for every node u with symmetrized neighborhood Γ(u),
      m = min(Γ(u) ∪ {u}); re-point every LARGER neighbor at m — emit
      (v, m) for v ∈ Γ(u), v > u.
    - small-star: orient every edge (u, v) with u > v; m = min(Γ(u) ∪
      {u}) (all oriented neighbors are < u); emit (v, m) for v ∈ Γ(u) ∪
      {u}, dropping the (m, m) self-loop.

    Both phases are a groupBy-min plus a join on the grouping key — every
    aggregation map-side combinable, every round's edge set cut to a
    localCheckpoint barrier (lineage truncation — iterative plans
    otherwise grow exponentially in Catalyst re-analysis) and the
    previous round's RDD freed. Convergence = the canonically-oriented
    edge set is stable: detected by a (count, xxhash64-checksum) pair
    computed over the materialized barrier, then CONFIRMED
    exactly with one `subtract` pass (checksum equality alone is never
    trusted). At the fixpoint every component is a star centered at its
    minimum node, so the final edge set IS the labeling.
    """
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()  # barrier: see the loop comment below
    )
    prev_stats = cur.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("chk")
    ).first()

    for _ in range(max_iter):
        # --- large-star: symmetrize, min over Γ(u) ∪ {u}, re-point v > u
        sym = cur.select("u", "v").union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least(F.col("u"), F.col("mn")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

        # --- small-star: orient u > v, min over Γ(u) ∪ {u}, re-point all.
        # orient is a localCheckpoint: it is consumed twice (the join and
        # the (u, m) branch — which is exactly the smins rows, since
        # m < u always), and the barrier ALSO truncates lineage — without
        # it the logical plan multiplies ~6x per round (sym/orient each
        # reference their input twice) and Catalyst re-analysis blows up
        # exponentially in the round count.
        orient = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct().localCheckpoint()
        smins = orient.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            orient.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        stats = small.agg(
            F.count("*").alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("chk")
        ).first()
        converged = (
            stats["n"] == prev_stats["n"] and stats["chk"] == prev_stats["chk"]
        )
        if converged:
            # checksum said stable — confirm EXACTLY (equal counts +
            # empty difference of distinct sets ⇒ set equality)
            converged = small.subtract(cur).limit(1).count() == 0
        release(cur)
        release(orient)
        cur = small
        prev_stats = stats
        if converged:
            break

    # fixpoint: stars centered at component minima — (u, v=center) plus
    # the centers themselves
    labels = cur.select(
        F.col("u").alias("node"), F.col("v").alias("cluster_id")
    ).union(
        cur.select(F.col("v").alias("node"), F.col("v").alias("cluster_id"))
    ).distinct()
    return labels
