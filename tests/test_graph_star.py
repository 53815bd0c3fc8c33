"""Lockstep tests for connected_components_star (large-star/small-star).

Oracle: an in-Python union-find (exact, independent of both Spark routes).
The chain graph is the case the star variant exists for — diameter 240,
so hash-min label propagation needs 240 rounds, while the star variant
must finish within max_iter=12 (O(log n)); the test pins that bound.
"""

from __future__ import annotations

import random

import pytest

from xrddatapipeline_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_labels(df) -> dict[int, int]:
    return {r["node"]: r["cluster_id"] for r in df.collect()}


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src: long, dst: long")


CASES = {
    # permuted-id chain: diameter 240 — the hash-min killer
    "chain": None,  # built below (needs rng)
    "two_cliques_bridge": [
        (a, b) for a in range(10) for b in range(a + 1, 10)
    ] + [
        (a, b) for a in range(100, 108) for b in range(a + 1, 108)
    ] + [(9, 100), (500, 501)],
    "star_hub": [(0, i) for i in range(1, 60)] + [(70, 71), (71, 72)],
    "self_contained_pairs": [(5, 6), (7, 8), (9, 5)],
}


def _chain_edges() -> list[tuple[int, int]]:
    rng = random.Random(7)
    ids = list(range(1000, 1241))
    rng.shuffle(ids)  # labels uncorrelated with chain position
    return list(zip(ids, ids[1:]))


def _random_edges() -> list[tuple[int, int]]:
    rng = random.Random(11)
    return [
        (rng.randrange(400), rng.randrange(400)) for _ in range(300)
    ]


@pytest.mark.parametrize(
    "name",
    ["chain", "two_cliques_bridge", "star_hub", "self_contained_pairs",
     "random"],
)
def test_star_matches_union_find(spark, name):
    if name == "chain":
        edges = _chain_edges()
    elif name == "random":
        edges = [(a, b) for a, b in _random_edges() if a != b]
    else:
        edges = CASES[name]
    oracle = _union_find(edges)
    got = _spark_labels(
        connected_components_star(_edges_df(spark, edges))
    )
    assert got == oracle


def test_star_converges_logarithmically_where_hashmin_cannot(spark):
    """Diameter-240 chain: star must be exact within 12 rounds (O(log n));
    hash-min capped at the same 12 rounds must NOT have converged — the
    reason the star variant exists."""
    edges = _chain_edges()
    oracle = _union_find(edges)

    star = _spark_labels(
        connected_components_star(_edges_df(spark, edges), max_iter=12)
    )
    assert star == oracle

    hashmin = _spark_labels(
        connected_components(_edges_df(spark, edges), max_iter=12)
    )
    assert hashmin != oracle


def test_star_matches_hashmin_on_shallow_graph(spark):
    """On the shallow graphs dedup actually produces, both routes agree
    (hash-min given enough rounds)."""
    edges = CASES["two_cliques_bridge"]
    a = _spark_labels(connected_components_star(_edges_df(spark, edges)))
    b = _spark_labels(connected_components(_edges_df(spark, edges)))
    assert a == b
