"""Barrier/release semantics: localCheckpoint storage must actually be
freed — including when the caller holds a PROJECTION over the checkpointed
frame (the analyzed plan root is then a Project, not a LogicalRDD; a
root-only check would silently leak, cf. round-2 ADVICE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xrddatapipeline_spark.barrier import release


def _persistent_rdd_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def test_release_frees_checkpoint_behind_projection(spark):
    before = _persistent_rdd_ids(spark)
    ckpt = spark.range(100).select(
        F.col("id").alias("node"), (F.col("id") % 7).alias("label")
    ).localCheckpoint()
    proj = ckpt.select("node", "label")  # Project over LogicalRDD
    assert proj.count() == 100
    leaked = _persistent_rdd_ids(spark) - before
    assert leaked, "localCheckpoint should register a persistent RDD"
    release(proj)
    assert not (_persistent_rdd_ids(spark) - before), (
        "release() must free the checkpoint RDD even through a projection"
    )


def test_release_frees_checkpoint_at_root(spark):
    before = _persistent_rdd_ids(spark)
    ckpt = spark.range(50).localCheckpoint()
    assert ckpt.count() == 50
    assert _persistent_rdd_ids(spark) - before
    release(ckpt)
    assert not (_persistent_rdd_ids(spark) - before)


def test_connected_components_no_rdd_leak(spark):
    """The hash-min loop releases every superseded round's checkpoint; after
    convergence only the final round's RDDs (the returned frame and the
    persisted edge set is explicitly unpersisted) may remain."""
    from xrddatapipeline_spark.operators.graph import connected_components

    before = _persistent_rdd_ids(spark)
    # a 12-node chain: needs several hash-min rounds to converge
    edges = spark.range(11).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    out = connected_components(edges)
    rows = {(r.node, r.cluster_id) for r in out.collect()}
    assert rows == {(i, 0) for i in range(12)}
    leaked = _persistent_rdd_ids(spark) - before
    # only the final labels checkpoint (still referenced by `out`) may live
    assert len(leaked) <= 1, f"leaked {len(leaked)} RDDs: {sorted(leaked)}"
