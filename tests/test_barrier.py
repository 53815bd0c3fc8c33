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


def test_release_join_of_two_checkpoints_spares_siblings(spark):
    """ADVICE r4: a frame spanning two checkpoints does not OWN them — a
    localCheckpoint RDD cannot recompute after unpersist, so freeing the
    leaves of a join would break every other consumer. release(join) must
    free neither; releasing each checkpoint handle individually still
    frees both."""
    import warnings

    before = _persistent_rdd_ids(spark)
    a = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("va")
                                ).localCheckpoint()
    b = spark.range(100).select(F.col("id").alias("k"), F.lit(2).alias("vb")
                                ).localCheckpoint()
    j = a.join(b, "k")
    assert j.count() == 100
    assert len(_persistent_rdd_ids(spark) - before) == 2
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        release(j)
        assert any("checkpoint leaves" in str(x.message) for x in w)
    # siblings untouched and still usable
    assert len(_persistent_rdd_ids(spark) - before) == 2
    assert a.count() == 100 and b.count() == 100
    release(a)
    release(b)
    assert not (_persistent_rdd_ids(spark) - before)


def test_release_unpersists_cached_projection_over_checkpoint(spark):
    """ADVICE r4 cache-leak half: a PERSISTED projection over a checkpoint
    must have BOTH freed — the old early-return freed the leaf and leaked
    the Dataset cache entry."""
    from pyspark import StorageLevel

    before = _persistent_rdd_ids(spark)
    ckpt = spark.range(100).localCheckpoint()
    proj = ckpt.select((F.col("id") * 2).alias("x")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    assert proj.count() == 100
    assert proj.storageLevel.useMemory
    release(proj)
    assert not proj.storageLevel.useMemory, "Dataset cache must be dropped"
    assert not (_persistent_rdd_ids(spark) - before), (
        "checkpoint RDD must be freed too"
    )
