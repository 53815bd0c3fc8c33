"""IVF index build/probe: partition-pruned reads + parity with ivf_topk."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from xrddatapipeline_spark.operators.similarity import (
    ivf_index_probe,
    ivf_topk,
    save_ivf_index,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_probe_matches_inline_ivf_topk(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    save_ivf_index(emb, path, num_cells=8)
    queries = emb.where(F.col("vec_id") < 5)

    got = ivf_index_probe(spark, path, queries, k=3, nprobe=1).toPandas()
    want = ivf_topk(emb, queries, k=3, num_cells=8).toPandas()
    key = ["query_id", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got[["query_id", "rank", "neighbor_id"]].equals(
        want[["query_id", "rank", "neighbor_id"]]
    )
    assert (got["cos"] - want["cos"]).abs().max() == 0.0


def test_probe_prunes_partitions(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    save_ivf_index(emb, path, num_cells=8)
    queries = emb.where(F.col("vec_id") == 0)

    df = ivf_index_probe(spark, path, queries, k=3, nprobe=2)
    df.collect()  # run once so AQE finalizes and prints the full tree
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the cell IN (...) predicate must land in PartitionFilters (directory
    # pruning), NOT PushedFilters (row-group skipping after listing)
    # identify the index scan by its qnorm column (tmp_path locations are
    # truncated in toString, so path matching is unreliable)
    scan_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "qnorm" in ln
    ]
    assert scan_lines, plan
    assert any("cell" in ln.split("PartitionFilters")[1][:120]
               for ln in scan_lines), scan_lines[0]

    # and only the probed directories are listed: nprobe=2 for one query
    # reads at most 2 of the 8 cell directories
    import re
    m = re.search(r"partition count: (\d+)", plan)
    if m:  # Spark prints the pruned partition count in the scan node
        assert int(m.group(1)) <= 2, m.group(0)


def test_multi_probe_recall_superset(spark, tmp_path):
    """nprobe=8 (all cells) == exact brute-force ranking inside the index;
    nprobe=1 results are a subset of the candidate pool, so every nprobe=1
    cos is <= the nprobe=8 cos at the same rank."""
    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    save_ivf_index(emb, path, num_cells=8)
    queries = emb.where(F.col("vec_id") < 3)

    one = ivf_index_probe(spark, path, queries, k=3, nprobe=1).toPandas()
    allp = ivf_index_probe(spark, path, queries, k=3, nprobe=8).toPandas()
    j = one.merge(allp, on=["query_id", "rank"], suffixes=("_1", "_8"))
    assert (j["cos_1"] <= j["cos_8"] + 1e-15).all()


def test_registry_probe_scratch_dir_reclaimed(spark):
    """The ann_ivf_index_probe registry entry builds its index in a
    per-invocation scratch dir; repeated invocations in one process must
    not accumulate dirs unboundedly (round-5 ADVICE). The last
    ``_IVF_SCRATCH_KEEP`` dirs stay live so still-lazy earlier results
    remain readable (round-7 ADVICE: a keep-2 window silently broke
    'build 3 probes, then materialize the first'); older dirs are
    reclaimed on entry and atexit sweeps the rest."""
    from xrddatapipeline_spark.plans.corpus_queries import (
        _IVF_SCRATCH_KEEP,
        ann_ivf_index_probe,
    )

    # the exact ad-hoc pattern round 7's keep-2 window broke: build
    # KEEP probes before materializing any, then materialize the FIRST
    dfs, dirs = [], []
    for _ in range(_IVF_SCRATCH_KEEP):
        dfs.append(ann_ivf_index_probe(spark, SF_DIR))
        dirs.append(ann_ivf_index_probe._scratch_dirs[-1])
    assert dfs[0].count() > 0  # oldest in-window index still on disk
    assert all(os.path.isdir(d) for d in dirs)

    # one more invocation reclaims exactly the oldest dir
    df_next = ann_ivf_index_probe(spark, SF_DIR)
    assert not os.path.exists(dirs[0]), "oldest scratch dir not reclaimed"
    assert all(os.path.isdir(d) for d in dirs[1:])
    assert df_next.count() > 0
    assert len(ann_ivf_index_probe._scratch_dirs) == _IVF_SCRATCH_KEEP
