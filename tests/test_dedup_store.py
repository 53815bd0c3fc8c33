"""Persisted content-hash dedup store: pruning, semantics, incrementality."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from xrddatapipeline_spark.operators.dedup_store import (
    HASH_PREFIX_CHARS,
    dedup_store_probe,
    save_dedup_store,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_drops_seen_keeps_unseen(spark, tmp_path):
    path = str(tmp_path / "store")
    seen = _docs(spark, [(i, f"seen doc {i}") for i in range(20)])
    save_dedup_store(seen, path)
    batch = _docs(
        spark,
        [(100 + i, f"seen doc {i}") for i in range(5)]      # re-crawled
        + [(200 + i, f"fresh doc {i}") for i in range(7)],  # never seen
    )
    out = dedup_store_probe(spark, path, batch)
    got = sorted(r.doc_id for r in out.collect())
    assert got == [200 + i for i in range(7)]
    # survivor hash matches the independent md5 of its text
    row = out.where(F.col("doc_id") == 200).collect()[0]
    import hashlib

    assert row.content_hash == hashlib.md5(b"fresh doc 0").hexdigest()


def test_append_mode_is_incremental_ingestion(spark, tmp_path):
    path = str(tmp_path / "store")
    save_dedup_store(_docs(spark, [(1, "alpha")]), path)
    # batch 2 is new at first probe...
    b2 = _docs(spark, [(2, "beta")])
    assert dedup_store_probe(spark, path, b2).count() == 1
    # ...then appended; the same content re-probed is now seen
    save_dedup_store(b2, path, mode="append")
    assert dedup_store_probe(spark, path, b2).count() == 0
    # and batch 1's content is still seen (append did not clobber)
    assert (
        dedup_store_probe(spark, path, _docs(spark, [(3, "alpha")])).count()
        == 0
    )


def test_probe_scan_prunes_to_batch_prefix_partitions(spark, tmp_path):
    """The store scan must carry a partition IN-filter on hp (Hive
    pruning): a 2-doc batch reads at most 2 of the store's prefix
    directories, not the whole history."""
    path = str(tmp_path / "store")
    save_dedup_store(
        _docs(spark, [(i, f"doc number {i}") for i in range(300)]), path
    )
    n_parts = sum(
        1 for d in os.listdir(path) if d.startswith("hp=")
    )
    assert n_parts > 10  # prefixes fan out at this corpus size
    batch = _docs(spark, [(900, "probe a"), (901, "probe b")])
    out = dedup_store_probe(spark, path, batch)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = [
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "store" in ln
    ]
    assert scan, plan
    pf = scan[0].split("PartitionFilters: [")[1].split("]")[0]
    assert "hp" in pf and (" IN " in pf or "in(" in pf.lower()), pf
    # pruned read schema: the anti-join needs only the hash
    read = scan[0].split("ReadSchema:")[1]
    assert "content_hash" in read and "text" not in read


def test_store_partition_values_read_back_as_strings(spark, tmp_path):
    """Regression guard for partition-value type inference: a store whose
    sampled prefixes are all-numeric ("07", "12") must still read back as
    strings, or the prefix filter and join key dtype both break."""
    path = str(tmp_path / "store")
    # md5("n 60") = "7d0d..."; brute-force a few texts with numeric prefixes
    import hashlib

    rows, i = [], 0
    while len(rows) < 3:
        t = f"n {i}"
        if hashlib.md5(t.encode()).hexdigest()[:HASH_PREFIX_CHARS].isdigit():
            rows.append((len(rows), t))
        i += 1
    save_dedup_store(_docs(spark, rows), path)
    # re-probing the same rows must see ALL of them (zero survivors)
    assert dedup_store_probe(spark, path, _docs(spark, rows)).count() == 0
