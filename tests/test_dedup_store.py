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


def test_store_backed_sink_dedups_across_batches_and_replays(spark, tmp_path):
    """foreachBatch sink: cross-batch dedup via the persisted store, and
    an at-least-once REPLAY of a committed batch reproduces its own
    survivors instead of anti-joining against its own hashes."""
    from xrddatapipeline_spark.streaming.dedup import store_backed_dedup_sink

    store = str(tmp_path / "store")
    outdir = str(tmp_path / "out")
    sink = store_backed_dedup_sink(store, outdir, lineage="ckpt-a")

    b0 = _docs(spark, [(1, "alpha"), (2, "beta")])
    sink(b0, 0)
    b1 = _docs(spark, [(3, "beta"), (4, "gamma")])  # beta seen in batch 0
    sink(b1, 1)
    out = spark.read.schema(
        "doc_id long, text string, content_hash string"
    ).parquet(outdir)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 4]
    # replay batch 1 (post-commit): same survivors, no silent loss
    sink(b1, 1)
    out2 = spark.read.schema(
        "doc_id long, text string, content_hash string"
    ).parquet(outdir)
    assert sorted(r.doc_id for r in out2.collect()) == [1, 2, 4]
    # a LATER batch still sees batch 1's hashes as seen
    sink(_docs(spark, [(5, "gamma"), (6, "delta")]), 2)
    out3 = spark.read.schema(
        "doc_id long, text string, content_hash string"
    ).parquet(outdir)
    assert sorted(r.doc_id for r in out3.collect()) == [1, 2, 4, 6]


def test_store_backed_sink_end_to_end_stream(spark, tmp_path):
    """Wire the sink into a real availableNow file stream across two
    INDEPENDENT queries (fresh checkpoint each, so batch ids restart at
    0 — the lineage key keeps their store tags apart): the store, not
    streaming state, carries the seen-set across them."""
    import json
    import os

    from xrddatapipeline_spark.streaming.dedup import store_backed_dedup_sink

    indir = tmp_path / "in"
    indir.mkdir()
    store = str(tmp_path / "store")

    def _run(name):
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(indir)
        )
        q = (
            stream.writeStream.foreachBatch(
                store_backed_dedup_sink(
                    store, str(tmp_path / f"out/{name}"), lineage=name
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ck/{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with open(indir / "a.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "one"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "two"}) + "\n")
    _run("q1")
    # second query re-ingests "two" plus a new doc: despite its batch id
    # also being 0, q1's bid=0 store rows stay visible (other lineage) —
    # only the genuinely new doc survives
    with open(indir / "b.json", "w") as f:
        f.write(json.dumps({"doc_id": 3, "text": "two"}) + "\n")
        f.write(json.dumps({"doc_id": 4, "text": "three"}) + "\n")
    for fname in os.listdir(indir):
        if fname == "a.json":
            os.remove(indir / fname)
    _run("q2")
    out = spark.read.schema(
        "doc_id long, text string, content_hash string"
    ).option("recursiveFileLookup", "true").parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 4]


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


def test_canonical_ingest_chain_e2e(spark, tmp_path):
    """The canonical ingestion chain (round-11 VERDICT #6), end to end:
    NULL normalization -> exact batch-internal -> store probe -> store
    append, then minhash near-dup over the survivors. Two batches share
    one store; the near-dup stage finds the one near-duplicate pair that
    exact hashing cannot."""
    from xrddatapipeline_spark.operators import text as tx
    from xrddatapipeline_spark.operators.dedup_store import dedup_ingest_batch

    path = str(tmp_path / "store")
    stem = ("the miller grinds wheat beside the river bank at dawn while "
            "swallows circle the old stone tower and the ferryman waits "
            "for travellers bound across the water to the market town")
    # one differing word in 40+ -> shingle jaccard ~0.85 (>= the 0.8 bar),
    # far above it for exact hashing to catch (which is the point)
    long_a = f"{stem} under a pale jumping sky"
    long_b = f"{stem} under a pale leaping sky"
    b1 = _docs(spark, [
        (1, "alpha"), (2, "alpha"),        # internal exact dup -> keep id 1
        (3, "beta"), (4, None),            # NULL drops at normalization
    ])
    s1 = dedup_ingest_batch(spark, path, b1, lineage="crawl", bid=0)
    assert sorted(r.doc_id for r in s1.collect()) == [1, 3]

    b2 = _docs(spark, [
        (10, "beta"),                      # seen in batch 1 -> store drops it
        (11, long_a), (12, long_b),        # near-dups: BOTH survive exact
        (13, long_a),                      # exact dup of 11 -> internal drops
        (14, None),                        # NULL drops
    ])
    s2 = dedup_ingest_batch(spark, path, b2, lineage="crawl", bid=1)
    got = sorted(r.doc_id for r in s2.collect())
    assert got == [11, 12]

    # near-dup stage over the batch survivors (exact hashes can't relate
    # long_a/long_b; the store keeps only exact hashes, so this runs
    # batch-internally by design — see dedup_ingest_batch docstring)
    sh = tx.word_shingles(s2).persist()
    pairs = tx.shingle_jaccard(
        sh, pairs=tx.lsh_candidate_pairs(tx.minhash_buckets(sh, 32, 4))
    ).where(F.col("jaccard") >= 0.8)
    assert [(r.doc_a, r.doc_b) for r in pairs.collect()] == [(11, 12)]
    sh.unpersist()

    # replay safety: retrying batch 1 with the same (lineage, bid) sees
    # the store as the first attempt did and recomputes identical
    # survivors (its own committed append is excluded; batch 2's is not)
    r1 = dedup_ingest_batch(
        spark, path, b1, lineage="crawl", bid=0, update_store=False
    )
    assert sorted(r.doc_id for r in r1.collect()) == [1, 3]
