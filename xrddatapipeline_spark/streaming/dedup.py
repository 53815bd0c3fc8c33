"""Streaming exact deduplication — the corpus layer's dedup_exact_hash as a
continuous operator.

A batch engine dedups with one hash-groupBy over the corpus; a streaming
ingest pipeline cannot hold "all hashes ever seen" in state forever.
``dedup_stream`` keys the state on the content hash and bounds it with a
watermark: a duplicate arriving within ``watermark`` of the original is
dropped; state for hashes older than the watermark is evicted (Spark's
``dropDuplicatesWithinWatermark`` — RocksDB-backed at production scale).
Exactly the design of production ingest dedup (late re-crawls inside the
horizon are duplicates; beyond it they are re-ingests to be handled by the
batch dedup pass downstream).

Scale shape: state size is bounded by (arrival rate x watermark horizon),
independent of total corpus size; the only shuffle keys on the
high-entropy hash (no skew).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """md5 of the raw text — the same key dedup_exact_hash groups on."""
    return df.withColumn("content_hash", F.md5(F.col(text_col)))


def dedup_stream(
    stream: DataFrame,
    time_col: str = "ts",
    key_cols: Sequence[str] = ("content_hash",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose ``key_cols`` already appeared within ``watermark``.

    The first arrival of each key is emitted; duplicates inside the
    watermark horizon are dropped; state is evicted past the horizon."""
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def store_backed_dedup_sink(
    store_path: str,
    survivors_path: str,
    lineage: str,
    text_col: str = "text",
):
    """``foreachBatch`` sink: dedup every micro-batch against the
    PERSISTED all-time hash store, not just in-flight streaming state.

    This is the "batch dedup pass downstream" the dedup_stream docstring
    defers re-ingests beyond the watermark horizon to — composed into
    the stream itself (operators/dedup_store.py carries the store layout
    and the 100 TB pruning posture). Per micro-batch:

    1. probe: anti-join the batch against the store, EXCLUDING rows the
       store already holds from this very (lineage, batch id);
    2. emit survivors to ``survivors_path/bid=<id>/`` with
       mode("overwrite") — per-batch-directory idempotence;
    3. append the survivors' hashes to the store tagged
       (lineage, batch id).

    ``lineage`` must be STABLE across restarts of the same checkpointed
    query (the checkpoint path is the natural choice) and DISTINCT
    between queries: micro-batch ids restart at 0 under a fresh
    checkpoint, so bid alone cannot identify "my own append". Each
    query lineage also needs its own ``survivors_path`` (its bid=N
    directories would collide otherwise). Queries sharing a store must
    run SEQUENTIALLY, not concurrently: parquet appends race on the
    shared FileOutputCommitter staging dir (see save_dedup_store) — a
    transactional store format (Delta) is the concurrent-writer path.

    Replay safety (foreachBatch is at-least-once): if the query dies
    after step 3 and replays the batch, the (lineage, bid) exclusion
    makes the probe see the store exactly as the first attempt did, so
    the replay recomputes the SAME survivors and overwrites the same
    directory — without it the replayed batch would anti-join against
    its own committed hashes and silently emit nothing. Duplicate store
    rows from a replayed step 3 are harmless (anti-join semantics).

    Use with ``writeStream.foreachBatch(store_backed_dedup_sink(...))``.
    """
    from pyspark.errors import AnalysisException

    from xrddatapipeline_spark.operators.dedup_store import (
        dedup_store_probe,
        save_dedup_store,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from xrddatapipeline_spark.operators.dedup_store import _with_hash

        spark = batch_df.sparkSession
        # hash + checkpoint ONCE: the probe needs the batch twice (prefix
        # collect, anti-join) and the two writes below re-consume the
        # survivors — without the barrier every use re-reads and
        # re-hashes the source micro-batch
        b = _with_hash(batch_df, text_col).localCheckpoint(eager=True)
        try:
            survivors = dedup_store_probe(
                spark, store_path, b, text_col=text_col,
                exclude_bid=batch_id, lineage=lineage,
            ).localCheckpoint(eager=True)
            # eager: the survivors feed BOTH writes below, and the second
            # must not re-probe a store the first's append is about to
            # change out from under it
        except AnalysisException as e:
            # ONLY the genuine bootstrap case (no store directory yet)
            # may fall through to "everything survives" — any other
            # analysis failure (store path deleted mid-stream, wrong
            # mount) must surface, not silently disable dedup
            if "PATH_NOT_FOUND" not in (e.getErrorClass() or ""):
                raise
            survivors = b.drop("hp")
        survivors.write.mode("overwrite").parquet(
            f"{survivors_path}/bid={batch_id}"
        )
        save_dedup_store(
            survivors, store_path, text_col=text_col, mode="append",
            bid=batch_id, lineage=lineage,
        )

    return _sink
