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
