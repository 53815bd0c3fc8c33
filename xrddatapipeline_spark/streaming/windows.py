"""Watermarked tumbling-window aggregation over an event stream.

The late-data half of the streaming story (the sessionizer in
`sessions.py` covers custom state): event-time tumbling windows with a
watermark bounding how late an event may arrive. In append mode a window
is emitted exactly once — when the watermark (max seen event time minus
`late_threshold`) passes the window end — and events older than the
watermark are dropped by the state store instead of growing it forever.

Scale notes: state is one row per (window, user bucket) — bounded by the
watermark horizon, not by stream length; the aggregation is map-side
combined before the single keyed shuffle per micro-batch. This is the
pattern for continuous per-dataset quality/rate monitors over a 100 TB/day
event firehose (counts, sums, distinct-ish sketches per window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    late_threshold: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-window event count + value sum with late-event handling.

    `events` needs a TIMESTAMP `ts_col`, a `user_id`, and a numeric
    `value`. Returns (window_start, window_end, n_events, sum_value);
    in append mode each window emits once, after the watermark passes
    its end.
    """
    return (
        events.withWatermark(ts_col, late_threshold)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )
