"""Watermarked stream-stream interval join.

The third leg of the streaming story (sessions.py covers custom state,
windows.py covers late-data windowed aggregation): correlate two live
event streams on a key within a bounded event-time interval — the
streaming form of the batch banded range join
(operators/temporal.py::range_join, SURVEY §2.5 J9-style). The canonical
use is attribution/correlation over a firehose: errors within 24 h of a
purchase, clicks within 1 h of an impression, detector frames within a
settle window of a calibration event.

Semantics and scale:

- Both sides carry a watermark; the join condition bounds ``right.ts``
  to ``[left.ts, left.ts + within]``. Spark derives a state-retention
  horizon from watermark + interval, so the state store holds only rows
  younger than that horizon — state is bounded by TIME, not stream
  length, which is what makes this viable on an unbounded 100 TB/day
  stream.
- Each micro-batch shuffles both sides once on the join key; matches
  emit as soon as both rows have arrived (inner join), and a row
  arriving behind the watermark finds its partner already evicted —
  it produces nothing, by design (tested).
- The key should be well-distributed (user_id, dataset); a skewed key
  concentrates state in one state-store partition exactly as it would
  concentrate a shuffle partition in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "1 hour",
    left_late: str = "10 minutes",
    right_late: str = "10 minutes",
) -> DataFrame:
    """Inner-join two watermarked streams: rows share ``key`` and the
    right row's event time falls in ``[left.ts, left.ts + within]``.

    Right-side columns come back suffixed ``_r`` (except the shared
    key). Both inputs need event-time TIMESTAMP ``ts_col``.
    """
    l = left.withWatermark(ts_col, left_late)
    r = right.withWatermark(ts_col, right_late)
    r = r.select(
        F.col(key),
        *[
            F.col(c).alias(f"{c}_r")
            for c in right.columns
            if c != key
        ],
    )
    cond = (
        (l[key] == r[key])
        & (r[f"{ts_col}_r"] >= l[ts_col])
        & (r[f"{ts_col}_r"] <= l[ts_col] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").drop(r[key])
