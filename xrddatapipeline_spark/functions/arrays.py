"""Order-statistic expressions over collected arrays ("bin once, select").

Companions to operators.ring_stats: when groups are bounded (ring / label /
Q-bin populations, ~10^2-10^5 rows), collecting a group's values ONCE and
computing exact order statistics with array expressions replaces each extra
exact-percentile aggregation (a full scan + full-value shuffle) with an
in-memory JVM expression. Interpolation matches numpy / DuckDB
``percentile_cont`` (linear at rank (n-1)*q) and Spark ``percentile``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def array_median(sorted_arr: Column, n: Column) -> Column:
    """Exact median of a pre-sorted array: mean of the two middle order
    statistics for even n (numpy/DuckDB/Spark-median compatible)."""
    lo = F.element_at(sorted_arr, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(sorted_arr, F.ceil((n + 1) / 2).cast("int"))
    return (lo + hi) / 2.0


def array_percentile(sorted_arr: Column, n: Column, q: float) -> Column:
    """Exact linear-interpolated percentile of a pre-sorted array at rank
    (n-1)*q — numpy default / ``percentile_cont`` semantics."""
    rank = (n - 1).cast("double") * F.lit(q)
    lo_idx = F.floor(rank).cast("int")
    frac = rank - lo_idx
    lo = F.element_at(sorted_arr, lo_idx + 1)
    hi = F.element_at(sorted_arr, F.least(lo_idx + 2, n.cast("int")))
    return lo + (hi - lo) * frac
