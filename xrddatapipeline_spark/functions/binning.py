"""Bin-index expressions: 2theta bins, Q bands, azimuth bands, circular range.

Reference parity (SURVEY §2.3 P12-P15):
- ``prepare_qmaps`` tth -> integer bin with clamp-to-0 out-of-range —
  cache_creation.py:21-54 (clamp at :40-42)
- ``get_Qbands`` Q -> integer Q-bin — corrections_and_maps.py:52-62
- ``get_azimbands`` 1-degree azimuth bands — cache_creation.py:88-91
- ``modulo_range`` circular membership — classification.py:40-43

All Catalyst expressions; the clamp semantics of the reference (out-of-range
pixels routed to bin 0, later discarded by the integrator) are reproduced
exactly so golden integrals match (SURVEY §2.6 A1 note).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tth_bin_index(
    tth: Column | str, tth_min: float, tth_max: float, n_bins: int
) -> Column:
    """Integer 2theta bin in 1..n_bins; out-of-range -> 0 (cache_creation.py:40-42).

    Bin 0 is the reference's "discard" bin: the integrator drops it after
    aggregation, mirroring pipeline.py:69-71.
    """
    width = (tth_max - tth_min) / n_bins
    raw = F.floor((_col(tth) - F.lit(tth_min)) / F.lit(width)) + 1
    return (
        F.when((_col(tth) < tth_min) | (_col(tth) >= tth_max), F.lit(0))
        .otherwise(raw)
        .cast("int")
    )


def tth_bin_center(idx: Column | str, tth_min: float, tth_max: float, n_bins: int) -> Column:
    """Center of bin idx (1-based), matching cache_creation.py:44-49."""
    width = (tth_max - tth_min) / n_bins
    return F.lit(tth_min) + (_col(idx).cast("double") - 0.5) * F.lit(width)


def q_bin_index(q: Column | str, q_min: float, dq: float) -> Column:
    """floor((q - q_min)/dq) — corrections_and_maps.py:52-62.

    May be negative for q < q_min, exactly as in the reference (tutorial grad
    CSVs span Qbin -39..~700); the stats layer range-filters downstream
    (mainUI/spottiness.py:99-100).
    """
    return F.floor((_col(q) - F.lit(q_min)) / F.lit(dq)).cast("int")


def azim_band(azim: Column | str, width_deg: float = 1.0) -> Column:
    """Integer azimuth band — cache_creation.py:88-91 (360 x 1-degree)."""
    return F.floor(_col(azim) / F.lit(width_deg)).cast("int")


def in_circular_range(
    value: Column | str, center: Column | str | float, radius: Column | str | float
) -> Column:
    """Circular (mod 360) membership |value - center| < radius — classification.py:40-43."""
    c = F.lit(center) if isinstance(center, (int, float)) else _col(center)
    r = F.lit(radius) if isinstance(radius, (int, float)) else _col(radius)
    d = F.pmod(_col(value) - c, F.lit(360.0))
    return (d < r) | (d > (F.lit(360.0) - r))
