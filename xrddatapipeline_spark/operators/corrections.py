"""Correction-image chain: dark / background / gain / flat-background.

Role parity with the reference's ``_getCorrImage`` (GSASII_imports.py:
660-735; SURVEY §2.3 P6-P7), which corrects each raw image before masking
and integration:

1. ``sumImg = int32(image)``
2. dark image: ``sumImg += int32(dark * darkScale)``
3. background image: ``sumImg += int32(back * backScale)`` — but ONLY when
   no dark image is configured: with a dark image present the reference
   adjusts the background array in place and never adds it to ``sumImg``
   (GSASII_imports.py:714-719). That asymmetry is observable behavior, so
   it is reproduced (and flagged) here.
4. gain map: ``sumImg = sumImg * gain / 1000`` (float division)
5. flat background: ``sumImg -= int(flatBkg)``
6. final ``int32`` cast (truncation toward zero).

Spark shape: correction frames are *measured per-pixel tables* — exactly
the case the calib module's closed-form columns cannot cover — so they
join the dense pixel frame on (y, x). At scale the correction tables are
per-detector (8.3 M rows each, shared by every image), so the right
physical plan is either a broadcast (one detector's corrections fit
comfortably in an executor) or the bucketed co-located sort-merge join
(``calib.cache.save_bucketed_pixel_table``) when several correction
frames chain; both keep the billion-row pixel side unshuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _value_col(df: DataFrame, keys: tuple[str, ...]) -> str:
    others = [c for c in df.columns if c not in keys]
    if len(others) != 1:
        raise ValueError(
            f"correction frame must carry exactly one value column, got {others}"
        )
    return others[0]


def apply_correction_images(
    pixels: DataFrame,
    *,
    dark: DataFrame | None = None,
    dark_scale: float = 1.0,
    background: DataFrame | None = None,
    back_scale: float = 1.0,
    gain: DataFrame | None = None,
    flat_bkg: float = 0.0,
    value_col: str = "intensity",
    keys: tuple[str, ...] = ("y", "x"),
    broadcast_corrections: bool = True,
) -> DataFrame:
    """Apply the reference's correction chain to a pixel frame.

    ``dark`` / ``background`` / ``gain`` are per-pixel frames keyed by
    ``keys`` with exactly one value column each (any name). The corrected
    value replaces ``value_col`` (int32, reference cast semantics); all
    other pixel columns pass through. Missing pixels in a correction frame
    contribute 0 (dark/background) or 1000 (gain = identity).

    With ``broadcast_corrections`` the per-detector correction tables are
    broadcast so the (much larger, per-image) pixel side never shuffles;
    disable it when the corrections were saved via
    ``save_bucketed_pixel_table`` to get the exchange-free co-located join
    instead.
    """
    key_list = list(keys)

    def _join(px: DataFrame, corr: DataFrame, out: str) -> DataFrame:
        col = _value_col(corr, keys)
        corr = corr.select(*key_list, F.col(col).alias(out))
        if broadcast_corrections:
            corr = F.broadcast(corr)
        return px.join(corr, on=key_list, how="left")

    df = pixels.withColumn("_corr", F.col(value_col).cast("int"))
    if dark is not None:
        df = _join(df, dark, "_dark")
        df = df.withColumn(
            "_corr",
            F.col("_corr")
            + F.coalesce(
                (F.col("_dark") * F.lit(dark_scale)).cast("int"), F.lit(0)
            ),
        ).drop("_dark")
    elif background is not None:
        # reference quirk: background only contributes when no dark image
        # is configured (GSASII_imports.py:714-719)
        df = _join(df, background, "_back")
        df = df.withColumn(
            "_corr",
            F.col("_corr")
            + F.coalesce(
                (F.col("_back") * F.lit(back_scale)).cast("int"), F.lit(0)
            ),
        ).drop("_back")
    if gain is not None:
        df = _join(df, gain, "_gain")
        df = df.withColumn(
            "_corr",
            F.col("_corr")
            * F.coalesce(F.col("_gain").cast("double"), F.lit(1000.0))
            / 1000.0,
        ).drop("_gain")
    df = df.withColumn("_corr", F.col("_corr") - F.lit(int(flat_bkg)))
    return df.withColumn(value_col, F.col("_corr").cast("int")).drop("_corr")


def correction_chain_numpy(
    image,
    *,
    dark=None,
    dark_scale: float = 1.0,
    background=None,
    back_scale: float = 1.0,
    gain=None,
    flat_bkg: float = 0.0,
):
    """Numpy oracle of the same chain (test mirror of _getCorrImage)."""
    import numpy as np

    sum_img = np.array(image, dtype="int32")
    if dark is not None:
        sum_img = sum_img + np.array(dark * dark_scale, dtype="int32")
    elif background is not None:
        sum_img = sum_img + np.array(background * back_scale, dtype="int32")
    out = sum_img.astype("float64")
    if gain is not None:
        out = sum_img * np.asarray(gain, dtype="float64") / 1000.0
    out = out - int(flat_bkg)
    return np.asarray(out, dtype="int32")
