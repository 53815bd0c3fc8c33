"""Per-group exact median + MAD statistics and sigma-clip outlier flagging.

Reference parity: the C kernel ``fmask.mask`` (fmask.c:79-293) computes, per
2theta ring, the **exact** median and MAD (scaled by 1.4826) of pixel
intensities and masks pixels outside ``median +/- esdMul * 1.4826 * MAD``;
rings with fewer than 10 pixels are skipped (fmask.c:237). SURVEY §2.6 A2,
§2.5 J7, §2.6 A18/J6 (two-pass MAD).

Spark-first formulation: two hash aggregations + a broadcast join-back —
the per-ring aggregate table is tiny (~10^3 rings/image), so the join-back
is a broadcast hash join with no shuffle of the pixel side beyond the
groupBy's own exchange. ``F.median`` is Spark's exact median (interpolated
mean-of-two-middles for even counts, matching numpy and DuckDB
``median``), as required for parity (SURVEY §7 "Numeric parity").

Scale note (100 TB): both groupBys key on (group keys) which include
image_id in the image pipeline — cardinality ~10^3 per image, no skew;
AQE coalesces the tiny aggregate exchanges. The pixel-side shuffle is the
unavoidable one for a hash aggregation; partial aggregation (map-side
combine) applies automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_SCALE = 1.4826  # Gaussian consistency constant, fmask.c:268


def group_median_mad(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    min_count: int = 1,
) -> DataFrame:
    """Per-key exact median, MAD, and count.

    Returns ``keys + (n_px, med, mad)``; groups with fewer than
    ``min_count`` rows are dropped (fmask.c:237 skips rings with <10 px).
    """
    keys = list(keys)
    med = (
        df.groupBy(*keys)
        .agg(F.median(value).alias("med"), F.count("*").alias("n_px"))
        .where(F.col("n_px") >= min_count)
    )
    joined = df.join(F.broadcast(med), keys)
    return (
        joined.groupBy(*keys)
        .agg(
            F.first("n_px").alias("n_px"),
            F.first("med").alias("med"),
            F.median(F.abs(F.col(value) - F.col("med"))).alias("mad"),
        )
    )


def flag_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    esd_mul: float = 3.0,
    min_count: int = 10,
) -> DataFrame:
    """Join ring stats back and flag ``|v - med| > esd_mul * 1.4826 * mad``.

    Mirrors fmask.c:259-285 (apply median/MAD back to each ring pixel).
    Adds columns ``med, mad, n_px, is_outlier``; rows in skipped groups
    (fewer than min_count) keep ``is_outlier = false`` with null stats.
    """
    keys = list(keys)
    stats = group_median_mad(df, keys, value, min_count=min_count)
    out = df.join(F.broadcast(stats), keys, "left")
    thresh = F.col("mad") * F.lit(esd_mul * MAD_SCALE)
    return out.withColumn(
        "is_outlier",
        F.when(
            F.col("mad").isNotNull()
            & (F.abs(F.col(value) - F.col("med")) > thresh),
            F.lit(True),
        ).otherwise(F.lit(False)),
    )
