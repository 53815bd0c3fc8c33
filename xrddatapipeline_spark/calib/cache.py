"""calib_pixels builder: the one-time per-run calibration table as a DataFrame.

Role parity: ``run_cache`` / ``CacheCreator.run`` (cache_creation.py:200-358,
pipeline_queue.py:182-343; SURVEY §1.4, §7 step 2). The reference computes a
stack of dense per-pixel maps once per run and reuses them per image; here the
same information is one DataFrame keyed by (y, x), built from a single
``spark.range(ny*nx)`` (no crossJoin shuffle) with every map a Catalyst
column expression — the 3x3 rotation matrix collapses to six scalar literals,
so the whole build is one narrow whole-stage-codegen pass.

Two consumption modes:

- ``with_calib_columns(df, c)`` appends the calibration columns to ANY
  DataFrame carrying (y, x) as pure expressions — **no join at all**. The
  reference caches dense maps because re-running Python trig per image is
  expensive; under whole-stage codegen the per-row trig is cheaper than
  shuffling/sorting 8.3 M rows for a (y, x) join, so this is the default
  path in the per-image plan (compute beats cache).
- ``build_calib_pixels(spark, c)`` materializes the table (grid +
  ``with_calib_columns``) for parity with the reference's cache artifact,
  for inspection, and for joins against externally-measured per-pixel data
  (flat fields, dark frames) that genuinely must be stored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xrddatapipeline_spark.calib.geometry import ImageControls, rotation_matrix
from xrddatapipeline_spark.functions.binning import (
    azim_band,
    q_bin_index,
    tth_bin_index,
)
from xrddatapipeline_spark.functions.trig import tth_to_q


def with_calib_columns(df: DataFrame, c: ImageControls) -> DataFrame:
    """Append (tth, azim, q, dist_sq, pol, tth_idx, ring_idx, qbin,
    azim_band, azim_mask) to a DataFrame with integer (y, x) columns —
    closed-form expressions, no join, stays in whole-stage codegen."""
    rmat = rotation_matrix(c.tilt, c.rotation)
    px_mm_x = c.pixel_size_x / 1000.0
    px_mm_y = c.pixel_size_y / 1000.0

    dx = (F.col("x") + 0.5) * px_mm_x - c.center_x
    dy = (F.col("y") + 0.5) * px_mm_y - c.center_y
    lab_x = F.lit(float(rmat[0, 0])) * dx + F.lit(float(rmat[0, 1])) * dy
    lab_y = F.lit(float(rmat[1, 0])) * dx + F.lit(float(rmat[1, 1])) * dy
    lab_z = F.lit(float(rmat[2, 0])) * dx + F.lit(float(rmat[2, 1])) * dy + F.lit(
        c.distance
    )
    df = df.withColumns({"_lx": lab_x, "_ly": lab_y, "_lz": lab_z})
    rho = F.sqrt(F.col("_lx") ** 2 + F.col("_ly") ** 2)
    tth = F.degrees(F.atan2(rho, F.col("_lz")))
    azim = F.pmod(
        F.degrees(F.atan2(F.col("_ly"), F.col("_lx"))) + F.lit(c.azmth_off),
        F.lit(360.0),
    )
    df = df.withColumns(
        {
            "tth": tth,
            "azim": azim,
            "dist_sq": (
                (F.col("_lx") ** 2 + F.col("_ly") ** 2 + F.col("_lz") ** 2)
                / F.lit(c.distance**2)
            ),
        }
    ).drop("_lx", "_ly", "_lz")
    df = df.withColumn("q", tth_to_q("tth", c.wavelength))
    # Kahn polarization factor (GSASII_imports.py:558-579 semantics)
    p = c.pola_val
    a = F.radians("azim")
    t = F.radians("tth")
    pol = (
        ((1.0 - p) * F.cos(a) ** 2 + p * F.sin(a) ** 2) * F.cos(t) ** 2
        + (1.0 - p) * F.sin(a) ** 2
        + p * F.cos(a) ** 2
    )
    df = df.withColumn("pol", pol)

    lo, hi = c.iotth
    qlo, qhi = c.q_range
    dq = (qhi - qlo) / 100.0
    return (
        df.withColumn("tth_idx", tth_bin_index("tth", lo, hi, c.out_channels))
        .withColumn("ring_idx", tth_bin_index("tth", lo, hi, c.num_chans_om))
        .withColumn("qbin", q_bin_index("q", qlo, dq))
        .withColumn("azim_band", azim_band("azim"))
        .withColumn(
            "azim_mask",
            (F.col("azim") < c.lr_azimuth[0]) | (F.col("azim") > c.lr_azimuth[1]),
        )
    )


def save_bucketed_pixel_table(
    df: DataFrame,
    table: str,
    num_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist a per-pixel table bucketed+sorted by (y, x).

    The scale story for J1-style pixel joins: the default calib path is
    closed-form columns (no join at all), but externally-MEASURED per-pixel
    tables — flat fields, dark frames, bad-pixel maps — must be stored and
    joined. Writing every such table with the same (y, x) bucketing makes
    all joins among them exchange-free: each task reads matching bucket
    files from both sides and sort-merges locally, so the 8.3 M-row dense
    side is never shuffled, for any number of joined tables or repeated
    per-image joins. `num_buckets` should match (or divide) the cluster's
    parallelism target; all co-joined tables must share the same count.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, "y", "x")
        .sortBy("y", "x")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def build_calib_pixels(spark: SparkSession, c: ImageControls) -> DataFrame:
    """Per-pixel calibration table:
    (y, x, tth, azim, q, dist_sq, pol, tth_idx, ring_idx, qbin, azim_band,
    azim_mask).
    """
    nx, ny = c.size_x, c.size_y
    base = spark.range(0, ny * nx).select(
        (F.col("id") / nx).cast("int").alias("y"),
        (F.col("id") % nx).cast("int").alias("x"),
    )
    return with_calib_columns(base, c)
