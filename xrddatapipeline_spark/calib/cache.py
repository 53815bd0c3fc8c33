"""calib_pixels builder: the one-time per-run calibration table as a DataFrame.

Role parity: ``run_cache`` / ``CacheCreator.run`` (cache_creation.py:200-358,
pipeline_queue.py:182-343; SURVEY §1.4, §7 step 2). The reference computes a
stack of dense per-pixel maps once per run and reuses them per image; here the
same information is one DataFrame keyed by (y, x), built from a single
``spark.range(ny*nx)`` (no crossJoin shuffle) with every map a Catalyst
column expression — the 3x3 rotation matrix collapses to six scalar literals,
so the whole build is one narrow whole-stage-codegen pass.

Scale: for a 2880x2880 detector this is 8.3 M rows — broadcast-able at a
pinch (~400 MB loose, so prefer persisting to Parquet and sort-merge/bucketed
joins at cluster scale; broadcast is fine for the 256x256 test detector).
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


def build_calib_pixels(spark: SparkSession, c: ImageControls) -> DataFrame:
    """Per-pixel calibration table:
    (y, x, tth, azim, q, dist_sq, pol, tth_idx, ring_idx, qbin, azim_band,
    azim_mask).
    """
    nx, ny = c.size_x, c.size_y
    rmat = rotation_matrix(c.tilt, c.rotation)
    px_mm_x = c.pixel_size_x / 1000.0
    px_mm_y = c.pixel_size_y / 1000.0

    base = spark.range(0, ny * nx).select(
        (F.col("id") / nx).cast("int").alias("y"),
        (F.col("id") % nx).cast("int").alias("x"),
    )
    dx = (F.col("x") + 0.5) * px_mm_x - c.center_x
    dy = (F.col("y") + 0.5) * px_mm_y - c.center_y
    lab_x = F.lit(float(rmat[0, 0])) * dx + F.lit(float(rmat[0, 1])) * dy
    lab_y = F.lit(float(rmat[1, 0])) * dx + F.lit(float(rmat[1, 1])) * dy
    lab_z = F.lit(float(rmat[2, 0])) * dx + F.lit(float(rmat[2, 1])) * dy + F.lit(
        c.distance
    )
    df = base.select(
        "y",
        "x",
        lab_x.alias("_lx"),
        lab_y.alias("_ly"),
        lab_z.alias("_lz"),
    )
    rho = F.sqrt(F.col("_lx") ** 2 + F.col("_ly") ** 2)
    tth = F.degrees(F.atan2(rho, F.col("_lz")))
    azim = F.pmod(
        F.degrees(F.atan2(F.col("_ly"), F.col("_lx"))) + F.lit(c.azmth_off),
        F.lit(360.0),
    )
    df = df.select(
        "y",
        "x",
        tth.alias("tth"),
        azim.alias("azim"),
        (
            (F.col("_lx") ** 2 + F.col("_ly") ** 2 + F.col("_lz") ** 2)
            / F.lit(c.distance**2)
        ).alias("dist_sq"),
    )
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
    df = (
        df.withColumn("tth_idx", tth_bin_index("tth", lo, hi, c.out_channels))
        .withColumn("ring_idx", tth_bin_index("tth", lo, hi, c.num_chans_om))
        .withColumn("qbin", q_bin_index("q", qlo, dq))
        .withColumn("azim_band", azim_band("azim"))
        .withColumn(
            "azim_mask",
            (F.col("azim") < c.lr_azimuth[0]) | (F.col("azim") > c.lr_azimuth[1]),
        )
    )
    return df
