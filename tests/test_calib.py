"""Spark calib_pixels builder vs the numpy geometry oracle (SURVEY §7 step 2)."""

from __future__ import annotations

import numpy as np
import pytest

from xrddatapipeline_spark.calib.cache import build_calib_pixels
from xrddatapipeline_spark.calib.geometry import (
    ImageControls,
    compute_maps_numpy,
    tth_bin_index_numpy,
)


@pytest.mark.parametrize(
    "controls",
    [
        ImageControls(size_x=64, size_y=64, center_x=4.8, center_y=4.8),
        ImageControls(
            size_x=64, size_y=64, center_x=4.8, center_y=4.8, tilt=5.0, rotation=30.0
        ),
        ImageControls(
            size_x=64, size_y=64, center_x=4.8, center_y=4.8, azmth_off=10.0
        ),
    ],
    ids=["flat", "tilted", "azim-offset"],
)
def test_calib_matches_numpy(spark, controls):
    pdf = build_calib_pixels(spark, controls).toPandas()
    maps = compute_maps_numpy(controls)
    ys = pdf["y"].to_numpy()
    xs = pdf["x"].to_numpy()
    assert len(pdf) == controls.size_x * controls.size_y
    for col, key in [("tth", "tth"), ("azim", "azim"), ("q", "q"),
                     ("dist_sq", "dist_sq"), ("pol", "pol")]:
        np.testing.assert_allclose(
            pdf[col].to_numpy(), maps[key][ys, xs], rtol=1e-12, atol=1e-12,
            err_msg=col,
        )
    lo, hi = controls.iotth
    want_idx = tth_bin_index_numpy(maps["tth"][ys, xs], lo, hi, controls.out_channels)
    np.testing.assert_array_equal(pdf["tth_idx"].to_numpy(), want_idx)


def test_calib_plan_is_narrow(spark):
    """The build must be a single projection over range — no shuffle."""
    c = ImageControls(size_x=32, size_y=32)
    plan = build_calib_pixels(spark, c)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bucketed_pixel_join_is_exchange_free(spark, tmp_path):
    """Co-bucketed (y, x) tables — calib x flat-field — must sort-merge join
    with ZERO exchanges: neither side shuffles, ever, across repeated joins."""
    from pyspark.sql import functions as F

    from xrddatapipeline_spark.calib.cache import save_bucketed_pixel_table

    c = ImageControls(size_x=32, size_y=32)
    calib = build_calib_pixels(spark, c)
    flat = calib.select(
        "y", "x", (1.0 + (F.col("x") + F.col("y")) / 100.0).alias("flat")
    )
    save_bucketed_pixel_table(calib, "calib_bkt", 4, str(tmp_path / "calib"))
    save_bucketed_pixel_table(flat, "flat_bkt", 4, str(tmp_path / "flat"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("calib_bkt").join(spark.table("flat_bkt"), ["y", "x"])
        assert joined.count() == 32 * 32
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS calib_bkt")
        spark.sql("DROP TABLE IF EXISTS flat_bkt")
