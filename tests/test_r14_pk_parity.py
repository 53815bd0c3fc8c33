"""Round-14 packed-key parity pins: the single-long join/group keys the
dense barrier stages switched to (``_pk_expr`` — (img_idx << 26) | y*8192+x
for pixel probes, (img_idx << 32) | ring_idx for ring stats) must produce
EXACTLY the rows of the (image_id, y, x) / (image_id, ring_idx) forms they
replaced. Multi-image fixtures so the image-index bits are actually
exercised, plus boundary pixels (y = x = size-1) via the dense detector
grid."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.fixtures_images import CONTROLS, images_long_df, make_image
from xrddatapipeline_spark.plans.image_pipeline import (
    integrate_and_spottiness,
    join_calib,
    labeled_pixels_frame,
    outlier_pixels,
    with_base_mask,
)


@pytest.fixture(scope="module")
def px2(spark):
    """Two-image calib-joined, base-masked dense pixel frame."""
    pixels = images_long_df(
        spark,
        [
            ("synth", 0, make_image(CONTROLS, seq=0)),
            ("synth", 1, make_image(CONTROLS, seq=1)),
        ],
    )
    px = with_base_mask(
        join_calib(pixels, None, broadcast=True, controls=CONTROLS),
        controls=CONTROLS,
    ).persist()
    px.count()
    ids = sorted(r[0] for r in px.select("image_id").distinct().collect())
    return px, {s: i for i, s in enumerate(ids)}


def _sorted(df, keys):
    return (
        df.toPandas()
        .sort_values(keys)
        .reset_index(drop=True)
        .reindex(sorted(df.columns), axis=1)
    )


def test_outlier_pixels_packed_key_parity(px2):
    px, idx = px2
    legacy = _sorted(outlier_pixels(px, esd_mul=CONTROLS.esd_mul),
                     ["image_id", "y", "x"])
    packed = _sorted(
        outlier_pixels(px, esd_mul=CONTROLS.esd_mul, image_index=idx),
        ["image_id", "y", "x"],
    )
    assert len(legacy) > 0
    pd.testing.assert_frame_equal(legacy, packed, check_exact=True)


def test_labeled_pixels_frame_packed_key_parity(px2):
    px, idx = px2
    shape = (CONTROLS.size_y, CONTROLS.size_x)
    outliers = outlier_pixels(px, esd_mul=CONTROLS.esd_mul).localCheckpoint()
    keys = ["image_id", "y", "x"]
    # closed-form branch (controls given: 4-column probe + trig recompute)
    legacy = _sorted(
        labeled_pixels_frame(
            px, outliers, shape, sparse_hint=F.broadcast,
            controls=CONTROLS, closing_radius=1,
        ),
        keys,
    )
    packed = _sorted(
        labeled_pixels_frame(
            px, outliers, shape, sparse_hint=F.broadcast,
            controls=CONTROLS, closing_radius=1, image_index=idx,
        ),
        keys,
    )
    assert len(legacy) > 0
    pd.testing.assert_frame_equal(legacy, packed, check_exact=True)
    # calib-table branch (no controls: 7-column probe)
    legacy7 = _sorted(
        labeled_pixels_frame(
            px, outliers, shape, sparse_hint=F.broadcast, closing_radius=1,
        ),
        keys,
    )
    packed7 = _sorted(
        labeled_pixels_frame(
            px, outliers, shape, sparse_hint=F.broadcast, closing_radius=1,
            image_index=idx,
        ),
        keys,
    )
    pd.testing.assert_frame_equal(legacy7, packed7, check_exact=True)
    # the two probe branches agree with each other too (bit-identical trig)
    pd.testing.assert_frame_equal(legacy, legacy7, check_exact=True)


def test_integrate_and_spottiness_packed_key_parity(px2):
    px, idx = px2
    shape = (CONTROLS.size_y, CONTROLS.size_x)
    outliers = outlier_pixels(px, esd_mul=CONTROLS.esd_mul).localCheckpoint()
    lpx = labeled_pixels_frame(
        px, outliers, shape, sparse_hint=F.broadcast,
        controls=CONTROLS, closing_radius=1,
    ).localCheckpoint()
    flags = lpx.select(
        "image_id", "y", "x",
        F.lit(True).alias("is_om"),
        (F.pmod(F.col("x"), F.lit(2)) == 0).alias("is_spot_px"),
        (F.pmod(F.col("x"), F.lit(2)) == 1).alias("is_arc_px"),
    ).localCheckpoint()
    keys = ["image_id", "tth_idx", "qbin"]
    legacy = _sorted(
        integrate_and_spottiness(px, flags, CONTROLS,
                                 sparse_hint=F.broadcast),
        keys,
    )
    packed = _sorted(
        integrate_and_spottiness(px, flags, CONTROLS,
                                 sparse_hint=F.broadcast, image_index=idx),
        keys,
    )
    assert len(legacy) > 0
    assert legacy["n_masked"].sum() > 0
    pd.testing.assert_frame_equal(legacy, packed, check_exact=True)
