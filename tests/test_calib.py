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


GEOMETRY_CASES = [
    ImageControls(size_x=64, size_y=64, center_x=4.8, center_y=4.8),
    ImageControls(
        size_x=64, size_y=64, center_x=4.8, center_y=4.8, tilt=5.0, rotation=30.0
    ),
    ImageControls(
        size_x=64, size_y=64, center_x=4.8, center_y=4.8, azmth_off=10.0
    ),
    ImageControls(
        size_x=64, size_y=64, center_x=4.8, center_y=4.8,
        tilt=-8.0, rotation=120.0, det_depth=0.5,
    ),
    ImageControls(
        size_x=64, size_y=64, center_x=4.8, center_y=4.8,
        tilt=3.0, rotation=45.0, det2theta=15.0,
    ),
    ImageControls(
        size_x=64, size_y=64, center_x=4.8, center_y=4.8,
        tilt=6.0, rotation=200.0, det_depth=1.2, det2theta=-20.0,
        azmth_off=5.0,
    ),
]
GEOMETRY_IDS = [
    "flat", "tilted", "azim-offset", "tilt-depth", "det2theta",
    "tilt-depth-det2theta",
]


@pytest.mark.parametrize("controls", GEOMETRY_CASES, ids=GEOMETRY_IDS)
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


# ---------------------------------------------------------------------------
# Reference-formula oracle (GetTthAzmG / GetTthAzmG2 / peneCorr /
# Polarization transcribed in the reference's own makeMat / np.inner style,
# GSASII_imports.py:974-1065, 556-579) — pins compute_maps_numpy to the
# instrument code, not just to itself.
# ---------------------------------------------------------------------------

def _ref_make_mat(angle_deg: float, axis: int) -> np.ndarray:
    cs, ss = np.cos(np.radians(angle_deg)), np.sin(np.radians(angle_deg))
    m = np.array([[1.0, 0.0, 0.0], [0.0, cs, -ss], [0.0, ss, cs]])
    return np.roll(np.roll(m, axis, axis=0), axis, axis=1)


def _ref_pene_corr(tth, dep, dist):
    return dep * (1.0 - np.cos(np.radians(tth))) * dist**2 / 1000.0


def _ref_maps(c: ImageControls):
    """Transcription of the reference's two map builders over pixel centers."""
    scalex, scaley = c.pixel_size_x / 1000.0, c.pixel_size_y / 1000.0
    tay, tax = np.mgrid[0.5: c.size_y + 0.5, 0.5: c.size_x + 0.5]
    x = tax * scalex
    y = tay * scaley
    dx = x - c.center_x
    dy = y - c.center_y
    tilt = c.tilt
    dist = c.distance / np.cos(np.radians(tilt))
    if c.det2theta:
        # GetTthAzmG (GSASII_imports.py:974-1019)
        T = _ref_make_mat(tilt, 0)
        R = _ref_make_mat(c.rotation, 2)
        MN = np.inner(R, np.inner(R, T))
        dxyz0 = np.inner(np.dstack([dx, dy, np.zeros_like(dx)]), MN)
        dxyz0 += np.array([0.0, 0.0, dist])
        if c.det_depth:
            u = dxyz0 / np.linalg.norm(dxyz0, axis=-1)[:, :, np.newaxis]
            ctth0 = np.dot(u, np.array([0.0, 0.0, 1.0]))
            tth0 = np.degrees(np.arccos(ctth0))
            dxyz0[:, :, 2] += _ref_pene_corr(tth0, c.det_depth, dist)
        tth_mat = _ref_make_mat(c.det2theta, 1)
        dxyz = np.inner(dxyz0, tth_mat.T)
        u = dxyz / np.linalg.norm(dxyz, axis=-1)[:, :, np.newaxis]
        tth = np.degrees(np.arccos(np.dot(u, np.array([0.0, 0.0, 1.0]))))
        azm = (
            np.degrees(np.arctan2(dxyz[:, :, 1], dxyz[:, :, 0]))
            + c.azmth_off + 720.0
        ) % 360.0
    else:
        # GetTthAzmG2 (GSASII_imports.py:1027-1046)
        MN = -np.inner(_ref_make_mat(c.rotation, 2), _ref_make_mat(tilt, 0))
        dz = np.dot(np.dstack([dx.T, dy.T, np.zeros_like(dx.T)]), MN).T[2]
        xyZ = dx**2 + dy**2 - dz**2
        tth0 = np.degrees(np.arctan(np.sqrt(xyZ) / (dist - dz)))
        dzp = _ref_pene_corr(tth0, c.det_depth, dist)
        tth = np.degrees(np.arctan2(np.sqrt(xyZ), dist - dz + dzp))
        azm = (np.degrees(np.arctan2(dy, dx)) + c.azmth_off + 720.0) % 360.0
    x0 = c.distance * np.tan(np.radians(tilt))
    x0x = x0 * np.cos(np.radians(c.rotation))
    x0y = x0 * np.sin(np.radians(c.rotation))
    distsq = c.distance**2
    g = ((dx - x0x) ** 2 + (dy - x0y) ** 2 + distsq) / distsq
    # Polarization(PolaVal, tth, azm - 90) (Make2ThetaAzimuthMap:553)
    cazm = np.cos(np.radians(azm - 90.0)) ** 2
    sazm = np.sin(np.radians(azm - 90.0)) ** 2
    p = c.pola_val
    pol = (
        ((1.0 - p) * cazm + p * sazm) * np.cos(np.radians(tth)) ** 2
        + (1.0 - p) * sazm + p * cazm
    )
    return {"tth": tth, "azim": azm, "dist_sq": g, "pol": pol}


@pytest.mark.parametrize("controls", GEOMETRY_CASES, ids=GEOMETRY_IDS)
def test_numpy_maps_match_reference_formulas(controls):
    got = compute_maps_numpy(controls)
    want = _ref_maps(controls)
    for key in ("tth", "azim", "dist_sq", "pol"):
        np.testing.assert_allclose(
            got[key], want[key], rtol=1e-12, atol=1e-12, err_msg=key
        )


# ---------------------------------------------------------------------------
# numChans derivation (GetEllipse/GetDetectorXY2 -> detector span of the
# IOtth window; cache_creation.py:324-333, GSASII_imports.py:798-935)
# ---------------------------------------------------------------------------

def _ref_get_ellipse2(tth, dxy, dist, cent, tilt, phi):
    sind = lambda a: np.sin(np.radians(a))  # noqa: E731
    cosd = lambda a: np.cos(np.radians(a))  # noqa: E731
    tand = lambda a: np.tan(np.radians(a))  # noqa: E731
    radii = [0, 0]
    stth = sind(tth)
    cosb, sinb, tanb = cosd(tilt), sind(tilt), tand(tilt)
    tbm, tbp = tand((tth - tilt) / 2.0), tand((tth + tilt) / 2.0)
    d = dist + dxy
    if tth + abs(tilt) < 90.0:
        fplus = d * tanb * stth / (cosb + stth)
        fminus = d * tanb * stth / (cosb - stth)
        vplus = d * (tanb + (1 + tbm) / (1 - tbm)) * stth / (cosb + stth)
        vminus = d * (tanb + (1 - tbp) / (1 + tbp)) * stth / (cosb - stth)
        radii[0] = np.sqrt((vplus + vminus) ** 2 - (fplus + fminus) ** 2) / 2.0
        radii[1] = (vplus + vminus) / 2.0
        zdis = (fplus - fminus) / 2.0
    else:
        f = d * abs(tanb) * stth / (cosb + stth)
        v = d * (abs(tanb) + tand(tth - abs(tilt)))
        delt = d * stth * (1.0 + stth * cosb) / (abs(sinb) * cosb * (stth + cosb))
        eps = (v - f) / (delt - v)
        radii[0] = -eps * (delt - f) / np.sqrt(eps**2 - 1.0)
        radii[1] = eps * (delt - f) / (eps**2 - 1.0)
        zdis = f + radii[1] * eps if tilt > 0 else -f
    elcent = [cent[0] + zdis * sind(phi), cent[1] - zdis * cosd(phi)]
    return elcent, phi, radii


def _ref_get_detector_xy2(dsp, azm, c: ImageControls):
    sind = lambda a: np.sin(np.radians(a))  # noqa: E731
    cosd = lambda a: np.cos(np.radians(a))  # noqa: E731
    tand = lambda a: np.tan(np.radians(a))  # noqa: E731
    tth = 2.0 * np.degrees(np.arcsin(c.wavelength / (2.0 * dsp)))
    dxy = c.det_depth * (1.0 - cosd(tth)) * c.distance**2 / 1000.0
    cent = [c.center_x, c.center_y]
    elcent, phi, radii = _ref_get_ellipse2(
        tth, dxy, c.distance, cent, c.tilt, c.rotation
    )
    phi = c.rotation - 90.0
    tilt, dist = c.tilt, c.distance
    stth, cosb = sind(tth), cosd(tilt)
    if radii[0] > 0.0:
        tanb = tand(tilt)
        fplus = dist * tanb * stth / (cosb + stth)
        fminus = dist * tanb * stth / (cosb - stth)
        zdis = (fplus - fminus) / 2.0
        rsqplus = radii[0] ** 2 + radii[1] ** 2
        rsqminus = radii[0] ** 2 - radii[1] ** 2
        R = rsqminus * cosd(2.0 * azm - 2.0 * phi) + rsqplus
        Q = (
            np.sqrt(2.0) * radii[0] * radii[1]
            * np.sqrt(R - 2.0 * zdis**2 * sind(azm - phi) ** 2)
        )
        P = 2.0 * radii[0] ** 2 * zdis * cosd(azm - phi)
        radius = (P + Q) / R
        xy = np.array([radius * cosd(azm), radius * sind(azm)])
        xy += cent
    else:
        sinb, tanb = abs(sind(tilt)), abs(tand(tilt))
        f = dist * tanb * stth / (cosb + stth)
        v = dist * (tanb + tand(tth - abs(tilt)))
        delt = dist * stth * (1 + stth * cosb) / (sinb * cosb * (stth + cosb))
        ecc = (v - f) / (delt - v)
        R = radii[1] * (ecc**2 - 1) / (1 - ecc * cosd(azm))
        if tilt > 0.0:
            offset = 2.0 * radii[1] * ecc + f
            xy = [-R * cosd(azm) - offset, -R * sind(azm)]
        else:
            offset = -f
            xy = [-R * cosd(azm) - offset, R * sind(azm)]
        xy = -np.array(
            [
                xy[0] * cosd(phi) + xy[1] * sind(phi),
                xy[0] * sind(phi) - xy[1] * cosd(phi),
            ]
        )
        xy += cent
    if c.det2theta:
        xy[0] += dist * tand(c.det2theta + c.tilt * sind(c.rotation))
    return xy


@pytest.mark.parametrize("controls", GEOMETRY_CASES, ids=GEOMETRY_IDS)
def test_detector_xy_matches_reference(controls):
    from xrddatapipeline_spark.calib.geometry import detector_xy

    for dsp in (1.2, 2.5, 6.0):
        for azm in (0.0, 37.0, 180.0, 291.0):
            got = detector_xy(dsp, azm, controls)
            want = _ref_get_detector_xy2(dsp, azm, controls)
            np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("controls", GEOMETRY_CASES, ids=GEOMETRY_IDS)
def test_derive_num_chans_matches_reference(controls):
    from xrddatapipeline_spark.calib.geometry import derive_num_chans

    lo, hi = controls.iotth
    wave = controls.wavelength
    dsp0 = wave / (2.0 * np.sin(np.radians(lo / 2.0)))
    dsp1 = wave / (2.0 * np.sin(np.radians(hi / 2.0)))
    x0 = _ref_get_detector_xy2(dsp0, 0.0, controls)[0]
    x1 = _ref_get_detector_xy2(dsp1, 0.0, controls)[0]
    want = int(1000 * (x1 - x0) / controls.pixel_size_x) // 2
    assert derive_num_chans(controls) == want


def test_imctrl_derives_num_chans():
    from xrddatapipeline_spark.calib.geometry import derive_num_chans
    from xrddatapipeline_spark.sources.controls import imctrl_to_controls

    d = {
        "wavelength": 0.24087, "distance": 1000.0, "center": [204.8, 204.8],
        "tilt": 0.0, "rotation": 0.0, "pixelSize": [200.0, 200.0],
        "size": [2048, 2048], "IOtth": [2.0, 12.0],
    }
    c = imctrl_to_controls(d)
    assert c.num_chans_om == derive_num_chans(c)
    # flat geometry sanity: span = D*(tan tth1 - tan tth0), halved in px
    want = int(
        1000.0
        * (1000.0 * (np.tan(np.radians(12.0)) - np.tan(np.radians(2.0))))
        / 200.0
    ) // 2
    assert abs(c.num_chans_om - want) <= 1
    # explicit numChans key wins
    c2 = imctrl_to_controls({**d, "numChans": 77})
    assert c2.num_chans_om == 77


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
