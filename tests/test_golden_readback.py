"""Read-back layer vs the REAL reference outputs.

The reference snapshot ships a full tutorial output tree
(docs/GuiliangJun25_tutorial_output/: 40 `.chi` integrals over 10 images x
4 mask kinds, 10 spots_stats_df.csv / spots_stats_grad.csv pairs, csim
files, bilevel mask TIFFs, qbin-edge .npy) — the exact files its results
UI globs (mainUI/contour.py:170-251, integrals.py:280-329,
stats.py:106-135, spottiness.py:85-106). These tests ingest those REAL
files through our readers and run the read-back views over them, so the
query layer is proven against reference-produced data, not synthetic
fixtures. (The input TIFFs are stripped from the snapshot per
.MISSING_LARGE_BLOBS, so pixel-pipeline-vs-golden comparison stays
environment-blocked; this covers the read-back half.)
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pandas as pd
import pytest

GOLD = "/root/reference/docs/GuiliangJun25_tutorial_output"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD), reason="reference tutorial outputs not present"
)

KINDS = ("base", "om", "spotsmasked", "arcsmasked")


def _chi_frames() -> pd.DataFrame:
    from xrddatapipeline_spark.sinks import read_chi

    frames = []
    for path in sorted(glob.glob(f"{GOLD}/integrals/*.chi")):
        image_id, kind = os.path.basename(path)[:-4].rsplit("_", 1)
        pdf = read_chi(path)
        pdf["image_id"] = image_id
        pdf["kind"] = kind
        pdf["tth_idx"] = np.arange(len(pdf), dtype=np.int32)
        frames.append(pdf)
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def chi_long() -> pd.DataFrame:
    return _chi_frames()


@pytest.fixture(scope="module")
def integrals(spark, chi_long):
    return spark.createDataFrame(chi_long).cache()


def test_golden_chi_ingest(chi_long):
    """40 files = 10 images x 4 kinds, 2500 channels each (the tutorial's
    outChannels), one shared strictly-increasing tth grid per image."""
    per_file = chi_long.groupby(["image_id", "kind"]).size()
    assert len(per_file) == 40
    assert set(chi_long["kind"]) == set(KINDS)
    assert (per_file == 2500).all()
    for image_id, g in chi_long.groupby("image_id"):
        grids = {
            kind: kg.sort_values("tth_idx")["tth"].to_numpy()
            for kind, kg in g.groupby("kind")
        }
        base = grids["base"]
        assert (np.diff(base) > 0).all()
        for kind in KINDS[1:]:
            assert np.array_equal(grids[kind], base)


def test_contour_matrix_on_golden_chis(spark, integrals, chi_long):
    """W2/W3: the contour stack over the MA2b dataset's 7 om integrals —
    natural seq order, 2500-wide lines bit-equal to the parsed files, and
    contour.py:208-215's auto-doubling stride under a max_lines cap."""
    from xrddatapipeline_spark.plans.readback import contour_matrix

    ma2b = integrals.where(integrals.image_id.startswith("MA2b"))
    full = contour_matrix(ma2b, kind="om").toPandas()
    assert list(full["seq"]) == list(range(1, 8))
    for _, row in full.iterrows():
        want = (
            chi_long[
                (chi_long.image_id == row["image_id"])
                & (chi_long.kind == "om")
            ]
            .sort_values("tth_idx")["intensity"]
            .to_numpy()
        )
        got = np.asarray(row["intensities"])
        assert got.shape == (2500,)
        assert np.array_equal(got, want)

    # 7 images // k > 3 doubles k to 2: rows 0,2,4,6 kept -> seqs 1,3,5,7
    capped = contour_matrix(ma2b, kind="om", max_lines=3).toPandas()
    assert list(capped["seq"]) == [1, 3, 5, 7]


def test_diff_integrals_on_golden_chis(spark, integrals, chi_long):
    """J5 (+P18): the pivoted diff lines equal numpy subtraction of the
    parsed files. (The reference UI crosses its names — its 'spots diff'
    plots base - arcsmasked, integrals.py:280-287 via the :171-172 file
    map; we keep the literal mapping diff_spots = base - spotsmasked,
    pinned by the j5_diff_pivot oracle.)"""
    from xrddatapipeline_spark.plans.readback import diff_integrals

    got = (
        diff_integrals(integrals)
        .toPandas()
        .sort_values(["image_id", "tth_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == 10 * 2500
    wide = chi_long.pivot_table(
        index=["image_id", "tth_idx"], columns="kind", values="intensity"
    ).sort_index()
    assert np.array_equal(
        got["diff_spots"].to_numpy(),
        (wide["base"] - wide["spotsmasked"]).to_numpy(),
    )
    assert np.array_equal(
        got["diff_arcs"].to_numpy(),
        (wide["base"] - wide["arcsmasked"]).to_numpy(),
    )
    # P18 signed sqrt: negative diffs map to -sqrt(|diff|)
    # (integrals.py:299-313's np.where formulation)
    gs = (
        diff_integrals(integrals, sqrt_display=True)
        .toPandas()
        .sort_values(["image_id", "tth_idx"])
        .reset_index(drop=True)
    )
    d = (wide["base"] - wide["spotsmasked"]).to_numpy()
    want = np.where(d >= 0, np.sqrt(np.abs(d)), -np.sqrt(np.abs(d)))
    np.testing.assert_allclose(
        gs["diff_spots"].to_numpy(), want, rtol=0, atol=0
    )
    assert (d < 0).any(), "golden data should exercise the negative branch"


@pytest.fixture(scope="module")
def golden_stats() -> pd.DataFrame:
    frames = []
    for path in sorted(glob.glob(f"{GOLD}/stats/*_spots_stats_df.csv")):
        image_id = os.path.basename(path).replace("_spots_stats_df.csv", "")
        pdf = pd.read_csv(path)
        pdf["image_id"] = image_id
        frames.append(pdf)
    return pd.concat(frames, ignore_index=True)


def test_spot_histogram_on_golden_stats(spark, golden_stats):
    """A23/F14: per-Qbin spot counts over the real stats CSVs equal
    stats.py:114-117's value_counts after dropping the background label."""
    from xrddatapipeline_spark.plans.readback import spot_count_histogram

    df = spark.createDataFrame(golden_stats)
    got = (
        spot_count_histogram(df)
        .toPandas()
        .set_index(["image_id", "Qbin"])["n_spots"]
        .sort_index()
    )
    want = (
        golden_stats[golden_stats["spot_stat_label"] != 0]
        .groupby(["image_id", "Qbin"])
        .size()
        .sort_index()
    )
    assert got.size == want.size
    assert (got.to_numpy() == want.to_numpy()).all()
    # the tutorial data is non-trivial: every image has spots, several bins
    assert want.groupby("image_id").sum().min() > 0


def test_spottiness_derived_on_golden_grad_stats(spark):
    """mainUI/spottiness.py:85-106 over the real grad CSVs: negative Qbins
    dropped, MAD-STD and STD/MAD derived columns match pandas exactly."""
    from xrddatapipeline_spark.plans.readback import spottiness_derived

    frames = []
    for path in sorted(glob.glob(f"{GOLD}/stats/*_spots_stats_grad.csv")):
        image_id = os.path.basename(path).replace("_spots_stats_grad.csv", "")
        pdf = pd.read_csv(path)
        pdf["image_id"] = image_id
        frames.append(pdf)
    grad = pd.concat(frames, ignore_index=True).rename(
        columns={"Qbin": "qbin", "std": "std_g", "mad": "mad_g"}
    )
    assert (grad["qbin"] < 0).any(), "golden data exercises the Q filter"

    df = spark.createDataFrame(grad)
    got = (
        spottiness_derived(df)
        .toPandas()
        .sort_values(["image_id", "qbin"])
        .reset_index(drop=True)
    )
    want = (
        grad[grad["qbin"] >= 0]
        .sort_values(["image_id", "qbin"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    # single-sample bins have NaN std in the golden files — propagate
    assert np.array_equal(
        got["mad_minus_std"].to_numpy(),
        (want["mad_g"] - want["std_g"]).to_numpy(),
        equal_nan=True,
    )
    nz = (want["mad_g"] != 0).to_numpy()
    assert np.array_equal(
        got["std_over_mad"].to_numpy()[nz],
        (want["std_g"] / want["mad_g"]).to_numpy()[nz],
        equal_nan=True,
    )


def test_golden_csim_files_parse():
    """K7/A20 sink format round-trip: every *_csim.txt is two tab-separated
    cosines in [0, 1] (vs previous image, vs first image), and the first
    image of each dataset is ~1.0 on both (csim against itself)."""
    paths = sorted(glob.glob(f"{GOLD}/stats/*_csim.txt"))
    assert len(paths) == 10
    firsts = []
    for path in paths:
        vals = [float(v) for v in open(path).read().split()]
        assert len(vals) == 2
        assert all(0.0 <= v <= 1.0 for v in vals)
        m = re.search(r"-(\d+)_csim", path)
        if int(m.group(1)) == 1:
            firsts.append(vals)
    for prev_sim, first_sim in firsts:
        assert prev_sim > 0.999 and first_sim > 0.999


def test_golden_mask_tiffs_decode():
    """K3/S2: the reference's tifffile-written boolean mask TIFFs (1-bit
    bilevel, BitsPerSample tag absent) decode through read_tiff_gray; spot
    and arc pixel sets are disjoint subsets of the outlier mask
    (classification.py's partition of the om set)."""
    from xrddatapipeline_spark.sources.tiff import read_tiff_gray

    def m(name):
        with open(f"{GOLD}/masks/{name}", "rb") as f:
            return read_tiff_gray(f.read())

    for image_id in ("MA2-00001", "MA2b-00003"):
        om = m(f"{image_id}_outliermask.tif")
        spots = m(f"{image_id}_spots.tif")
        arcs = m(f"{image_id}_arcs.tif")
        base = m(f"{image_id}_base.tif")
        assert om.shape == spots.shape == arcs.shape == base.shape
        assert om.dtype == bool and om.shape == (2048, 2048)
        assert 0 < om.sum() < om.size
        assert not (spots & arcs).any()
        assert (spots | arcs).sum() <= om.sum()

    edges = np.load(f"{GOLD}/stats/MA2_qbinedges.npy")
    assert edges.ndim == 1 and (np.diff(edges) > 0).all()


def test_stats_csv_header_matches_golden(spark, tmp_path):
    """K5 format parity: export_stats_csv writes exactly the reference's
    CSV header (no image_id column — the filename carries the image), as
    pinned by the tutorial goldens."""
    from xrddatapipeline_spark.sinks import export_stats_csv

    golden_header = open(
        f"{GOLD}/stats/MA2-00001_spots_stats_df.csv"
    ).readline().strip()
    stats = spark.createDataFrame(
        [("img-1", 0, 100, 5.1, 349, 525734340.0, 331351.88, 20621.08, 1)],
        "image_id string, spot_stat_label int, area long, medianQ double, "
        "Qbin int, intensity_sum double, intensity_max double, "
        "intensity_mean double, on_arc int",
    )
    path = export_stats_csv(stats, "img-1", str(tmp_path / "s.csv"))
    assert open(path).readline().strip() == golden_header
