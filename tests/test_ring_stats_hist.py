"""Histogram ring-stat route == array route, exactly (med/mad/counts)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from xrddatapipeline_spark.operators.ring_stats import (
    flag_outliers,
    group_median_mad,
    group_median_mad_hist,
)


def _random_groups(seed: int, n_groups: int = 40) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_groups):
        n = int(rng.integers(1, 60))  # odd/even/min_count edge cases
        # narrow range forces heavy value collisions (the histogram case)
        vals = rng.integers(0, 15, size=n)
        # sprinkle extreme outliers
        vals[rng.random(n) < 0.1] += 1000
        rows.extend((g, int(v)) for v in vals)
    return pd.DataFrame(rows, columns=["grp", "val"])


def test_hist_matches_array_route_exactly(spark):
    pdf = _random_groups(7)
    df = spark.createDataFrame(pdf)
    a = (
        group_median_mad(df, ["grp"], "val", min_count=3, esd_mul=3.0)
        .toPandas().sort_values("grp").reset_index(drop=True)
    )
    h = (
        group_median_mad_hist(df, ["grp"], "val", min_count=3, esd_mul=3.0)
        .toPandas().sort_values("grp").reset_index(drop=True)
    )
    assert list(a.columns) == list(h.columns)
    assert (a["grp"] == h["grp"]).all()
    assert (a["n_px"] == h["n_px"]).all()
    assert np.array_equal(a["med"].to_numpy(), h["med"].to_numpy())
    assert np.array_equal(a["mad"].to_numpy(), h["mad"].to_numpy())
    assert (a["n_outliers"] == h["n_outliers"]).all()
    # cross-check medians against numpy on the raw data
    for g, sub in pdf.groupby("grp"):
        if len(sub) < 3:
            continue
        row = h[h.grp == g].iloc[0]
        assert row["med"] == np.median(sub["val"])
        assert row["mad"] == np.median(np.abs(sub["val"] - np.median(sub["val"])))


def test_flag_outliers_histogram_flags_same_rows(spark):
    pdf = _random_groups(11)
    df = spark.createDataFrame(pdf)
    base = (
        flag_outliers(df, ["grp"], "val", esd_mul=3.0, min_count=5)
        .select("grp", "val", "is_outlier")
        .toPandas().sort_values(["grp", "val"]).reset_index(drop=True)
    )
    hist = (
        flag_outliers(df, ["grp"], "val", esd_mul=3.0, min_count=5,
                      histogram=True)
        .select("grp", "val", "is_outlier")
        .toPandas().sort_values(["grp", "val"]).reset_index(drop=True)
    )
    assert (base["is_outlier"] == hist["is_outlier"]).all()
    assert base["is_outlier"].sum() > 0
