"""Azimuthal integration as a hash aggregation (binned mean).

Reference parity: ``pytorch_integrate`` (pipeline.py:55-75) computes the
per-2theta-bin mean of corrected intensity ``I / pol * dist_sq**1.5``,
routing masked pixels to bin 0 (then discarding bin 0) and clamping the
per-bin count to >= 1 (pipeline.py:67-71). SURVEY §2.6 A1 — including the
deliberately polluted bin-0 semantics, reproduced here for golden parity.

Spark-first: one ``groupBy(bin).agg`` — partial aggregation gives the
map-side combine the reference gets from torch ``bincount``; 4 mask
variants run as 4 independent aggregations over the same scan (Catalyst
caches nothing across them, but the scan is columnar and the 4 plans can
reuse a cached pixels DataFrame upstream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def integrate_binned_mean(
    df: DataFrame,
    bin_col: Column,
    value_col: Column,
    mask_col: Column,
    extra_keys: Sequence[str] = (),
    drop_bin0: bool = True,
) -> DataFrame:
    """Per-bin mean of ``value_col`` over unmasked rows.

    ``mask_col`` true => row is routed to bin 0 (reference's discard bin);
    count clamped to >= 1 per pipeline.py:70-71. Returns
    ``extra_keys + (bin, sum_val, n_px, intensity)``.
    """
    keys = list(extra_keys)
    routed = df.withColumn(
        "bin", F.when(mask_col, F.lit(0)).otherwise(bin_col).cast("int")
    ).withColumn("_v", value_col)
    agg = routed.groupBy(*keys, "bin").agg(
        F.sum("_v").alias("sum_val"),
        F.count("*").alias("n_px"),
        (F.sum("_v") / F.greatest(F.count("*"), F.lit(1))).alias("intensity"),
    )
    if drop_bin0:
        agg = agg.where(F.col("bin") > 0)
    return agg
