"""Gradient classification stage (SURVEY §2.9, classification.py:447-608).

Refines the shape classifier's arc/spot decision using second derivatives
along the radial / azimuthal directions: a single-crystal spot embedded in
a texture arc shows strong radial curvature, so clusters of extreme
azimuthal curvature inside arc-classified regions are cut out and flipped
to spots (`split_grad_with_Q_groupby`). Composition:

  M8 inpaint -> M7 x2 (2nd radial / 2nd azim derivative)     [one kernel]
  A12 per-image global percentiles of the 2nd radial grad
  A10/J2 per-label median Q broadcast back
  A11 central-band (|Q - medQ| < 0.02) p20 of 2nd radial -> on_arc
  gradient mask (2nd azim < global threshold) ∧ on_arc -> M1 relabel
  A13 per-gradient-cluster circular-median azimuth + parent label
  A14 swap: parent-arc pixels within 5 x Qwidth of the cluster's azimuth
      flip arc -> spot (new_spot / new_arc case-when)

Thresholds (threshold_percentile=0.1 => p0.1/p10, central band 0.02,
swap radius 5 x Qwidth) follow classification.py:849-860 / SURVEY §2.9.

Scale shape: ONE applyInPandas kernel pass per image emits the two
gradient columns; everything after is hash aggregation on (image_id,
label) keys (bounded cardinality) plus broadcast joins — the same
one-shuffle discipline as the rest of the per-image plan.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xrddatapipeline_spark.calib.geometry import ImageControls
from xrddatapipeline_spark.functions.binning import in_circular_range
from xrddatapipeline_spark.operators import kernels
from xrddatapipeline_spark.operators.raster import label_pixels

CENTRAL_BAND_Q = 0.02
THRESHOLD_PCT = 0.1  # percent, classification.py:849-860
SWAP_RADIUS_QWIDTHS = 5.0


#: ghost-row halo for exact band tiling: inpaint stencil radius 2, then two
#: successive 3x3 gradient convolutions (radius 1 each) — a core row depends
#: on at most 4 rows either side, so a 4-row halo reproduces the whole-image
#: result bit-for-bit (zero padding only ever applies at true image edges).
_GRAD_HALO = 4


def second_gradients(
    px: DataFrame, controls: ImageControls, band_rows: int = 512
) -> DataFrame:
    """M8 + M7 x2 per image: (image_id, y, x, grad_r2, grad_a2).

    Inpaints base-masked pixels (normalized Gaussian convolution), then
    applies the r̂/φ̂-projected 3x3 gradient twice.

    Images taller than ``band_rows`` are tiled into horizontal bands with
    ``_GRAD_HALO`` ghost rows (halo pixels are duplicated into adjacent
    bands by the explode below, ~2*4/band_rows row overhead): the kernel
    is EXACT per band, and per-image parallelism becomes
    n_images * n_bands instead of n_images — on a 32-core node an 8-image
    2880^2 batch runs 48 kernel tasks, not 8; on a cluster the same
    tiling bounds task memory at band_rows*width regardless of detector
    size."""
    h, w = controls.size_y, controls.size_x
    cy = controls.center_y / (controls.pixel_size_y / 1000.0)
    cx = controls.center_x / (controls.pixel_size_x / 1000.0)
    n_bands = max(1, -(-h // band_rows))
    bh = band_rows
    halo = _GRAD_HALO

    def _grad_rows(pdf: pd.DataFrame, y0: int, y1: int,
                   core0: int, core1: int) -> pd.DataFrame:
        """Exact kernel over raster rows [y0, y1); emit rows [core0, core1)."""
        img = np.zeros((y1 - y0, w), dtype=np.float64)
        bad = np.ones((y1 - y0, w), dtype=bool)
        ys = pdf["y"].to_numpy()
        xs = pdf["x"].to_numpy()
        img[ys - y0, xs] = pdf["intensity"].to_numpy()
        bad[ys - y0, xs] = pdf["base_mask"].to_numpy()
        inp = kernels.inpaint_masked(img, bad)
        # shifting the raster down by y0 moves the beam center with it
        r1, a1 = kernels.radial_azim_gradient(inp, cy - y0, cx)
        r2, _ = kernels.radial_azim_gradient(r1, cy - y0, cx)
        _, a2 = kernels.radial_azim_gradient(a1, cy - y0, cx)
        keep = (ys >= core0) & (ys < core1)
        ys, xs = ys[keep], xs[keep]
        return pd.DataFrame(
            {
                "image_id": np.repeat(pdf["image_id"].iloc[0], ys.size),
                "y": ys.astype(np.int32),
                "x": xs.astype(np.int32),
                "grad_r2": r2[ys - y0, xs],
                "grad_a2": a2[ys - y0, xs],
            }
        )

    schema = "image_id string, y int, x int, grad_r2 double, grad_a2 double"
    src = px.select("image_id", "y", "x", "intensity", "base_mask")
    if n_bands == 1:
        return src.groupBy("image_id").applyInPandas(
            lambda pdf: _grad_rows(pdf, 0, h, 0, h), schema
        )

    yb = F.floor(F.col("y") / bh).cast("int")
    cand = F.array(yb - 1, yb, yb + 1)
    bands = F.filter(
        cand,
        lambda b: (b >= 0) & (b < n_bands)
        & (F.col("y") >= b * bh - halo)
        & (F.col("y") < (b + 1) * bh + halo),
    )

    def _grad_band(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band = int(key[1])
        y0, y1 = max(band * bh - halo, 0), min((band + 1) * bh + halo, h)
        return _grad_rows(pdf, y0, y1, band * bh, min((band + 1) * bh, h))

    return (
        src.withColumn("band", F.explode(bands))
        .groupBy("image_id", "band")
        .applyInPandas(_grad_band, schema)
    )


@dataclass
class GradientStageResult:
    pixel_flags: DataFrame   # (image_id, y, x, label, new_spot, new_arc)
    on_arc_labels: DataFrame  # (image_id, label, p20_r2, on_arc)
    grad_clusters: DataFrame  # (image_id, newlabel, parent_label, med_azim, n_px)
    # frames persisted by gradient_classify; the caller (or
    # ImagePlanResult.unpersist_all) drops them after the batch is written
    cached: tuple = ()


def gradient_classify(
    px: DataFrame,
    lpx: DataFrame,
    label_table: DataFrame,
    controls: ImageControls,
    barrier_fn=None,
    sparse_hint=None,
) -> GradientStageResult:
    """The A10-A14 dataflow over labeled outlier pixels.

    ``px``: calib-joined pixels with base_mask; ``lpx``: labeled cluster
    pixels with (q, azim); ``label_table``: shape-classifier output with
    (area, diff_azim, diff_q, classifier).

    ``barrier_fn`` (default ``persist``) materializes the dense gradient
    frame; run_image_plan passes its eager-checkpoint barrier so the
    kernel provably runs ONCE — a lazy persist lets two consumer branches
    of the same job race the cache and compute the kernel twice (measured
    at 8 x 2880^2: two full shuffle+kernel stage pairs).

    ``sparse_hint`` (default identity) wraps the SPARSE side of
    sparse⋈dense joins — run_image_plan passes ``F.broadcast`` under its
    checkpoint barrier, where LogicalRDD stats are unknown and AQE would
    otherwise sort-merge-join, shuffling the dense gradient side.
    """
    shape = (controls.size_y, controls.size_x)
    if barrier_fn is None:
        barrier_fn = lambda df: df.persist()  # noqa: E731
    if sparse_hint is None:
        sparse_hint = lambda df: df  # noqa: E731
    # the dense 2nd-gradient kernel output fans out to four consumers
    # (thresholds, med_q, central-band p20, gradient mask)
    grads = barrier_fn(second_gradients(px, controls))

    # A12: per-image global thresholds of the gradient distributions.
    # Exact percentiles over the dense raster go through ONE reducer per
    # image whatever the formulation; Spark's `percentile` agg merges an
    # 8.3 M-entry value-count hash map there (~45 s/image profiled), while
    # numpy's sort-based percentile on the same Arrow batch is sub-second
    # — same linear-interpolation semantics, same exchange. The 8-row
    # result is barriered because BOTH consumers (on_arc, gradient mask)
    # would otherwise recompute the full-raster aggregation.
    def _pct(pdf: pd.DataFrame) -> pd.DataFrame:
        r2 = pdf["grad_r2"].to_numpy()
        return pd.DataFrame(
            {
                "image_id": [pdf["image_id"].iloc[0]],
                "r2_p_lo": [np.percentile(r2, THRESHOLD_PCT)],
                "r2_p10": [np.percentile(r2, 10.0)],
                "a2_p_lo": [np.percentile(pdf["grad_a2"].to_numpy(), THRESHOLD_PCT)],
            }
        )

    thresholds = barrier_fn(
        grads.select("image_id", "grad_r2", "grad_a2")
        .groupBy("image_id")
        .applyInPandas(
            _pct,
            "image_id string, r2_p_lo double, r2_p10 double, a2_p_lo double",
        )
    )

    lg = sparse_hint(lpx).join(grads, ["image_id", "y", "x"])

    # A10 + J2: per-label median Q broadcast back
    med_q = lg.groupBy("image_id", "label").agg(F.median("q").alias("med_q"))
    lg = lg.join(F.broadcast(med_q), ["image_id", "label"])

    # A11: central-band p20 of the 2nd radial gradient; on_arc if below the
    # image-global p10 (strong negative curvature = ridge, not noise)
    central = lg.where(F.abs(F.col("q") - F.col("med_q")) < CENTRAL_BAND_Q)
    p20 = central.groupBy("image_id", "label").agg(
        F.expr("percentile(grad_r2, 0.2)").alias("p20_r2")
    )
    on_arc = barrier_fn(
        p20.join(F.broadcast(thresholds.select("image_id", "r2_p10")), "image_id")
        .withColumn("on_arc", F.col("p20_r2") < F.col("r2_p10"))
        .select("image_id", "label", "p20_r2", "on_arc")
    )  # tiny (one row per label); feeds mask, swaps, flags, caller

    # gradient mask: extreme 2nd azim derivative inside on_arc clusters
    grad_mask_px = (
        lg.join(
            F.broadcast(on_arc.where("on_arc").select("image_id", "label")),
            ["image_id", "label"],
        )
        .join(F.broadcast(thresholds.select("image_id", "a2_p_lo")), "image_id")
        .where(F.col("grad_a2") < F.col("a2_p_lo"))
        .select("image_id", "y", "x")
    )

    # M1 relabel the gradient mask -> gradient clusters
    relabeled = label_pixels(grad_mask_px, shape=shape, connectivity=2).withColumnRenamed(
        "label", "newlabel"
    )

    # A13: per-gradient-cluster circular azimuth median (via plain + flipped
    # axis, A7-style) and parent label
    gc = relabeled.join(
        lpx.select("image_id", "y", "x", "label", "azim", "azim_flip"),
        ["image_id", "y", "x"],
    )
    clusters = gc.groupBy("image_id", "newlabel").agg(
        F.first("label").alias("parent_label"),
        F.median("azim").alias("med_azim"),
        F.median("azim_flip").alias("med_azim_flip"),
        F.count("*").alias("n_px"),
    )
    # pick the representation whose spread was narrower is overkill for a
    # median; re-wrap the flipped median back to the plain axis when the
    # plain median straddles the 0/360 seam (|med - wrapped(medflip)| large)
    clusters = clusters.withColumn(
        "med_azim",
        F.when(
            F.abs(F.pmod(F.col("med_azim_flip") - 180.0 + 360.0, F.lit(360.0)) - F.col("med_azim")) > 90.0,
            F.pmod(F.col("med_azim_flip") - 180.0 + 360.0, F.lit(360.0)),
        ).otherwise(F.col("med_azim")),
    ).drop("med_azim_flip")

    # A14 swap + final case-when (classification.py:575-606): the gradient
    # view (`on_arc`) is the arc authority — a spot merged into an arc
    # inflates the shape classifier's Q spread, which is exactly the case
    # this stage repairs. Pixels of an on_arc label within 5 x Qwidth
    # (circular) of a gradient cluster's azimuth are cut out as spots;
    # the remainder of the on_arc label is arc; everything else is spot.
    arc_parents = (
        on_arc.where("on_arc")
        .join(
            label_table.select("image_id", "label", "diff_q"),
            ["image_id", "label"],
        )
        .select("image_id", F.col("label").alias("parent_label"), "diff_q")
    )
    swaps = (
        clusters.join(F.broadcast(arc_parents), ["image_id", "parent_label"])
        .select(
            "image_id",
            "parent_label",
            "med_azim",
            (F.col("diff_q") * SWAP_RADIUS_QWIDTHS).alias("swap_radius"),
        )
    )
    flagged = (
        lpx.join(
            F.broadcast(on_arc.select("image_id", "label", "on_arc")),
            ["image_id", "label"],
            "left",
        )
        .fillna({"on_arc": False})
        .join(
            F.broadcast(swaps.withColumnRenamed("parent_label", "label")),
            ["image_id", "label"],
            "left",
        )
        .withColumn(
            "near_cut",
            F.coalesce(
                in_circular_range(F.col("azim"), F.col("med_azim"), F.col("swap_radius")),
                F.lit(False),
            ),
        )
        .groupBy("image_id", "y", "x", "label", "on_arc")
        .agg(F.max(F.col("near_cut").cast("int")).alias("near_cut"))
        .withColumn(
            "new_spot", ~F.col("on_arc") | (F.col("near_cut") == 1)
        )
        .withColumn(
            "new_arc", F.col("on_arc") & (F.col("near_cut") == 0)
        )
        .select("image_id", "y", "x", "label", "new_spot", "new_arc")
    )
    return GradientStageResult(
        pixel_flags=flagged,
        on_arc_labels=on_arc,
        grad_clusters=clusters,
        cached=(grads, on_arc, thresholds),
    )
