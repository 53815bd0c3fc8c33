"""Read-back query layer: the results-UI surface as DataFrame views.

The reference's UI re-aggregates pipeline outputs by globbing text files
(SURVEY §3.3) — contour/waterfall stacks of `.chi` integrals, per-image
diff lines, spot-count histograms, csim series. Here those are queries
over the columnar output tables, so the glob-and-parse IR disappears and
partition pruning serves point lookups:

- W2 sequence ordering: `orderBy(seq)` (seq parsed at ingest);
- W3 stride downsampling: auto-doubling k while count > max_lines
  (mainUI/contour.py:208-251) as a row_number filter;
- W4 manual range [min:max:step];
- J5 diff integrals: base - spotsmasked / base - arcsmasked via pivot;
- P18 sqrt display transform: signed sqrt of diffs;
- A23 spot-count histogram: `groupBy(qbin).count()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _seq_of(image_id: str | None = None):
    """seq from image_id 'dataset-NNNNN' (ingest convention)."""
    return F.substring_index(F.col("image_id"), "-", -1).cast("int")


def contour_matrix(
    integrals: DataFrame,
    kind: str = "om",
    max_lines: int = 128,
    seq_min: int | None = None,
    seq_max: int | None = None,
    step: int = 1,
) -> DataFrame:
    """W2/W3/W4: the contour/waterfall stack — one row per kept image with
    the integral as an ordered array column.

    Stride k starts at ``step`` and doubles until the kept-line count fits
    ``max_lines`` (contour.py:208-215's auto-doubling), computed from the
    image count — one tiny agg, no driver loop over files.
    """
    df = integrals.where(F.col("kind") == kind).withColumn("seq", _seq_of())
    if seq_min is not None:
        df = df.where(F.col("seq") >= seq_min)
    if seq_max is not None:
        df = df.where(F.col("seq") <= seq_max)
    n_images = df.select("image_id").distinct().count()
    k = max(step, 1)
    while n_images // k > max_lines:
        k *= 2
    w = Window.orderBy("seq")
    kept = (
        df.select("image_id", "seq").distinct()
        .withColumn("rn", F.row_number().over(w) - 1)
        .where(F.col("rn") % k == 0)
        .select("image_id")
    )
    return (
        df.join(F.broadcast(kept), "image_id")
        .groupBy("image_id", "seq")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("tth_idx", "intensity"))
            ).alias("_line")
        )
        .select(
            "image_id",
            "seq",
            F.transform(F.col("_line"), lambda s: s["intensity"]).alias(
                "intensities"
            ),
        )
        .orderBy("seq")
    )


def diff_integrals(integrals: DataFrame, sqrt_display: bool = False) -> DataFrame:
    """J5 (+P18): per-(image, tth) base/om/spots/arcs pivot with the
    base-minus-masked difference lines (mainUI/integrals.py:280-329)."""
    wide = (
        integrals.groupBy("image_id", "tth_idx", "tth")
        .pivot("kind", ["base", "om", "spotsmasked", "arcsmasked"])
        .agg(F.first("intensity"))
    )
    d_spots = F.col("base") - F.col("spotsmasked")
    d_arcs = F.col("base") - F.col("arcsmasked")
    if sqrt_display:
        signed_sqrt = lambda c: F.when(  # noqa: E731
            c >= 0, F.sqrt(c)
        ).otherwise(-F.sqrt(-c))
        d_spots, d_arcs = signed_sqrt(d_spots), signed_sqrt(d_arcs)
    return wide.select(
        "image_id", "tth_idx", "tth", "base", "om",
        d_spots.alias("diff_spots"), d_arcs.alias("diff_arcs"),
    )


def spot_count_histogram(spot_stats: DataFrame) -> DataFrame:
    """A23/F14: spots per Q-bin, background label dropped
    (mainUI/stats.py:114-117)."""
    return (
        spot_stats.where(F.col("spot_stat_label") != 0)
        .groupBy("image_id", "Qbin")
        .agg(F.count("*").alias("n_spots"))
    )


def spottiness_derived(grad_stats: DataFrame) -> DataFrame:
    """mainUI/spottiness.py:85-106: range-filter Q bins, derive mad-std and
    std/mad columns."""
    return (
        grad_stats.where(F.col("qbin") >= 0)
        .withColumn("mad_minus_std", F.col("mad_g") - F.col("std_g"))
        .withColumn(
            "std_over_mad",
            F.when(F.col("mad_g") != 0, F.col("std_g") / F.col("mad_g")),
        )
    )
