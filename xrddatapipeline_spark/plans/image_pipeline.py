"""The per-image XRD reduction plan, composed as DataFrame transforms.

Mirrors ``run_iteration`` (pipeline.py:78-567) and the groupby
classification path (classification.py:373-444; SURVEY §2.9, §3.1 step 4),
re-expressed Spark-first:

    pixels ⋈ calib_pixels          (J1; broadcast for small detectors)
      → base mask                  (F1-F3: nonpositive ∨ azim-range ∨ predef)
      → ring median/MAD outliers   (A2/A4/J7 as groupBy + broadcast-back)
      → binary closing             (M2 kernel)
      → cluster labeling           (M1 kernel)
      → shape classification       (A5-A9: area / azim-extent / Q-extent)
      → 4 integrals                (A1, base/om/spots/arcs)
      → spot & spottiness stats    (A15-A17)
      → cosine similarity          (J4/W1/A20 as window + agg)

Every stage returns a DataFrame; nothing collects to the driver. At 100 TB
scale the plan shuffles on image_id (kernel stages) and on the small
aggregation keys; calib join broadcasts below ~10 MB and bucket-joins above.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from xrddatapipeline_spark.barrier import release as _release
from xrddatapipeline_spark.calib.geometry import ImageControls
from xrddatapipeline_spark.functions.binning import tth_bin_center
from xrddatapipeline_spark.operators.ring_stats import flag_outliers
from xrddatapipeline_spark.operators.raster import close_mask_pixels, label_pixels

#: ring outlier stage: histogram (per distinct intensity) vs array (per
#: pixel) order-stat route. Lockstep-tested exactly equal; the histogram
#: shuffle carries ~35-65x fewer rows for quantized detector counts
#: (exchange metrics pinned in tests/test_ring_stats_hist.py).
#: History: an earlier A/B (pre-round-14) read the histogram route ~10%
#: SLOWER locally and defaulted to array — but that measurement ran under
#: BypassMergeSortShuffleWriter (pathologically slow on this host, fixed
#: by bypassMergeThreshold=1 in session.py), which swamped the per-row
#: shuffle cost the histogram route removes. Re-measured round 14 under
#: the serialized-sort writer at 8 x 2880^2 / 2500 rings / local[32]
#: (scripts/ab_outlier_route_r14.py, alternating A/B): histogram median
#: 11.8 s vs array 39.2 s per batch pass — histogram wins EVERY pairwise
#: rep, so it is now the default on both local and cluster (where the
#: row win only grows — the shuffle crosses a network).
#: Env override XRDSPARK_OUTLIER_HISTOGRAM=1/0 for A/B runs.
import os as _os

OUTLIER_HISTOGRAM = _os.environ.get("XRDSPARK_OUTLIER_HISTOGRAM", "1") == "1"

#: (applicationId, shapes, stage-set) keys whose kernel-scratch warmup job
#: has already been submitted this process — python workers persist across
#: batches within a session, so one warmup per session covers them all and
#: repeat submissions only occupy task slots (see run_image_plan).
#: Guarded by a lock: two CONCURRENT run_image_plan calls (the bench's
#: default prep mode runs the pilot alongside the cold batch) would
#: otherwise both pass the check before either records, double-submitting
#: the ~96-task-slot warmup job round 11 worked to eliminate.
_WARMUP_SUBMITTED: set = set()
import threading as _threading  # noqa: E402

_WARMUP_LOCK = _threading.Lock()


def _warmup_missing(
    base, bands: bool, hmax: bool, submitted: set
) -> frozenset:
    """Scratch-warmup components still needed for `base` (session, shapes).

    Tracked per COMPONENT so a plan variant that needs a subset of an
    already-warmed set (e.g. h_maxima=False after an h-on call) submits
    nothing instead of a redundant bands-only job (round 11 — the no-op
    job still cost ~96 task slots of worker round-trips per session)."""
    needed = set()
    if bands:
        needed.add("bands")
    if hmax:
        needed.add("hmax")
    return frozenset(
        p for p in needed if (base, p) not in submitted
    )

# classification thresholds — classification.py:849-860 / SURVEY §2.9
Q_MAX = 0.1
AZIM_MIN = 3.5
AZIM_Q_SHAPE_MIN = 100.0
MIN_ARC_AREA = 100


def join_calib(
    pixels: DataFrame,
    calib: DataFrame | None,
    broadcast: bool = True,
    controls: ImageControls | None = None,
) -> DataFrame:
    """J1: image ⋈ calibration maps on (y, x) — or, when ``calib`` is
    None, compute the calibration columns closed-form on the pixel rows
    (``with_calib_columns``): zero joins, zero shuffles; codegen'd trig
    per row is cheaper than sorting 8.3 M rows per image for a join. The
    join path remains for externally-measured per-pixel tables (flat
    fields, dark frames) that cannot be recomputed. Broadcast for
    test-sized detectors; at 8.3 Mpx store every such table via
    ``calib.cache.save_bucketed_pixel_table`` so the sort-merge join is
    exchange-free (see test_bucketed_pixel_join_is_exchange_free)."""
    if calib is None:
        from xrddatapipeline_spark.calib.cache import with_calib_columns

        assert controls is not None
        return with_calib_columns(pixels, controls)
    c = F.broadcast(calib) if broadcast else calib
    return pixels.join(c, ["y", "x"])


def with_base_mask(
    px: DataFrame, controls: ImageControls | None = None
) -> DataFrame:
    """F1-F3: nonpositive ∨ azimuth-range ∨ the .immask geometric masks
    (pipeline.py:148-165). When ``controls.extra["immask"]`` carries a
    parsed mask record (sources.controls.parse_immask), its OR-composition
    folds into base_mask as pure column expressions — zero extra
    exchanges, stays in whole-stage codegen. The predef RASTER branch
    (a .tif mask, cache_creation.py:239-246) is wired by run_image_plan
    (it needs a broadcast join, not a predicate)."""
    mask = (F.col("intensity") <= 0) | F.col("azim_mask")
    im = (controls.extra or {}).get("immask") if controls is not None else None
    if im:
        from xrddatapipeline_spark.operators.masks import (
            geometric_mask_predicate,
        )

        mask = mask | geometric_mask_predicate(im, controls)
    return px.withColumn("base_mask", mask)


#: packed-key join/group shapes are gated on a small per-batch image set:
#: the image_id -> index lookup is a literal-map linear scan per row, so it
#: must stay a few entries (every bench/streaming batch is <= 8 images; a
#: 100 TB deployment processes batches, not millions of images per plan).
_PK_MAX_IMAGES = 64


def _image_index_expr(image_index: dict[str, int]) -> "F.Column":
    """Driver-literal image_id -> small-int map as a column expression."""
    return F.create_map(
        *[
            lit
            for s, i in sorted(image_index.items())
            for lit in (F.lit(s), F.lit(i))
        ]
    )


def _pk_usable(
    image_index: dict[str, int] | None, shape: tuple[int, int]
) -> bool:
    return (
        image_index is not None
        and 0 < len(image_index) <= _PK_MAX_IMAGES
        and shape[0] <= 8192
        and shape[1] <= 8192
    )


def _pk_expr(imap: "F.Column") -> "F.Column":
    """Collision-free packed join key (img_idx << 26) | (y * 8192 + x).

    Round 14 (guide §2.4/§3): the dense-side broadcast probes on
    (image_id STRING, y, x) dominated three barrier stages — an isolated
    decomposition at 8 x 2880^2 priced the 3-column probe at ~250 run
    core-s per 66 M-row pass vs ~27 for the same join on ONE packed long
    (scripts/probe_dense_pass_r14.py): a single bigint key takes Spark's
    specialized LongHashedRelation path instead of generic UnsafeRow
    hashing with a var-length string per row. y*8192+x < 2^26 (gated on
    detector shape), img_idx is a per-batch driver-literal index — the
    pack is a bijection, so the joined row set is bit-identical to the
    3-column join (pinned by tests/test_r14_pk_parity.py)."""
    return (
        F.shiftleft(imap[F.col("image_id")].cast("long"), 26)
        + F.col("y").cast("long") * 8192
        + F.col("x")
    )


def outlier_pixels(
    px: DataFrame,
    esd_mul: float = 3.0,
    image_index: dict[str, int] | None = None,
) -> DataFrame:
    """A2/A4: per-ring sigma-clip on not-base-masked pixels; returns the
    sparse outlier pixel set (image_id, y, x).

    ``image_index`` (round 14, optional): with a per-batch image_id ->
    index map the ring-stats group/join key becomes ONE packed long
    ((img_idx << 32) | ring_idx) instead of (image_id STRING, ring_idx) —
    the histogram aggregation and the stats join-back both stop hashing a
    var-length string per dense row (see _pk_expr; same stats, same
    flags)."""
    candidates = px.where(~F.col("base_mask") & (F.col("ring_idx") > 0))
    if image_index is not None and 0 < len(image_index) <= _PK_MAX_IMAGES:
        imap = _image_index_expr(image_index)
        keyed = candidates.select(
            (
                F.shiftleft(imap[F.col("image_id")].cast("long"), 32)
                + F.col("ring_idx")
            ).alias("_gk"),
            "image_id", "y", "x", "intensity",
        )
        flagged = flag_outliers(
            keyed,
            keys=["_gk"],
            value="intensity",
            esd_mul=esd_mul,
            min_count=10,
            histogram=OUTLIER_HISTOGRAM,
        )
    else:
        flagged = flag_outliers(
            candidates.select("image_id", "y", "x", "ring_idx", "intensity"),
            keys=["image_id", "ring_idx"],
            value="intensity",
            esd_mul=esd_mul,
            min_count=10,
            # see OUTLIER_HISTOGRAM: histogram route by default (map-side
            # combined (ring, intensity) counts — exact for integer counts)
            histogram=OUTLIER_HISTOGRAM,
        )
    return flagged.where(F.col("is_outlier")).select("image_id", "y", "x")


def closed_outlier_pixels(
    outliers: DataFrame, shape: tuple[int, int]
) -> DataFrame:
    """M2: 3x3 binary closing of the outlier mask (pipeline.py:191-205)."""
    return close_mask_pixels(outliers, shape=shape, radius=1)


def labeled_pixels_frame(
    px: DataFrame, om_pixels: DataFrame, shape: tuple[int, int],
    sparse_hint=None, controls: ImageControls | None = None,
    closing_radius: int | None = None,
    image_index: dict[str, int] | None = None,
) -> DataFrame:
    """The labeled sparse pixel set feeding shape classification: label
    the closed outlier mask (M1), then attach the per-pixel physics
    columns from the dense table.

    q/azim feed the shape classifier; intensity/qbin ride along so
    downstream per-label stats (spot_stats) never probe the dense pixel
    table again — the labeled set is ~1% of pixels, so two extra int
    columns in the sparse barrier are free compared to a second 66M-row
    hash-probe of a multi-column key (measured 24 s/task of pure CPU in
    the warm 8 x 2880^2 profile).

    With ``controls`` set (valid ONLY when the caller's calibration is
    the closed-form one, i.e. run_image_plan(calib=None)), the dense
    probe reads just (image_id, y, x, intensity) — 4 columns instead of
    7 off the columnar cache — and q/azim/qbin are recomputed closed-form
    on the ~1%-of-pixels sparse rows with the SAME expressions that built
    the cache, so the values are bit-identical. Only ``intensity`` is
    data; everything else is geometry. With an externally-measured calib
    table the 7-column probe stays (recomputation could diverge).

    ``closing_radius`` (round 14): when set, ``om_pixels`` is the RAW
    outlier set and the M2 closing runs FUSED with the labeling kernel
    (operators.raster.close_and_label_pixels) — identical rows to
    closing-then-labeling, one kernel pass / one exchange / no
    intermediate closed-mask barrier. The closed mask itself is then the
    (image_id, y, x) projection of this frame (every closed pixel is
    labeled at min_area=0). ``None`` keeps the pre-closed input path
    (classify_clusters, image_plan_spine)."""
    if closing_radius is not None:
        from xrddatapipeline_spark.operators.raster import (
            close_and_label_pixels,
        )

        labeled = close_and_label_pixels(
            om_pixels, shape=shape, radius=closing_radius, connectivity=2
        )
    else:
        labeled = label_pixels(om_pixels, shape=shape, connectivity=2)
    use_pk = _pk_usable(image_index, shape)
    if use_pk:
        # single packed-long probe key (see _pk_expr): the dense side's
        # (image_id STRING, y, x) hash per row was ~70% of this barrier's
        # CPU; identical joined rows, ~10x cheaper probe
        pk = _pk_expr(_image_index_expr(image_index))
        labeled = labeled.select(pk.alias("_pk"), "label")
    if sparse_hint is not None:
        labeled = sparse_hint(labeled)
    if controls is not None:
        from xrddatapipeline_spark.calib.cache import with_calib_columns

        if use_pk:
            dense = px.select(
                "image_id", "y", "x", "intensity",
                pk.alias("_pk"),
            )
            lpx = dense.join(labeled, "_pk").drop("_pk")
        else:
            lpx = labeled.join(
                px.select("image_id", "y", "x", "intensity"),
                ["image_id", "y", "x"],
            )
        lpx = with_calib_columns(lpx, controls).select(
            "image_id", "y", "x", "label", "q", "azim", "intensity", "qbin"
        )
    else:
        if use_pk:
            dense = px.select(
                "image_id", "y", "x", "q", "azim", "intensity", "qbin",
                pk.alias("_pk"),
            )
            lpx = dense.join(labeled, "_pk").drop("_pk").select(
                "image_id", "y", "x", "label",
                "q", "azim", "intensity", "qbin",
            )
        else:
            lpx = labeled.join(
                px.select(
                    "image_id", "y", "x", "q", "azim", "intensity", "qbin"
                ),
                ["image_id", "y", "x"],
            )
    # flipped azimuth mirrors the axis so wrapped arcs read contiguous (A7)
    return lpx.withColumn(
        "azim_flip", F.pmod(F.col("azim") + 180.0, F.lit(360.0))
    )


def label_table_from(lpx: DataFrame, wrap_mode: str = "flip") -> DataFrame:
    """Per-label shape classification over an (already materialized)
    labeled pixel set: area / circular azimuth extent / Q extent -> arc
    vs spot (A5-A9). Split from ``labeled_pixels_frame`` (round 8) so
    run_image_plan derives it from the CHECKPOINTED lpx barrier — the
    previous single-function form rebuilt label_table from the lazy lpx,
    re-running the labeling kernel AND the 66M-row px join a second time
    inside the label_table checkpoint job.

    ``wrap_mode`` selects the circular-extent formulation (round 13):

    - ``"flip"`` (default, the hot plan): least(raw extent, mirrored-axis
      extent) — one hash aggregation, no sort. For a zero-crossing arc
      with a single angular gap this equals the reference's recompute.
    - ``"gap"``: the reference's EXACT semantics (classification.py:
      659-666) — labels whose raw extent exceeds 359 report 360 minus
      the FIRST sorted consecutive gap > 10 (see
      ``wrapped_extent_gap_scan``). One keyed window sort + the same
      single aggregation: equal exchange count, extra sort. The two
      modes diverge on wrapped labels with MULTIPLE >10-degree gaps and
      on labels spanning exactly <=359 degrees across zero (below the
      reference's trigger); golden parity is pinned on "flip", "gap" is
      the reference-faithful option.
    """
    diff_q = (
        F.expr("percentile(q, 0.9)") - F.expr("percentile(q, 0.1)")
    ).alias("diff_q")
    if wrap_mode == "flip":
        ext = F.max("azim") - F.min("azim")
        extf = F.max("azim_flip") - F.min("azim_flip")
        label_table = lpx.groupBy("image_id", "label").agg(
            F.count("*").alias("area"),
            F.least(ext, extf).alias("diff_azim"),
            diff_q,
        )
    elif wrap_mode == "gap":
        w = Window.partitionBy("image_id", "label").orderBy("azim")
        g = lpx.select("image_id", "label", "azim", "q").withColumn(
            "gap", F.col("azim") - F.lag("azim").over(w)
        )
        ext_raw = F.max("azim") - F.min("azim")
        first_gap = F.min(
            F.when(
                F.col("gap") > 10.0,
                F.struct(F.col("azim").alias("at"), F.col("gap").alias("g")),
            )
        )
        label_table = (
            g.groupBy("image_id", "label")
            .agg(
                F.count("*").alias("area"),
                ext_raw.alias("_ext_raw"),
                first_gap.alias("_fg"),
                diff_q,
            )
            .withColumn(
                "diff_azim",
                F.when(
                    (F.col("_ext_raw") > 359.0) & F.col("_fg").isNotNull(),
                    F.lit(360.0) - F.col("_fg.g"),
                ).otherwise(F.col("_ext_raw")),
            )
            .select("image_id", "label", "area", "diff_azim", "diff_q")
        )
    else:
        raise ValueError(f"wrap_mode must be 'flip' or 'gap', got {wrap_mode!r}")
    # azim_vs_Q as a cross-multiplied comparison, NOT a division: a
    # constant-q arc (every pixel at the same ring radius) has diff_q
    # exactly 0, and under ANSI mode (Spark 4 default) diff_azim/diff_q
    # raises DIVIDE_BY_ZERO once the earlier conjuncts pass — the
    # reference's numpy divide yields inf (> threshold -> arc) for
    # diff_azim > 0 and nan (not arc) for 0/0, which is precisely what
    # diff_azim > threshold * diff_q evaluates to at diff_q == 0
    # (round 13; found by the wrap_mode fixture, latent since round 2).
    return label_table.withColumn(
        "classifier",
        F.when(
            (F.col("area") > MIN_ARC_AREA)
            & (F.col("diff_q") < Q_MAX)
            & (F.col("diff_azim") > AZIM_MIN)
            & (F.col("diff_azim") > F.lit(AZIM_Q_SHAPE_MIN) * F.col("diff_q")),
            F.lit(2),
        ).otherwise(F.lit(1)),
    )


def wrapped_extent_gap_scan(
    lpx: DataFrame, wrap_threshold: float = 359.0, min_gap: float = 10.0
) -> DataFrame:
    """Reference-exact wraparound azimuth extent (W5,
    classification.py:659-666 and the duplicate at :766-775): per
    (image_id, label) the raw extent is max(azim) - min(azim); a label
    whose raw extent exceeds ``wrap_threshold`` (the reference's
    ``diffs_azim > 359`` trigger) crosses azimuth zero, so its true
    extent is recomputed by sorting the azimuths, diffing consecutive
    values, taking the FIRST gap > ``min_gap`` (np.argwhere(diffs>10)[0])
    and reporting 360 - gap.

    This is the reference's own formulation, distinct from the
    flipped-axis least() heuristic ``label_table_from`` uses in the hot
    plan: for a wrapped label with MORE than one >10-degree gap the two
    disagree (the gap-scan keeps everything past the first gap; the flip
    takes the tightest mirrored hull), so this operator is kept as the
    parity surface for the reference's semantics (SURVEY §2.7 W5).

    Fallback: a label above the threshold with NO gap > min_gap keeps
    its raw extent. The reference would raise (it indexes [0] of an
    empty argwhere); a deterministic answer is kept instead so a single
    pathological label cannot kill a 1000-image batch.

    Returns (image_id, label, extent_raw, extent). Scale: one keyed
    window sort plus one keyed aggregation — the same single exchange
    as label_table_from; labels bound the group size.
    """
    w = Window.partitionBy("image_id", "label").orderBy("azim")
    gaps = lpx.select("image_id", "label", "azim").withColumn(
        "gap", F.col("azim") - F.lag("azim").over(w)
    )
    # first qualifying gap in azimuth order == min struct(azim-of-gap, gap):
    # struct min orders by the first field, and qualifying rows have
    # distinct azim (a duplicate azim's gap is 0, never > min_gap)
    first_gap = F.min(
        F.when(
            F.col("gap") > min_gap,
            F.struct(F.col("azim").alias("at"), F.col("gap").alias("g")),
        )
    )
    agg = gaps.groupBy("image_id", "label").agg(
        (F.max("azim") - F.min("azim")).alias("extent_raw"),
        first_gap.alias("_fg"),
    )
    return agg.select(
        "image_id",
        "label",
        "extent_raw",
        F.when(
            (F.col("extent_raw") > wrap_threshold)
            & F.col("_fg").isNotNull(),
            F.lit(360.0) - F.col("_fg.g"),
        )
        .otherwise(F.col("extent_raw"))
        .alias("extent"),
    )


def classifier_mask_flags(lpx: DataFrame, label_table: DataFrame) -> DataFrame:
    """Sparse per-pixel mask flags from the classifier verdicts: every
    labeled pixel is an outlier-mask member (is_om); spot/arc membership
    follows its label's classifier (1 = spot, 2 = arc). This is the
    non-gradient mask_flags branch of run_image_plan, split out so the
    driver's composed spine anchor (image_plan_spine) executes the
    plan's own code, not a re-spelling (F11/F12 membership join,
    pipeline.py:375-414 mask variants)."""
    return lpx.join(
        label_table.select("image_id", "label", "classifier"),
        ["image_id", "label"],
    ).select(
        "image_id", "y", "x",
        F.lit(True).alias("is_om"),
        (F.col("classifier") == 1).alias("is_spot_px"),
        (F.col("classifier") == 2).alias("is_arc_px"),
    )


def classify_clusters(
    px: DataFrame, om_pixels: DataFrame, shape: tuple[int, int],
    sparse_hint=None, wrap_mode: str = "flip",
) -> tuple[DataFrame, DataFrame]:
    """Shape classification (qwidth_area_classification_groupby,
    classification.py:373-444): label the closed outlier mask, aggregate
    per-label area / circular azimuth extent / Q extent, decide arc vs spot.

    Returns (labeled_pixels, label_table) where label_table carries
    (image_id, label, area, diff_azim, diff_q, classifier) with
    classifier 1 = spot, 2 = arc (A9). ``wrap_mode`` selects the
    circular-extent formulation (see label_table_from). Lazy composition
    wrapper; run_image_plan uses the split halves so the label_table job
    reads the lpx BARRIER instead of re-running the kernel."""
    lpx = labeled_pixels_frame(px, om_pixels, shape, sparse_hint)
    return lpx, label_table_from(lpx, wrap_mode=wrap_mode)


def integrate_all(
    px: DataFrame,
    mask_flags: DataFrame,
    controls: ImageControls,
    sparse_hint=None,
) -> DataFrame:
    """A1 x4: base / om / spotsmasked / arcsmasked integrals
    (pipeline.py:375-414). Returns (image_id, kind, tth_idx, tth, intensity).

    Corrected intensity I/pol * dist_sq**1.5 (pipeline.py:63).

    ``mask_flags`` is ONE sparse table (image_id, y, x, is_om,
    is_spot_px, is_arc_px): the om/spot/arc memberships all derive from
    the same labeled-cluster rows, so a single left join flags every
    variant — three separate mask joins measured ~3x slower (each one
    re-shuffles the dense pixel side). Join strategy is left to AQE,
    which sees the flag table's true runtime size (an explicit
    broadcast() hint measured slower still).

    All 4 variants are computed in ONE hash aggregation with conditional
    sums (equivalent to the reference's 4 bincount passes for every bin > 0,
    since bin-0-routed i.e. masked rows never contribute to a kept bin).
    A naive 4-branch union would recompute the whole upstream plan —
    including the outlier groupBys and the raster kernels — once per kind;
    at any scale that is 4x the work and 4x the shuffles."""
    value = F.col("intensity") / F.col("pol") * F.pow(F.col("dist_sq"), 1.5)
    kinds = {
        "base": F.col("base_mask"),
        "om": F.col("base_mask") | F.col("is_om"),
        "spotsmasked": F.col("base_mask") | F.col("is_spot_px"),
        "arcsmasked": F.col("base_mask") | F.col("is_arc_px"),
    }
    if sparse_hint is not None:
        mask_flags = sparse_hint(mask_flags)
    flagged = (
        px.join(mask_flags, ["image_id", "y", "x"], "left")
        .fillna(
            {"is_om": False, "is_spot_px": False, "is_arc_px": False}
        )
        .withColumn("_v", value)
    )
    aggs = []
    for kind, mask in kinds.items():
        aggs.append(F.sum(F.when(~mask, F.col("_v"))).alias(f"sum_{kind}"))
        aggs.append(F.count(F.when(~mask, F.lit(1))).alias(f"n_{kind}"))
    wide = (
        flagged.where(F.col("tth_idx") > 0)
        .groupBy("image_id", "tth_idx")
        .agg(*aggs)
    )
    stack_args = ", ".join(
        f"'{kind}', sum_{kind}, n_{kind}" for kind in kinds
    )
    lo, hi = controls.iotth
    return wide.selectExpr(
        "image_id",
        "tth_idx",
        f"stack({len(kinds)}, {stack_args}) as (kind, sum_val, n_px)",
    ).select(
        "image_id",
        "kind",
        "tth_idx",
        tth_bin_center("tth_idx", lo, hi, controls.out_channels).alias("tth"),
        (
            F.coalesce(F.col("sum_val"), F.lit(0.0))
            / F.greatest(F.col("n_px"), F.lit(1))
        ).alias("intensity"),
    )


def integrate_and_spottiness(
    px: DataFrame,
    mask_flags: DataFrame,
    controls: ImageControls,
    sparse_hint=None,
    image_index: dict[str, int] | None = None,
) -> DataFrame:
    """A1 x4 + A15 in ONE pixel-table pass (joint-key fusion, round 13).

    ``integrate_all`` and ``spottiness_per_qbin`` have the same input
    shape — scan the dense pixel table, left-join the sparse flag table,
    aggregate per image over a bin column — differing only in the bin key
    (tth_idx vs qbin) and the aggregates. Run separately they scan + probe
    the 66 M-row cache twice; the round-9 named-stage profile showed
    out:spottiness costing as much as a barrier build (176-548 core-s per
    warm 8 x 2880^2 batch). Rounds 9-12 fused them with GROUPING SETS
    ((image_id, tth_idx), (image_id, qbin)); round 13 replaced that with
    ONE joint aggregation on (image_id, tth_idx, qbin): the Expand
    doubled the 66 M-row stream and every copy carried all 10 aggregate
    buffers (~20 agg-updates per source row), where the joint key needs
    10 — and since qbin is a monotone FUNCTION of tth_idx (both derive
    from 2theta), the joint frame has only ~tth_bins + qbins live cells
    per image, not their product (correctness does not depend on the
    dependence; a worst-case independent pair is still bins x bins =
    tiny). Measured on the isolated agg at 8 x 2880^2: 49.3 -> 31.6 run
    core-s median, cpu 46.6 -> 29.0 (scripts/ab_intspot_r13.py, 4
    alternating reps).

    Returns the joint agg frame (image_id, tth_idx, qbin, per-kind
    sums/counts, n_total, n_masked); split it with ``split_integrals`` /
    ``split_spottiness``, which re-aggregate the margins (a ~21k-row
    input — negligible). Callers should barrier the joint frame so the
    two derived outputs don't each re-run the scan (run_image_plan
    already does).

    Spottiness parity note: A15 counts om membership; the flag table's
    pixel set equals the om set by construction (labeled pixels ⊆ om via
    an inner join on the dense grid; azimuth_swap_classify's left join +
    groupBy preserves every labeled pixel), so ``is_om`` here is the same
    predicate spottiness_per_qbin joins from om_pixels."""
    value = F.col("intensity") / F.col("pol") * F.pow(F.col("dist_sq"), 1.5)
    kinds = {
        "base": F.col("base_mask"),
        "om": F.col("base_mask") | F.col("is_om"),
        "spotsmasked": F.col("base_mask") | F.col("is_spot_px"),
        "arcsmasked": F.col("base_mask") | F.col("is_arc_px"),
    }
    if _pk_usable(image_index, (controls.size_y, controls.size_x)):
        # single packed-long probe key for the dense left join — see
        # _pk_expr; the flag columns attach to exactly the same rows
        pk = _pk_expr(_image_index_expr(image_index))
        mask_flags = mask_flags.select(
            pk.alias("_pk"), "is_om", "is_spot_px", "is_arc_px"
        )
        if sparse_hint is not None:
            mask_flags = sparse_hint(mask_flags)
        flagged = (
            px.withColumn("_pk", pk)
            .join(mask_flags, "_pk", "left")
            .drop("_pk")
        )
    else:
        if sparse_hint is not None:
            mask_flags = sparse_hint(mask_flags)
        flagged = px.join(mask_flags, ["image_id", "y", "x"], "left")
    flagged = (
        flagged.fillna(
            {"is_om": False, "is_spot_px": False, "is_arc_px": False}
        )
        .withColumn("_v", value)
    )
    aggs = []
    for kind, mask in kinds.items():
        aggs.append(F.sum(F.when(~mask, F.col("_v"))).alias(f"sum_{kind}"))
        aggs.append(F.count(F.when(~mask, F.lit(1))).alias(f"n_{kind}"))
    aggs.append(F.count(F.lit(1)).alias("n_total"))
    aggs.append(F.sum(F.col("is_om").cast("int")).alias("n_masked"))
    return flagged.groupBy("image_id", "tth_idx", "qbin").agg(*aggs)


def split_integrals(fused: DataFrame, controls: ImageControls) -> DataFrame:
    """(image_id, kind, tth_idx, tth, intensity) from the joint agg frame
    — same output as ``integrate_all`` (bin-0 rows are aggregated then
    dropped here; they never contribute to a kept bin either way). The
    tth margin re-aggregates the barriered ~21k-row joint frame — one
    tiny exchange, never the pixel scan."""
    kinds = ("base", "om", "spotsmasked", "arcsmasked")
    margin = (
        fused.where(F.col("tth_idx") > 0)
        .groupBy("image_id", "tth_idx")
        .agg(
            *[F.sum(f"sum_{k}").alias(f"sum_{k}") for k in kinds],
            *[F.sum(f"n_{k}").alias(f"n_{k}") for k in kinds],
        )
    )
    stack_args = ", ".join(f"'{kind}', sum_{kind}, n_{kind}" for kind in kinds)
    lo, hi = controls.iotth
    return margin.selectExpr(
        "image_id",
        "tth_idx",
        f"stack({len(kinds)}, {stack_args}) as (kind, sum_val, n_px)",
    ).select(
        "image_id",
        "kind",
        "tth_idx",
        tth_bin_center("tth_idx", lo, hi, controls.out_channels).alias("tth"),
        (
            F.coalesce(F.col("sum_val"), F.lit(0.0))
            / F.greatest(F.col("n_px"), F.lit(1))
        ).alias("intensity"),
    )


def split_spottiness(fused: DataFrame) -> DataFrame:
    """(image_id, qbin, n_total, n_masked, frac_masked) from the joint agg
    frame — same output as ``spottiness_per_qbin`` (qbin margin)."""
    return (
        fused.where(F.col("qbin") >= 0)
        .groupBy("image_id", "qbin")
        .agg(
            F.sum("n_total").alias("n_total"),
            F.sum("n_masked").cast("long").alias("n_masked"),
        )
        .select(
            "image_id",
            "qbin",
            "n_total",
            "n_masked",
            (F.col("n_masked") / F.col("n_total")).alias("frac_masked"),
        )
    )


def spot_stats(
    lpx: DataFrame, label_table: DataFrame, px: DataFrame,
    sparse_hint=None,
) -> DataFrame:
    """A17: per-spot-label stats table (spottiness.py:30-46):
    (image_id, spot_stat_label, area, medianQ, Qbin, intensity_sum,
    intensity_max, intensity_mean, on_arc)."""
    if sparse_hint is not None:
        lpx = sparse_hint(lpx)
    if "intensity" in lpx.columns and "qbin" in lpx.columns:
        enriched = lpx  # classify_clusters carries intensity/qbin already
    else:
        enriched = lpx.join(
            px.select("image_id", "y", "x", "intensity", "qbin"),
            ["image_id", "y", "x"],
        )
    enriched = enriched.join(
        F.broadcast(label_table.select("image_id", "label", "classifier")),
        ["image_id", "label"],
    )
    return enriched.groupBy("image_id", F.col("label").alias("spot_stat_label")).agg(
        F.count("*").alias("area"),
        F.median("q").alias("medianQ"),
        F.median("qbin").cast("int").alias("Qbin"),
        F.sum("intensity").alias("intensity_sum"),
        F.max("intensity").alias("intensity_max"),
        F.avg("intensity").alias("intensity_mean"),
        F.max((F.col("classifier") == 2).cast("int")).alias("on_arc"),
    )


def spottiness_per_qbin(
    px: DataFrame, om_pixels: DataFrame, sparse_hint=None
) -> DataFrame:
    """A15/A16: per-Qbin fraction masked + distinct labels
    (spottiness.py:16-27)."""
    om_flagged = om_pixels.withColumn("is_om", F.lit(True))
    if sparse_hint is not None:
        om_flagged = sparse_hint(om_flagged)
    flagged = px.join(
        om_flagged,
        ["image_id", "y", "x"],
        "left",
    ).fillna({"is_om": False})
    return flagged.where(F.col("qbin") >= 0).groupBy("image_id", "qbin").agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("is_om").cast("int")).alias("n_masked"),
        (F.sum(F.col("is_om").cast("int")) / F.count("*")).alias("frac_masked"),
    )


def hmax_float32_exact(inten, hval: float) -> bool:
    """float32 exactness gate for the A19 kernel: True when running the
    h-maxima reconstruction in float32 is provably BIT-IDENTICAL to
    float64. The reconstruction is pure lattice min/max plus two
    subtractions, so exactness needs only that every value the kernel
    touches is float32-representable: integer intensities with
    max(img) < 2^24 and a marker floor min(img, 0) - h > -2^24 (the
    raster background is 0, so the effective min is clamped at <= 0; h
    is already integer-truncated per the reference). Detector counts are
    uint16/int32-scale, so real data always passes, halving the scratch
    bandwidth of the plan's measured stall-magnet stage (round-11
    split-arm record: identical h jobs at 181.6 vs 39.0 run core-s
    purely on host memory stall; kernels.h_maxima dtype doc).
    Parity is pinned by tests/test_kernels.py (f32==f64 on the
    planted-spot fixture + random integer rasters up to the gate edge).
    """
    import numpy as np

    if not np.issubdtype(np.asarray(inten).dtype, np.integer):
        return False
    if np.asarray(inten).size == 0:
        return True
    imin = int(inten.min())
    imax = int(inten.max())
    # the marker ceiling matters too: a NEGATIVE h (possible when p99.9
    # is negative — mostly-negative corrected frame with hot pixels)
    # pushes marker = img - h ABOVE the image maximum, so bound both
    # marker extremes, not just the floor (round-12 review)
    return (
        imax < 2**24
        and min(imin, 0) - hval > -(2**24)
        and max(imax, 0) - hval < 2**24
    )


def h_maxima_per_qbin(
    px: DataFrame, spot_px: DataFrame, controls: ImageControls,
    n_images: int | None = None, recompute_qbin: bool = False,
) -> DataFrame:
    """A19/M6 (spottiness.py:64-84): count regional h-maxima per Q-bin,
    total and intersected with the spot mask; h = int(5% of the image's
    p99.9 intensity) — the int truncation mirrors spottiness.py:66.

    One applyInPandas kernel pass per image, then a hash aggregation on
    (image_id, qbin). ``h`` is computed IN-KERNEL with ``np.percentile``
    over the image's own pixel values — exactly what the reference does
    (spottiness.py:65, ``np.percentile(image, 99.9)``), and it removes the
    whole-table ``percentile`` aggregation scan + broadcast join the
    previous formulation paid (the pixel table is dense, so the shipped
    rows ARE the image).

    Shuffle economics mirror the band-gradient feed (gradient_stage.py):
    rows ship as ONE packed int64 — (y*8192 + x) << 32 | (intensity +
    2^31) — plus the qbin, instead of (y, x, intensity, qbin): 3 row
    fields instead of 5. Detectors wider than 8191 px fall back to the
    unpacked layout. With ``n_images`` known, the group shuffle is pinned
    to an explicit 4x-over-provisioned partition count so hash collisions
    don't stack two whole-image kernels on one task (same rationale as
    ``_balanced_group_partitions``).

    kernels.h_maxima runs the Vincent'93 hybrid reconstruction (raster +
    anti-raster sweeps + vectorized worklist) with all image-sized float64
    temporaries in the per-process scratch pool — a few seconds per 2880^2
    frame, so this stage is viable at the full-resolution config.

    ``recompute_qbin=True`` (round 14, guide §2.3 "shuffle keys and
    metadata instead of payloads"): under CLOSED-FORM calibration the
    qbin column is a pure function of (y, x), so it does not need to ride
    the dense per-pixel shuffle + Arrow transfer into the kernel at all —
    the sparse maxima rows get it re-attached JVM-side via the same
    `with_calib_columns` expressions that computed the px cache's qbin
    (bit-identical; the lpx probe has used this trick since round 13).
    The kernel feed drops from (packed int64, qbin int) to the packed
    int64 alone — one third fewer shuffled bytes and one fewer Arrow
    column for the stage whose tasks are transfer-wait-dominated
    (profiled run 150-170 core-s vs cpu ~38 per warm keep-up batch).
    Only valid when px's qbin came from the closed-form projection (the
    run_image_plan caller gates it on ``calib is None``)."""
    import numpy as np
    from xrddatapipeline_spark.operators import kernels

    h, w = controls.size_y, controls.size_x
    # packed feed requires an intensity column whose VALUES fit int32 —
    # the int64 pack casts to long (doubles would silently truncate,
    # round-12 review) and stores intensity + 2^31 in the 32-bit low
    # field, so a bigint >= 2^31 would carry into the yx bits and one
    # < -2^31 would go negative and be dropped as the sentinel (round-12
    # ADVICE). tinyint/smallint/int are safe by construction; bigint
    # takes the unpacked layout, which is exact and route-consistent
    # (the dtype gates read the source column type either way).
    packed = (
        h <= 8192 and w <= 8192
        and dict(px.dtypes).get("intensity") in
        ("tinyint", "smallint", "int")
    )
    qbin_cols = [] if recompute_qbin else ["qbin"]
    if packed:
        src = px.select(
            "image_id",
            (
                F.shiftleft(F.col("y").cast("long") * 8192 + F.col("x"), 32)
                + (F.col("intensity").cast("long") + F.lit(2**31))
            ).alias("p"),
            *qbin_cols,
        )
    else:
        src = px.select("image_id", "y", "x", "intensity", *qbin_cols)
    # n_images may legitimately be 0 (empty batch under an eager barrier):
    # repartition(0) is an error, and there is nothing to balance anyway
    if n_images and 0 < 4 * n_images <= 4096:
        src = src.repartition(4 * n_images, "image_id")

    # Round 15 (guide §4.2): the kernel consumes the group as a pyarrow
    # Table (applyInArrow) instead of a pandas DataFrame. The grouped
    # pandas path pays table.to_pandas() on 8.3 M rows per image — the
    # string image_id column alone converts at 0.4-0.9 s/group (measured,
    # pyarrow 16 / pandas 2.2; spikes to 4 s under allocator pressure),
    # pure conversion the kernel never needed: numpy reads the int
    # columns zero-copy off the Arrow buffers and the image_id is one
    # scalar per group. Identical kernel arrays in, identical values out
    # — the oracle hashes and the r13/r14 parity tests pin it.
    def _maxima(tbl: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        iid = tbl["image_id"][0].as_py()
        if packed:
            v = tbl["p"].to_numpy()
            inten = (v & 0xFFFFFFFF) - 2**31
            yx = v >> 32
            ys = yx // 8192
            xs = yx - ys * 8192
        else:
            ys = tbl["y"].to_numpy()
            xs = tbl["x"].to_numpy()
            inten = tbl["intensity"].to_numpy()
        # reference truncates to int (spottiness.py:66:
        # h = int(0.05*np.percentile(image,99.9))) — match it exactly so
        # maxima with residual in [int(h), h) are counted identically
        hval = float(int(0.05 * float(np.percentile(inten, 99.9))))
        use32 = hmax_float32_exact(inten, hval)
        img = kernels.scratch(
            (h, w), "hmax_img", dtype=np.float32 if use32 else np.float64
        )
        img[:] = 0.0
        img[ys, xs] = inten
        is_max = kernels.h_maxima(img, hval)
        sel = is_max[ys, xs]
        n = int(sel.sum())
        out = {
            "image_id": pa.array([iid] * n, type=pa.string()),
            "y": pa.array(ys[sel].astype("int32")),
            "x": pa.array(xs[sel].astype("int32")),
        }
        if not recompute_qbin:
            out["qbin"] = pa.array(
                tbl["qbin"].to_numpy()[sel].astype("int32")
            )
        return pa.table(out)

    out_schema = (
        "image_id string, y int, x int"
        if recompute_qbin
        else "image_id string, y int, x int, qbin int"
    )
    maxima = src.groupBy("image_id").applyInArrow(_maxima, out_schema)
    if recompute_qbin:
        from xrddatapipeline_spark.calib.cache import with_calib_columns

        maxima = with_calib_columns(maxima, controls).select(
            "image_id", "y", "x", "qbin"
        )
    flagged = maxima.join(
        spot_px.withColumn("is_spot_px", F.lit(True)),
        ["image_id", "y", "x"],
        "left",
    ).fillna({"is_spot_px": False})
    return flagged.where(F.col("qbin") >= 0).groupBy("image_id", "qbin").agg(
        F.count("*").alias("n_maxima"),
        F.sum(F.col("is_spot_px").cast("int")).alias("n_spot_maxima"),
    )


def cosine_similarity_series(pixels: DataFrame) -> DataFrame:
    """J4/W1/A20: per image, cosine similarity vs previous seq and vs first
    seq in its dataset (pipeline.py:506-557). Window-over-Delta
    reformulation — tolerant to out-of-order arrival, unlike the
    reference's filename pairing (SURVEY §7 'Ordering-dependent').

    Shuffle-width economics (round 7): the window exchange ships every
    pixel row, so strings hurt — image_id (~20 B/row over 66 M rows at
    8 x 2880^2) never participates in the math and is functionally
    dependent on (dataset, seq), so it is re-attached AFTER the per-image
    aggregation via a broadcast of the tiny distinct (dataset, seq,
    image_id) map; (y, x) pack collision-free into one long
    ((y << 32) | x — no detector-width assumption), and intensity ships
    as its int32 self (the double cast happens post-shuffle). Same math,
    same window, ~35% narrower rows on the dominant exchange.

    Window-sort economics (round 15): the window's sort order starts with
    its partition columns IN THE GIVEN ORDER, and the external sorter
    compares 8-byte prefixes of the FIRST column before falling back to
    full row comparisons — so partitionBy("dataset", "yx") made every one
    of the n·log n comparisons fall through a constant string prefix to
    the row comparator. partitionBy("yx", "dataset") (same partition SET,
    same hash distribution modulo column order, identical window groups)
    puts the near-unique packed long first: prefix comparisons resolve
    all but the ~n_images-row per-pixel groups. Additionally, when seq
    and intensity are integer-typed (the keep-up frame; detector data),
    they ship as ONE long k = (seq << 32) | (intensity + 2^31): within a
    (yx, dataset) group seq is unique, so ordering by k IS ordering by
    seq (k is monotone in seq for any low 32 bits), lag/first over k
    carry the intensity bits along, and the post-window extraction
    (k & 0xFFFFFFFF) - 2^31 is exact int32 — one 8-byte column replaces
    two 4-byte columns in every shuffled row AND removes seq from the
    sort payload. NULL intensities cannot take this path (a NULL k would
    re-order the window), so it is gated on non-nullable integer columns;
    the fallback is the r7 layout plus the partition-order fix. Parity:
    tests/test_r15_parity.py pins packed == unpacked bit-exactly."""
    ids = pixels.select("dataset", "seq", "image_id").distinct()
    yx = (
        F.shiftleft(F.col("y").cast("long"), 32)
        + F.col("x").cast("long")
    ).alias("yx")
    fields = {f.name: f for f in pixels.schema.fields}
    _int_types = ("tinyint", "smallint", "int")
    packed = (
        fields["seq"].dataType.simpleString() in _int_types
        and fields["intensity"].dataType.simpleString() in _int_types
        and not fields["seq"].nullable
        and not fields["intensity"].nullable
    )
    if packed:
        k = (
            F.shiftleft(F.col("seq").cast("long"), 32)
            + (F.col("intensity").cast("long") + F.lit(2 ** 31))
        ).alias("k")
        src = pixels.select("dataset", yx, k)
        w = Window.partitionBy("yx", "dataset").orderBy("k")

        def _unpack(c: F.Column) -> F.Column:
            # exact source-typed value back out of the low 32 bits
            return (
                c.bitwiseAND(F.lit(0xFFFFFFFF)) - F.lit(2 ** 31)
            ).cast(fields["intensity"].dataType)

        paired = src.select(
            "dataset",
            F.shiftright(F.col("k"), 32)
            .cast(fields["seq"].dataType).alias("seq"),
            _unpack(F.col("k")).alias("intensity"),
            _unpack(
                F.coalesce(F.lag("k").over(w), F.col("k"))
            ).alias("v_prev"),
            _unpack(F.first("k").over(w)).alias("v_first"),
        )
    else:
        src = pixels.select("dataset", "seq", yx, "intensity")
        w = Window.partitionBy("yx", "dataset").orderBy("seq")
        # all three series stay int32 THROUGH the window: a pre-window
        # ``intensity.cast("double")`` projection gets planned BELOW the
        # exchange, so the shuffle would ship the double AND the int
        # (+8 B/row on the dominant exchange — caught by the round-8 plan
        # test). int32 -> double is exact, so casting inside the dot
        # products instead is bit-identical.
        paired = src.select(
            "dataset",
            "seq",
            "intensity",  # NOT re-aliased: an alias projects a duplicate
            # attribute below the exchange, widening every shuffled row
            F.coalesce(F.lag("intensity").over(w), F.col("intensity"))
            .alias("v_prev"),
            F.first("intensity").over(w).alias("v_first"),
        )
    dot = lambda a, b: F.sum(  # noqa: E731
        F.col(a).cast("double") * F.col(b).cast("double")
    )

    # NULL for a zero-norm frame (blank detector image): ANSI mode
    # (Spark 4 default) raises DIVIDE_BY_ZERO even on double division
    # (round 13); the reference's numpy divide reads nan there, and a
    # NULL csim row is the relational analog — the series survives.
    def _csim(other: str) -> F.Column:
        denom = F.sqrt(dot("intensity", "intensity") * dot(other, other))
        return F.when(denom > 0, dot("intensity", other) / denom)

    sims = paired.groupBy("dataset", "seq").agg(
        _csim("v_first").alias("csim_first"),
        _csim("v_prev").alias("csim_prev"),
    )
    return sims.join(F.broadcast(ids), ["dataset", "seq"]).select(
        "dataset", "seq", "image_id", "csim_first", "csim_prev"
    )


@dataclass
class ImagePlanResult:
    pixels: DataFrame
    outliers: DataFrame
    om_pixels: DataFrame
    labeled_pixels: DataFrame
    label_table: DataFrame
    integrals: DataFrame
    spot_stats: DataFrame
    spottiness: DataFrame
    # A19/M6 per-Qbin regional h-maxima counts (the reference computes
    # these inside the spottiness stage, spottiness.py:64-84); None only
    # with run_image_plan(..., h_maxima=False). Lazy — not a barrier
    # frame, so skipping materialization costs nothing.
    h_maxima: "DataFrame | None" = None
    gradient: "object | None" = None  # GradientStageResult when enabled
    # the fused A1+A15 GROUPING SETS agg frame (barriered; integrals and
    # spottiness are selects over it) — kept so unpersist_all can drop it
    fused_bins: "DataFrame | None" = None
    # stage counters (A22 analog of the reference's per-stage printouts,
    # pipeline_queue.py:1007-1014): populated when run_image_plan(...,
    # observe=True); each Observation.get blocks until an action has run
    # over the observed frame, then yields its named metrics for free —
    # no extra job per counter.
    observations: dict[str, Observation] = field(default_factory=dict)

    def write_core_outputs(self, write, max_workers: int = 4) -> None:
        """Submit the four always-produced outputs (integrals, spot_stats,
        spottiness, outliers) as CONCURRENT jobs (guide §2.6): they are
        independent reads over the already-materialized barriers, so one
        job's stage tail overlaps the next job's ramp-up instead of
        leaving cores idle between sequential actions — the same
        submission order the keep-up batch path and a multi-sink
        streaming batch use. ``write`` is the sink callable
        (``lambda out: out.write...save()``); callers that need more
        outputs (h_maxima, gradient) or per-job labels submit their own
        pool. Lives here (round 15, r14 verdict #3) so bench harnesses
        merely call the production submission order instead of
        re-implementing it inside their timed regions."""
        from concurrent.futures import ThreadPoolExecutor

        outs = (self.integrals, self.spot_stats, self.spottiness,
                self.outliers)
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            for f in [pool.submit(write, out) for out in outs]:
                f.result()

    def unpersist_all(self) -> None:
        """Drop every frame the plan persisted (call after the batch's
        outputs are written — the streaming sink does this per batch)."""
        # om_pixels is a projection of the labeled_pixels barrier since the
        # round-14 M2+M1 fusion — releasing labeled_pixels frees it
        frames = [
            self.pixels, self.outliers,
            self.labeled_pixels, self.label_table,
        ]
        if self.fused_bins is not None:
            frames.append(self.fused_bins)
        if self.gradient is not None:
            frames.extend(self.gradient.cached)
        for df in frames:
            _release(df)


def run_image_plan(
    pixels: DataFrame,
    calib: DataFrame,
    controls: ImageControls,
    broadcast_calib: bool = True,
    gradient_stage: bool = False,
    observe: bool = False,
    barrier: str = "persist",
    corrections: dict | None = None,
    sparse_broadcast_rows: int = 4_000_000,
    n_images: int | None = None,
    h_maxima: bool = True,
) -> ImagePlanResult:
    """Full per-image plan (pipeline.py:78-504 equivalent).

    NOTE: with ``barrier="local_checkpoint"`` (the streaming default) plan
    construction is EAGER — five intermediates materialize as Spark jobs
    before this function returns; ``barrier="persist"`` keeps it lazy.

    ``corrections`` (optional) is a kwargs dict for
    ``operators.corrections.apply_correction_images`` (dark / background /
    gain / flat_bkg, P7 chain) applied to the raw pixels before masking
    and integration, as the reference does in _getCorrImage
    (GSASII_imports.py:660-735).

    ``gradient_stage=True`` adds the §2.9 gradient classification
    (plans.gradient_stage): the spot/arc pixel sets fed to the integrals
    become the refined new_spot/new_arc flags (classification.py:587-606).

    ``barrier`` picks the reuse boundary for the five shared intermediates:
    "persist" keeps full lineage (fault-tolerant; any lost partition
    recomputes); "local_checkpoint" ALSO truncates lineage; "hybrid"
    (eager like local_checkpoint) keeps the two DENSE frames (pixel table,
    gradient raster) as eager COLUMNAR caches — pruned compressed re-scans
    for their 4-6 consumers — and checkpoints only the sparse frames. The plan is
    deep, and classic Spark re-analyzes the whole upstream plan on every
    transformation AND per output job, a driver-side cost independent of
    pixel count; checkpointed barriers make every downstream plan shallow.
    Measured warm steady-state per image on local[32]: 1 Mpx 40-48 s
    (persist) vs 9-11 s (local_checkpoint); single 8.3 Mpx ~par (22-39 s
    vs 26-28 s); 8-image 8.3 Mpx batches 15.9 s/img (persist) vs
    12.7-14.5 s/img (checkpoint, serialized storage). Executor loss under
    local_checkpoint costs the whole image — the right trade under
    foreachBatch, which retries the batch anyway."""
    shape = (controls.size_y, controls.size_x)
    if barrier not in ("persist", "local_checkpoint", "hybrid", "hybrid-nopx"):
        raise ValueError(f"unknown barrier {barrier!r}")
    eager = barrier in ("local_checkpoint", "hybrid", "hybrid-nopx")
    if corrections:
        from xrddatapipeline_spark.operators.corrections import (
            apply_correction_images,
        )

        pixels = apply_correction_images(pixels, **corrections)

    import os as _os
    import sys as _sys
    import time as _time

    if (
        eager
        and (gradient_stage or h_maxima)
        and controls.size_y * controls.size_x >= 4_000_000
    ):
        # pre-fault the kernel scratch sets across the python worker pool
        # CONCURRENTLY with the px cache build (JVM-heavy, pythons idle):
        # first-touch page faults were the cold-call cost of the kernel
        # stages (10-20x the numpy time under full concurrency) — the
        # band-gradient set (~120 MB at band height) and, when A19 is on,
        # the h-maxima set (~105 MB float32 at full image height;
        # steady-state footprint unchanged — see warmup_hmax_scratch,
        # which warms the float32 planes the integer-intensity exactness
        # gate always selects on detector data). Fire-and-forget
        # — a failed warmup only loses the overlap.
        #
        # ONE warmup job per (session, shape, stage-set) — python workers
        # persist across batches within a session, so the kernel-side
        # memsets are idempotent no-ops from batch 2 on (WARMUP_MEMSET_
        # EVENTS pins that), yet the JOB still occupied 96 task slots per
        # batch for worker round-trips (profiled at ~240 core-s of pure
        # wait on a contended host). Skip resubmitting driver-side. On a
        # real cluster a replaced executor starts cold and pays the
        # first-touch on its first kernel call — acceptable for a
        # best-effort overlap optimization.
        import threading

        from xrddatapipeline_spark.plans.gradient_stage import _GRAD_HALO

        _spark = pixels.sparkSession
        _wshape = (
            min(controls.size_y, 512 + 2 * _GRAD_HALO), controls.size_x
        )
        _full_shape = (controls.size_y, controls.size_x)
        # warmed COMPONENTS are tracked per (session, shape), not per
        # (bands, hmax) flag tuple (round 11): an h_maxima=False call
        # after an h-on one used to resubmit a bands-only warmup job —
        # a kernel-side no-op (memsets are idempotent) that still
        # occupied ~96 task slots of worker round-trips in the first
        # h-off batch. Now only the MISSING components get a job.
        _warm_base = (
            _spark.sparkContext.applicationId, _wshape, _full_shape,
        )
        # check+claim under the lock (see _WARMUP_LOCK doc): the claim
        # happens here, not at thread start, so a concurrent plan call
        # sees the components as already submitted
        with _WARMUP_LOCK:
            _missing = _warmup_missing(
                _warm_base, gradient_stage, h_maxima, _WARMUP_SUBMITTED
            )
            _WARMUP_SUBMITTED.update((_warm_base, p) for p in _missing)

        def _warm() -> None:
            try:
                import pandas as _pd

                # own job group: the warmup job completes during whatever
                # batch happens to be running (it's fire-and-forget), so
                # profilers that attribute stages by completion window can
                # exclude it by group instead of mis-charging the batch
                _spark.sparkContext.setLocalProperty(
                    "spark.jobGroup.id", "kernel-warmup"
                )
                n = _spark.sparkContext.defaultParallelism * 3

                def _wf(it):
                    from xrddatapipeline_spark.operators import kernels as _K

                    touched = 0
                    if "bands" in _missing:
                        touched += _K.warmup_band_scratch(_wshape)
                    if "hmax" in _missing:
                        touched += _K.warmup_hmax_scratch(_full_shape)
                    for _ in it:
                        pass
                    yield _pd.DataFrame({"n": [touched]})

                _spark.range(n).repartition(n).mapInPandas(
                    _wf, "n long"
                ).collect()
            except Exception:  # noqa: BLE001 — warmup is best-effort
                pass

        if _missing:
            threading.Thread(
                target=_warm, daemon=True, name="kernel-warmup"
            ).start()

    _bt = bool(_os.environ.get("XRDSPARK_BARRIER_TIMING"))
    _bt_last = [_time.perf_counter()]

    def _bar(df: DataFrame, dense: bool = False, label: str = "") -> DataFrame:
        if _bt:
            _t0 = _time.perf_counter()
            print(
                f"BT {label or '?'} plan-build {_t0 - _bt_last[0]:.2f}s",
                file=_sys.stderr, flush=True,
            )
            try:
                return _bar_labeled(df, dense, label)
            finally:
                _bt_last[0] = _time.perf_counter()
                print(
                    f"BT {label or '?'} dense={dense} "
                    f"materialize {_bt_last[0] - _t0:.2f}s",
                    file=_sys.stderr, flush=True,
                )
        return _bar_labeled(df, dense, label)

    def _bar_labeled(df: DataFrame, dense: bool, label: str) -> DataFrame:
        # name the barrier's stages in the Spark UI / REST profile: the
        # round-7/8 profiles showed three big "localCheckpoint at
        # <unknown>" stages that could not be attributed to a frame.
        # callSite.short is a thread-local property the scheduler copies
        # into the stage name of jobs submitted while it is set.
        sc = df.sparkSession.sparkContext
        if not label:
            return _bar_inner(df, dense)
        sc.setLocalProperty("callSite.short", f"barrier:{label}")
        try:
            return _bar_inner(df, dense)
        finally:
            sc.setLocalProperty("callSite.short", None)

    def _bar_inner(df: DataFrame, dense: bool = False) -> DataFrame:
        if not eager:
            return df.persist()
        from pyspark.storagelevel import StorageLevel

        if barrier == "hybrid-nopx" and dense:
            # no dense barrier at all: every consumer re-derives the
            # (column-pruned) closed-form calibration projection from the
            # caller's raw pixel cache. Worth it when the calib columns are
            # computed (calib=None) rather than joined: Catalyst prunes the
            # trig to just the columns each consumer reads, so none of the
            # 14-column cache build/serialize/re-scan cost is paid. With a
            # calib JOIN the join would re-execute per consumer — keep
            # "hybrid" there.
            return df
        if barrier == "hybrid" and dense:
            # DENSE frames (the calib-joined pixel table, the gradient
            # raster) are re-scanned by 4-6 consumers: a row-format
            # checkpoint deserializes every 15-column row per scan
            # (profiled ~30 s CPU/task at 8 x 2880^2 just to feed a
            # 3-column agg). Columnar cache + eager count gives pruned,
            # compressed re-scans AND accurate stats for AQE — the count
            # also closes the lazy-persist race that double-ran the
            # gradient kernel. The frame's own lineage is shallow (scan ⋈
            # calib projections), so skipping the checkpoint costs little
            # driver re-analysis.
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            df.count()
            return df
        # SPARSE frames: serialized-row checkpoint — truncates the deep
        # lineage tail (ring stats, raster kernels) out of every
        # downstream plan analysis. serialized rows: the default
        # deserialized level OOMs a 16 GB heap at 8 x 8.3 Mpx
        # (object-graph overhead).
        return df.localCheckpoint(
            eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
        )

    obs: dict[str, Observation] = {}

    def _obs(df: DataFrame, name: str, *metrics) -> DataFrame:
        # free-riding stage counters (reference's per-stage printouts,
        # pipeline_queue.py:1007-1014): computed by the action that
        # materializes the frame anyway — never an extra job.
        if not observe:
            return df
        o = Observation(name)
        obs[name] = o
        return df.observe(o, *metrics)

    # px (the dense calib-joined pixel table) feeds five outputs; without a
    # persist every output re-executes the pixels ⋈ calib join. ~8.3 M rows
    # x ~15 columns per image — a deliberate per-batch cache, dropped by the
    # caller (streaming does this per foreachBatch).
    # columns no plan stage reads after base-mask folding are dropped
    # BEFORE the barrier: tth is recomputed closed-form from tth_idx at
    # output time, azim_mask is folded into base_mask, azim_band is a
    # registry-query column — ~15% less cache-build and re-scan work.
    # dataset/seq likewise (round 9): no consumer of the barriered px
    # reads them — csim takes the RAW pixel frame, the streaming pixel
    # store writes the raw batch, and image_id remains the per-image key
    # — so the cache build skips a per-row string copy and an int column.
    # Under closed-form calibration q/azim also leave the cache: their
    # only consumer was the lpx probe, which now recomputes them on the
    # sparse rows (labeled_pixels_frame(controls=...)) — two double
    # columns (~1 GB at 8 x 2880^2) off the build/store/re-scan path.
    # With a calib TABLE they stay (lpx reads them from the cache).
    drop_cols = ["tth", "azim_band", "azim_mask", "dataset", "seq"]
    if calib is None:
        drop_cols += ["q", "azim"]
    masked = with_base_mask(
        join_calib(
            pixels, calib, broadcast=broadcast_calib, controls=controls
        ),
        controls=controls,
    )
    # Predef RASTER mask (the reference's .tif mask branch,
    # cache_creation.py:239-246): a driver-side boolean array in
    # controls.extra["predef_mask"] joins in as a broadcast sparse
    # (y, x) set — masked pixels are a tiny fraction of the detector
    # (the tutorial's insitu mask covers 1.8%), so the build side stays
    # broadcast-sized; the dense pixel table never shuffles.
    predef = (controls.extra or {}).get("predef_mask")
    if predef is not None:
        import numpy as _np
        import pandas as _pd

        ys, xs = _np.nonzero(_np.asarray(predef, dtype=bool))
        pmask = pixels.sparkSession.createDataFrame(
            _pd.DataFrame(
                {"y": ys.astype("int32"), "x": xs.astype("int32"),
                 "is_predef": True}
            ),
            schema="y int, x int, is_predef boolean",
        )
        masked = (
            masked.join(F.broadcast(pmask), ["y", "x"], "left")
            .withColumn(
                "base_mask",
                F.col("base_mask") | F.coalesce("is_predef", F.lit(False)),
            )
            .drop("is_predef")
        )
    px = _bar(_obs(
        masked.drop(*drop_cols),
        "corrections",
        F.count(F.lit(1)).alias("n_px"),
        F.count_if(F.col("base_mask")).alias("n_base_masked"),
    ), dense=True, label="px")
    # Per-batch image_id -> index map (round 14): lets the three dense
    # barrier stages key their probes/aggregations on packed longs instead
    # of (image_id STRING, ...) — see _pk_expr. ONE tiny cached-scan job
    # (it subsumes the distinct-count the gradient/h-maxima feeds already
    # ran for n_images). Eager only: under a lazy barrier a collect here
    # would force materialization (dump_plans relies on persist staying
    # lazy), and the legacy 3-column joins remain correct either way.
    image_index = None
    if eager and shape[0] <= 8192 and shape[1] <= 8192:
        ids = sorted(
            r[0] for r in px.select("image_id").distinct().collect()
        )
        if n_images is None:
            n_images = len(ids)
        # amortization gate: below ~4M total pixels the packed path's
        # extra projections + plan/codegen cost exceed the probe saving
        # (alternating A/B on the 512^2 single-image bench plan: packed
        # med 5.23 s vs legacy 4.84 — the probe there is 262k rows);
        # one full-res 2880^2 image (8.3M px) is already far past
        # break-even (~28 run core-s saved per dense pass per image).
        if (
            0 < len(ids) <= _PK_MAX_IMAGES
            and shape[0] * shape[1] * len(ids) >= 4_000_000
        ):
            image_index = {s: i for i, s in enumerate(ids)}
    # The sparse intermediates (outlier/om/labeled pixel sets, label table)
    # feed several downstream outputs; persist them so the expensive
    # upstream (ring stats + raster kernels) runs once, not once per output.
    # They are ~1e4-1e5 rows per image — cheap to cache at any scale.
    outliers = _bar(_obs(
        outlier_pixels(
            px, esd_mul=controls.esd_mul, image_index=image_index
        ),
        "outlier_mask",
        F.count(F.lit(1)).alias("n_outlier_px"),
    ), label="outliers")
    # Join-strategy hint for the sparse⋈dense joins downstream (mask sets
    # against the pixel raster). Under the checkpoint barrier the sparse
    # frames are LogicalRDDs with UNKNOWN stats, so AQE falls back to a
    # sort-merge join that shuffles the DENSE pixel side (measured 1.2-2 GB
    # shuffle writes per join at 8 x 2880^2); an explicit broadcast hint on
    # the sparse side removes every one of those exchanges. Gated on the
    # materialized OUTLIER row count (a cheap cached scan — the barrier
    # already ran it eagerly; the 3x3 closing only grows the set by gap
    # fill, far inside the threshold's safety margin) so a pathologically
    # dense mask falls back to SMJ instead of a driver-sized broadcast.
    # Under "persist" the frames are InMemoryRelations whose stats AQE
    # already sees — no hint needed.
    if eager and outliers.count() <= sparse_broadcast_rows:
        sb = F.broadcast
    else:
        sb = None
    # split construction (round 8): materialize the lpx barrier FIRST,
    # then build label_table FROM the barrier — the tuple form re-ran
    # the labeling kernel + the 66M-row px join inside the label_table
    # checkpoint job (one of the three big localCheckpoint stages in the
    # round-7 warm profile).
    # M2+M1 fusion (round 14, closing_radius=1): the closing runs INSIDE
    # the labeling kernel, so the separate om barrier (a whole eager
    # checkpoint job + a second applyInPandas pass + its image_id
    # exchange) is gone; the closed mask is the (image_id, y, x)
    # projection of the lpx barrier (every closed pixel is labeled).
    lpx = _bar(_obs(
        labeled_pixels_frame(
            px, outliers, shape, sparse_hint=sb,
            # closed-form calibration => the lpx probe reads only
            # intensity off the dense cache (geometry recomputed on the
            # sparse rows, bit-identical); a real calib table keeps the
            # full-column probe
            controls=controls if calib is None else None,
            closing_radius=1,
            image_index=image_index,
        ),
        "binary_closing",
        F.count(F.lit(1)).alias("n_om_px"),
    ), label="lpx")
    om = lpx.select("image_id", "y", "x")
    label_table = _bar(_obs(
        label_table_from(lpx),
        "shape_classification",
        F.count(F.lit(1)).alias("n_clusters"),
        F.count_if(F.col("classifier") == 1).alias("n_spots"),
        F.count_if(F.col("classifier") == 2).alias("n_arcs"),
    ), label="label_table")
    # one sparse flag table covers all three mask variants: the om set IS
    # the labeled pixel set, and spot/arc membership is the classifier (or
    # the gradient stage's refined new_spot/new_arc flags)
    grad = None
    if (gradient_stage or h_maxima) and n_images is None and eager:
        # cheap column-pruned count on the already-materialized px
        # barrier — lets the band-kernel and h-maxima feeds pin a balanced
        # explicit partition count (streaming callers don't know the
        # batch's image count up front)
        n_images = px.select("image_id").distinct().count()
    if gradient_stage:
        from xrddatapipeline_spark.plans.gradient_stage import gradient_classify

        # plain (row-checkpoint) barrier even under "hybrid": the gradient
        # raster has only 2 consumers (thresholds kernel, lpx join), so a
        # columnar cache build never pays for itself there — measured
        # 135 s/task vs ~44 s at 8 x 2880^2
        grad = gradient_classify(
            px, lpx, label_table, controls, barrier_fn=_bar, sparse_hint=sb,
            n_images=n_images,
        )
        mask_flags = grad.pixel_flags.select(
            "image_id", "y", "x",
            F.lit(True).alias("is_om"),
            F.col("new_spot").alias("is_spot_px"),
            F.col("new_arc").alias("is_arc_px"),
        )
    else:
        mask_flags = classifier_mask_flags(lpx, label_table)
    # A1 + A15 fused: one pixel-table scan serves both outputs (GROUPING
    # SETS — see integrate_and_spottiness). The fused agg frame is tiny
    # (images x bins), so it takes a barrier; the two derived outputs are
    # then trivial selects instead of two independent 66M-row scan+probe
    # jobs (the round-9 profile priced the separate spottiness job at
    # 176-548 core-s per warm batch).
    fused_bins = _bar(
        integrate_and_spottiness(
            px, mask_flags, controls, sparse_hint=sb,
            image_index=image_index,
        ),
        label="intspot",
    )
    integrals = _obs(
        split_integrals(fused_bins, controls),
        "integrations",
        F.count(F.lit(1)).alias("n_integral_rows"),
    )
    stats = spot_stats(lpx, label_table, px, sparse_hint=sb)
    spotty = split_spottiness(fused_bins)
    hm = None
    if h_maxima:
        # A19/M6 runs inside the spottiness stage in the reference
        # (spottiness.py:64-84); spot membership comes from the same flag
        # table the integrals consume (gradient-refined when enabled).
        hm = _obs(
            h_maxima_per_qbin(
                px,
                mask_flags.where(F.col("is_spot_px")).select(
                    "image_id", "y", "x"
                ),
                controls,
                n_images=n_images,
                # closed-form calibration => qbin re-attaches bit-identically
                # to the sparse maxima; a calib TABLE keeps it in the feed
                recompute_qbin=calib is None,
            ),
            "h_maxima",
            F.count(F.lit(1)).alias("n_hmax_rows"),
        )
    return ImagePlanResult(
        pixels=px,
        outliers=outliers,
        om_pixels=om,
        labeled_pixels=lpx,
        label_table=label_table,
        integrals=integrals,
        spot_stats=stats,
        spottiness=spotty,
        h_maxima=hm,
        gradient=grad,
        fused_bins=fused_bins,
        observations=obs,
    )
