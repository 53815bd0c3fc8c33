"""Synthetic detector-image fixtures per FIXTURES.md.

256x256 detector, smooth powder rings + planted Gaussian spots + texture
arcs (narrow in Q, wide in azimuth) + one arc crossing azimuth 0/360 +
hot outlier pixels + a dead (zero) block. Deterministic (seed 42).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from xrddatapipeline_spark.calib.geometry import ImageControls, compute_maps_numpy

CONTROLS = ImageControls(
    wavelength=0.24087,
    distance=85.0,
    center_x=19.2,
    center_y=19.2,
    tilt=0.0,
    rotation=0.0,
    pixel_size_x=150.0,
    pixel_size_y=150.0,
    size_x=256,
    size_y=256,
    iotth=(1.0, 12.7),
    out_channels=250,
    num_chans_om=250,
    pola_val=0.99,
    esd_mul=3.0,
    dataset="synth",
)

RING_TTHS = [2.0, 3.5, 5.0, 7.0, 9.5, 11.5]


def make_image(
    c: ImageControls = CONTROLS,
    seq: int = 0,
    rng: np.random.Generator | None = None,
    n_spots: int = 6,
    n_arcs: int = 2,
    wrap_arc: bool = True,
) -> np.ndarray:
    # spot/arc positions are seq-independent (the sample doesn't jump
    # between frames); intensities drift slowly with seq so csim vs
    # first/prev stays high but decays — FIXTURES.md "slow drift"
    pos_rng = np.random.default_rng(4242)
    ev_rng = rng or np.random.default_rng(42 + seq)
    drift = 1.0 - 0.03 * seq
    maps = compute_maps_numpy(c)
    tth, azim, q = maps["tth"], maps["azim"], maps["q"]

    img = np.full((c.size_y, c.size_x), 100.0)
    for i, rt in enumerate(RING_TTHS):
        amp = 2000.0 * drift * (1.0 + 0.3 * i % 2)
        img += amp * np.exp(-((tth - rt) ** 2) / (2 * 0.15**2))

    # spots: tight 2-D Gaussians at fixed positions whose azimuths avoid
    # the arc sectors (40-75, 200-245, 330-30) so closing can't merge a
    # spot into an arc cluster and skew its Q extent
    spot_specs = [
        (170, 128, 2.0, 30000.0),  # azim ~89
        (200, 100, 1.5, 26000.0),  # azim ~111
        (160, 60, 1.4, 42000.0),   # azim ~154
        (60, 160, 1.7, 50000.0),   # azim ~296
        (90, 170, 1.8, 46000.0),   # azim ~312
        (40, 128, 2.4, 49000.0),   # azim ~270
    ]
    ys, xs = np.mgrid[0 : c.size_y, 0 : c.size_x]
    for sy, sx, ss, amp in spot_specs[:n_spots]:
        img += (
            amp * drift * np.exp(-(((ys - sy) ** 2 + (xs - sx) ** 2)) / (2 * ss**2))
        )

    # arcs: narrow in tth, wide in azim (classifier targets arc thresholds);
    # placed at large enough tth that the sigma-clipped core exceeds the
    # MIN_ARC_AREA=100 px threshold on the 256 px detector
    arc_specs = [(9.5, 40.0, 75.0), (7.0, 200.0, 245.0)][:n_arcs]
    if wrap_arc:
        # between rings (6.0) so it doesn't merge with ring outliers;
        # tighter in tth so the clipped core stays Q-narrow even where
        # the local ring MAD is small
        arc_specs.append((6.0, 330.0, 30.0, 0.025))  # crosses 0/360
    for spec in arc_specs:
        at, a0, a1 = spec[:3]
        sig = spec[3] if len(spec) > 3 else 0.04
        if a0 <= a1:
            in_azim = (azim >= a0) & (azim <= a1)
        else:
            in_azim = (azim >= a0) | (azim <= a1)
        img += 25000.0 * np.exp(-((tth - at) ** 2) / (2 * sig**2)) * in_azim

    # hot single-pixel outliers (per-image random; amplitude well above any
    # ring's within-bin spread but small enough not to dominate the image
    # norm, so csim still reads the drift)
    for _ in range(40):
        hy = int(ev_rng.integers(0, c.size_y))
        hx = int(ev_rng.integers(0, c.size_x))
        img[hy, hx] += 20000.0

    # dead block (nonpositive-mask path)
    img[0:12, 0:12] = 0.0
    return np.round(img).astype(np.int32)


def images_long_df(spark, images: list[tuple[str, int, np.ndarray]]):
    """Long-form pixels DataFrame: (dataset, seq, image_id, y, x, intensity)."""
    frames = []
    for dataset, seq, img in images:
        h, w = img.shape
        ys, xs = np.mgrid[0:h, 0:w]
        frames.append(
            pd.DataFrame(
                {
                    "dataset": dataset,
                    "seq": np.int32(seq),
                    "image_id": f"{dataset}-{seq:05d}",
                    "y": ys.ravel().astype(np.int32),
                    "x": xs.ravel().astype(np.int32),
                    "intensity": img.ravel(),
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    # repartition so the frame becomes an executor-side relation: pandas
    # frames below Spark's local-relation threshold otherwise stay a
    # LocalRelation, and ConvertToLocalRelation then evaluates downstream
    # expression chains interpreted single-threaded on the DRIVER
    # (~30us/row vs ~0.1us/row codegen'd on executors)
    n_parts = max(spark.sparkContext.defaultParallelism, len(images))
    return spark.createDataFrame(pdf).repartition(n_parts)
