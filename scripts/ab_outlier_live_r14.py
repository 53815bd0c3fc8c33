#!/usr/bin/env python
"""Round-14 LIVE A/B: outlier route over the GENUINE keep-up px frame.

The isolated A/B (ab_outlier_route_r14.py) measured histogram 11.8 s vs
array 39.2 s per pass — but it synthesized its own candidate frame; the
live keep-up profile could not confirm the win inside its weather band.
This script removes the proxy: it builds the keep-up's real px barrier
(8 x 2880^2 synthetic frames, closed-form calibration, base-mask fold,
local-checkpointed exactly like run_image_plan does) and then alternates
ONLY the `barrier:outliers` materialization between the two routes, in
one session, several reps — the same stage the live profiler labels.

Usage: python scripts/ab_outlier_live_r14.py [reps=3]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrddatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="xrdspark-ab-outlier-live",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    import bench as B
    from xrddatapipeline_spark.calib.geometry import ImageControls
    from xrddatapipeline_spark.plans import image_pipeline as IP
    from xrddatapipeline_spark.plans.image_pipeline import (
        join_calib,
        with_base_mask,
    )

    size, batch = 2880, 8
    c = ImageControls(
        wavelength=0.24087, distance=size / 3.0,
        center_x=size * 150.0 / 2000.0, center_y=size * 150.0 / 2000.0,
        pixel_size_x=150.0, pixel_size_y=150.0,
        size_x=size, size_y=size, iotth=(1.0, 12.7),
        out_channels=2500, num_chans_om=500, pola_val=0.99,
        esd_mul=3.0, dataset="bench",
    )
    pixels = B._synthetic_pixels(spark, c, n_images=batch).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pixels.count()

    drop_cols = ["tth", "azim_band", "azim_mask", "dataset", "seq", "q", "azim"]
    masked = with_base_mask(
        join_calib(pixels, None, broadcast=True, controls=c), controls=c
    )
    px = masked.drop(*[col for col in drop_cols if col in masked.columns])
    px = px.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    print("px rows:", px.count(), flush=True)
    print(
        "distinct (image, ring, intensity) vs candidate rows:",
        px.where(~F.col("base_mask") & (F.col("ring_idx") > 0))
        .select("image_id", "ring_idx", "intensity").distinct().count(),
        px.where(~F.col("base_mask") & (F.col("ring_idx") > 0)).count(),
        flush=True,
    )

    def once(hist: bool) -> float:
        IP.OUTLIER_HISTOGRAM = hist
        spark.sparkContext.setJobDescription(
            f"outliers-live:{'hist' if hist else 'array'}"
        )
        t0 = time.perf_counter()
        out = IP.outlier_pixels(px, esd_mul=c.esd_mul)
        chk = out.localCheckpoint(
            eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
        )
        el = time.perf_counter() - t0
        n = chk.count()
        chk.unpersist()
        return el, n

    walls = {True: [], False: []}
    for r in range(reps):
        for hist in (True, False):
            el, n = once(hist)
            walls[hist].append(round(el, 2))
            print(f"rep{r} {'hist ' if hist else 'array'} {el:6.2f}s n={n}",
                  flush=True)
    for hist in (True, False):
        xs = sorted(walls[hist])
        print(f"{'hist ' if hist else 'array'} min={xs[0]} med={xs[len(xs)//2]} all={walls[hist]}")


if __name__ == "__main__":
    main()
