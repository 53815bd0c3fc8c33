#!/usr/bin/env python
"""Round-14 A/B: xrd_image_plan_512 barrier mode at bench shape.

The 512^2 single-image plan is the one fixed-size item inside the
headline `queries` total (~4.2 s of the ~21 s r13 line). Its eager
local_checkpoint barrier chain materializes ~5 intermediates as serial
jobs before the 4 output jobs run — at 262k pixels that is mostly
scheduling/latency, not compute. A/B the barrier modes (identical
outputs; reuse-boundary implementation only) with the bench's session
confs and methodology (min of reps, noop sinks).

Usage: python scripts/ab_plan512_r14.py [reps=5]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrddatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="xrdspark-ab-plan512",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.codegen.hugeMethodLimit": "3000",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench as B
    from xrddatapipeline_spark.calib.cache import build_calib_pixels
    from xrddatapipeline_spark.calib.geometry import ImageControls
    from xrddatapipeline_spark.plans.image_pipeline import run_image_plan

    size = 512
    c = ImageControls(
        wavelength=0.24087, distance=size / 3.0,
        center_x=size * 150.0 / 2000.0, center_y=size * 150.0 / 2000.0,
        pixel_size_x=150.0, pixel_size_y=150.0,
        size_x=size, size_y=size, iotth=(1.0, 12.7),
        out_channels=1000, num_chans_om=500, pola_val=0.99,
        esd_mul=3.0, dataset="bench",
    )
    calib = build_calib_pixels(spark, c).persist()
    calib.count()
    pixels = B._synthetic_pixels(spark, c, n_images=1).persist()
    pixels.count()

    def once(barrier: str) -> float:
        t0 = time.perf_counter()
        res = run_image_plan(pixels, calib, c, barrier=barrier)
        for out in (res.integrals, res.spot_stats, res.spottiness,
                    res.outliers):
            out.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        res.unpersist_all()
        return el

    modes = ["local_checkpoint", "persist", "hybrid"]
    walls: dict[str, list[float]] = {m: [] for m in modes}
    for r in range(reps):
        for m in modes:  # alternate to spread weather across arms
            spark.sparkContext.setJobDescription(f"plan512:{m}:rep{r}")
            walls[m].append(round(once(m), 3))
    for m in modes:
        xs = sorted(walls[m])
        print(f"{m:18s} min={xs[0]:.3f} med={xs[len(xs)//2]:.3f} all={walls[m]}")


if __name__ == "__main__":
    main()
