#!/usr/bin/env python
"""Round-14 A/B: h-maxima kernel feed grouped by an int image index vs the
image_id string — genuine 8 x 2880^2 px frame, alternating reps.

Usage: python scripts/ab_hmax_idx_r14.py [reps=4]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrddatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="xrdspark-ab-hmax-idx",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench as B
    from xrddatapipeline_spark.calib.geometry import ImageControls
    from xrddatapipeline_spark.plans.image_pipeline import (
        h_maxima_per_qbin,
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
    drop = ["tth", "azim_band", "azim_mask", "dataset", "seq", "q", "azim"]
    masked = with_base_mask(
        join_calib(pixels, None, broadcast=True, controls=c), controls=c
    )
    px = masked.drop(*[col for col in drop if col in masked.columns]).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    print("px rows:", px.count(), flush=True)
    ids = sorted(r[0] for r in px.select("image_id").distinct().collect())
    idx = {s: i for i, s in enumerate(ids)}
    spot = (
        px.where(F.col("intensity") > 3000)
        .select("image_id", "y", "x")
        .localCheckpoint(eager=True)
    )
    print("spot rows:", spot.count(), flush=True)

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    variants = {
        "hmax_str": lambda: _noop(h_maxima_per_qbin(
            px, F.broadcast(spot), c, n_images=batch, recompute_qbin=True)),
        "hmax_idx": lambda: _noop(h_maxima_per_qbin(
            px, F.broadcast(spot), c, n_images=batch, recompute_qbin=True,
            image_index=idx)),
    }

    def _rest(path):
        import urllib.request
        with urllib.request.urlopen(
            f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
            f"{spark.sparkContext.applicationId}/{path}", timeout=60,
        ) as r:
            return json.load(r)

    def _done():
        return {(s["stageId"], s["attemptId"]): s
                for s in _rest("stages?status=complete")}

    for fn in variants.values():
        fn()
    recs = []
    for rep in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab:{name}")
            before = _done()
            t0 = time.perf_counter()
            fn()
            wall = time.perf_counter() - t0
            new = [s for k, s in _done().items() if k not in before]
            recs.append({
                "variant": name, "rep": rep, "wall": round(wall, 2),
                "run": round(sum(s.get("executorRunTime", 0)
                                 for s in new) / 1000, 1),
                "cpu": round(sum(s.get("executorCpuTime", 0)
                                 for s in new) / 1e9, 1),
                "shW_mb": round(sum(s.get("shuffleWriteBytes", 0)
                                    for s in new) / 1e6, 1),
            })
            print(json.dumps(recs[-1]), flush=True)
    print("\n== medians ==")
    for name in variants:
        rs = [r for r in recs if r["variant"] == name]
        print(f"{name:10s} run med={statistics.median([r['run'] for r in rs]):7.1f}"
              f" cpu med={statistics.median([r['cpu'] for r in rs]):7.1f}"
              f" wall med={statistics.median([r['wall'] for r in rs]):6.2f}"
              f" shW med={statistics.median([r['shW_mb'] for r in rs]):7.1f}MB",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
