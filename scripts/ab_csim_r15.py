#!/usr/bin/env python
"""Round-15 A/B: cosine_similarity_series window-sort layout — r7 layout
(partitionBy(dataset, yx), separate seq/intensity ints) vs the r15 one
(partitionBy(yx, dataset) so the sort prefix is the discriminating packed
long, and (seq, intensity) shipped as ONE long). Genuine 8 x 2880^2 raw
pixel frame, alternating reps, REST run/cpu + post-compression shuffle
bytes per variant (the r14 h-maxima lesson: check bytes, not row width).

Usage: python scripts/ab_csim_r15.py [reps=4]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrddatapipeline_spark.session import get_spark  # noqa: E402


def legacy_csim(pixels):
    """The pre-r15 formulation, inlined verbatim."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ids = pixels.select("dataset", "seq", "image_id").distinct()
    yx = (
        F.shiftleft(F.col("y").cast("long"), 32) + F.col("x").cast("long")
    ).alias("yx")
    src = pixels.select("dataset", "seq", yx, "intensity")
    w = Window.partitionBy("dataset", "yx").orderBy("seq")
    paired = src.select(
        "dataset", "seq", "intensity",
        F.coalesce(F.lag("intensity").over(w), F.col("intensity"))
        .alias("v_prev"),
        F.first("intensity").over(w).alias("v_first"),
    )
    dot = lambda a, b: F.sum(  # noqa: E731
        F.col(a).cast("double") * F.col(b).cast("double")
    )

    def _csim(other):
        denom = F.sqrt(dot("intensity", "intensity") * dot(other, other))
        return F.when(denom > 0, dot("intensity", other) / denom)

    sims = paired.groupBy("dataset", "seq").agg(
        _csim("v_first").alias("csim_first"),
        _csim("v_prev").alias("csim_prev"),
    )
    return sims.join(F.broadcast(ids), ["dataset", "seq"]).select(
        "dataset", "seq", "image_id", "csim_first", "csim_prev"
    )


def main() -> None:
    from pyspark import StorageLevel

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="xrdspark-ab-csim",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true",
                    "spark.ui.retainedStages": "8000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench as B
    from xrddatapipeline_spark.calib.geometry import ImageControls
    from xrddatapipeline_spark.plans.image_pipeline import (
        cosine_similarity_series,
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
    print("px rows:", pixels.count(), flush=True)

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

    variants = {
        "r15": lambda: cosine_similarity_series(pixels),
        "r7": lambda: legacy_csim(pixels),
    }

    def once(name):
        before = _done()
        spark.sparkContext.setJobDescription(f"csim:{name}")
        t0 = time.perf_counter()
        variants[name]().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(1.0)
        new = [s for k, s in _done().items() if k not in before]
        run = sum(s.get("executorRunTime", 0) for s in new) / 1000
        cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e9
        swb = sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6
        return wall, run, cpu, swb

    # sanity: identical results on a small slice
    from pyspark.sql import functions as F
    small = pixels.where(F.col("seq") < 2).where(F.col("y") < 64)
    a = sorted(cosine_similarity_series(small).collect())
    b = sorted(legacy_csim(small).collect())
    assert a == b, "variant results differ!"
    print("parity on slice OK", flush=True)

    for name in variants:  # JIT warmup
        once(name)
    recs = {k: [] for k in variants}
    for rep in range(reps):
        order = ["r15", "r7"] if rep % 2 == 0 else ["r7", "r15"]
        for name in order:
            wall, run, cpu, swb = once(name)
            recs[name].append((wall, run, cpu, swb))
            print(
                f"rep{rep} {name:4s} wall={wall:6.1f} run={run:7.1f} "
                f"cpu={cpu:7.1f} shufMB={swb:8.1f}",
                flush=True,
            )
    for name, rs in recs.items():
        runs = sorted(r[1] for r in rs)
        walls = sorted(r[0] for r in rs)
        print(
            f"== {name}: run med={statistics.median(runs):.1f} "
            f"min={runs[0]:.1f} wall med={statistics.median(walls):.1f} "
            f"shufMB={sorted(round(r[3],1) for r in rs)}"
        )


if __name__ == "__main__":
    main()
