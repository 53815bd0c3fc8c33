#!/usr/bin/env python
"""Round-14 A/B: outlier ring-stat route — array (collect_list of every
candidate intensity) vs histogram (map-side-combined (key, value) counts).

The array-route-locally decision predates the round-14 shuffle-writer fix
(bypassMergeThreshold=1): the bypass writer's pathology dominated every
shuffle, so relative route costs measured then are stale. Detector
intensities are heavily quantized (the bench's synthetic frames carry
~175 distinct values; real background rings are Poisson-narrow), so the
histogram route's (image, ring, intensity) pre-aggregation shuffles far
fewer rows. Routes are lockstep-tested bit-equal (test_ring_stats_hist).

Alternates A,B,A,B over the SAME persisted candidate frame at the
production shape (8 x 2880^2, 2500 rings, bench intensity model).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrddatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from xrddatapipeline_spark.operators.ring_stats import flag_outliers

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="xrdspark-ab-outlier-route",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    size, batch, n_rings = 2880, 8, 2500
    r = F.sqrt(
        (F.col("y") - size / 2.0) ** 2 + (F.col("x") - size / 2.0) ** 2
    )
    max_r = (2.0 ** 0.5) * size / 2.0
    intensity = (
        F.lit(50)
        + F.lit(150.0) * F.pow(F.sin(r / 3.0), 2)
        + F.pmod(F.xxhash64("y", "x", "seq"), F.lit(13))
        + F.when(
            F.pmod(F.xxhash64("x", "y", "seq", F.lit(7)), F.lit(911)) == 0,
            4000,
        ).otherwise(0)
    ).cast("int")
    px = (
        spark.range(size * size * batch)
        .select(
            (F.col("id") / (size * size)).cast("int").alias("seq"),
            ((F.col("id") / size).cast("long") % size).cast("int").alias("y"),
            (F.col("id") % size).cast("int").alias("x"),
        )
        .withColumn("image_id", F.format_string("img-%05d", "seq"))
        .withColumn("intensity", intensity)
        .withColumn(
            "ring_idx", (r / F.lit(max_r) * n_rings).cast("int") + 1
        )
        .select("image_id", "y", "x", "ring_idx", "intensity")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    print("px rows:", px.count(), flush=True)

    def run(histogram: bool) -> None:
        flagged = flag_outliers(
            px, keys=["image_id", "ring_idx"], value="intensity",
            esd_mul=3.0, min_count=10, histogram=histogram,
        )
        out = flagged.where(F.col("is_outlier")).select("image_id", "y", "x")
        out.write.format("noop").mode("overwrite").save()

    reps = int(os.environ.get("AB_REPS", "4"))
    walls: dict[str, list[float]] = {"array": [], "hist": []}
    run(False)
    run(True)
    for _ in range(reps):
        for name, flag in (("array", False), ("hist", True)):
            t0 = time.perf_counter()
            run(flag)
            walls[name].append(round(time.perf_counter() - t0, 3))
    out = {
        k: {"walls": v, "min": min(v), "median": sorted(v)[len(v) // 2]}
        for k, v in walls.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
