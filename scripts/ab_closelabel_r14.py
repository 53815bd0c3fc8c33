#!/usr/bin/env python
"""Round-14 A/B: M2+M1 fusion (close_and_label_pixels) vs the split form
(close_mask_pixels -> eager localCheckpoint barrier -> label_pixels).

The split form is what run_image_plan executed through r13: the closed
mask got its own eager checkpoint job (barrier:om) before the labeling
kernel ran as a second applyInPandas pass. The fused form runs closing
inside the labeling kernel: one exchange, one Arrow round, one rasterize,
no intermediate barrier. Variants alternate A,B,A,B so weather cancels
pairwise; both consume the SAME persisted sparse outlier frame at the
production shape (8 x 2880^2, ~1% outlier pixels).
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

    from xrddatapipeline_spark.operators.raster import (
        close_and_label_pixels,
        close_mask_pixels,
        label_pixels,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="xrdspark-ab-closelabel",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    size, batch = 2880, 8
    n_px = size * size
    shape = (size, size)
    # sparse outlier set, ~1% of pixels, clumped (every outlier seeds a
    # short horizontal run so closing/labeling sees realistic blobs)
    outliers = (
        spark.range(batch * n_px)
        .where((F.col("id") % 97) < 1)
        .select(
            F.concat(F.lit("img-"), (F.col("id") % batch).cast("string"))
            .alias("image_id"),
            ((F.col("id") % n_px) / size).cast("int").alias("y"),
            ((F.col("id") % n_px) % size).cast("int").alias("x"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    print("outlier rows:", outliers.count(), flush=True)

    def run_split() -> int:
        om = close_mask_pixels(outliers, shape=shape, radius=1)
        om = om.localCheckpoint(
            eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
        )
        lab = label_pixels(om, shape=shape, connectivity=2)
        lab.write.format("noop").mode("overwrite").save()
        om.unpersist()
        return 0

    def run_fused() -> int:
        lab = close_and_label_pixels(
            outliers, shape=shape, radius=1, connectivity=2
        )
        lab.write.format("noop").mode("overwrite").save()
        return 0

    reps = int(os.environ.get("AB_REPS", "4"))
    walls: dict[str, list[float]] = {"split": [], "fused": []}
    # warmup one of each (worker fork, JIT)
    run_split()
    run_fused()
    for _ in range(reps):
        for name, fn in (("split", run_split), ("fused", run_fused)):
            t0 = time.perf_counter()
            fn()
            walls[name].append(round(time.perf_counter() - t0, 3))
    out = {
        k: {"walls": v, "min": min(v), "median": sorted(v)[len(v) // 2]}
        for k, v in walls.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
