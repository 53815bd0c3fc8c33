#!/usr/bin/env python
"""Round-10 A/B (VERDICT r9 task 3): gradient band count at 8 x 2880^2.

barrier:grad_fused showed run/cpu ~= 4.1 in the round-9 profile (1007 run /
245 JVM-cpu core-s, 192 tasks). For a cogrouped-Python stage the JVM task
thread blocks while the Python kernel computes, so executorCpuTime counts
only JVM-side Arrow work — the ratio is structural unless the Python time
itself shrinks or the tasks pack better into waves. At band_rows=512 an
8-image batch makes 48 kernel groups on 32 cores = 1.5 waves (the second
wave runs 16 kernels on 32 cores — half the slots idle while the stage
tail drags). Candidates:

  720 ->  4 bands x 8 images = 32 groups: exactly one wave
  512 ->  6 x 8 = 48 groups: 1.5 waves (current default)
  360 ->  8 x 8 = 64 groups: 2 full waves, smaller tasks pipeline better

Each variant runs a full keep-up batch (gradient + h-maxima + csim + all
outputs), interleaved x2; per-run we record batch wall, the grad_fused
stage's wall/run/cpu, and total batch core-seconds.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from xrddatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import StorageLevel

    from xrddatapipeline_spark.calib.geometry import ImageControls
    from xrddatapipeline_spark.plans.image_pipeline import (
        cosine_similarity_series,
        run_image_plan,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="xrdspark-ab-gradband",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    size = 2880
    batch = 8
    c = ImageControls(
        wavelength=0.24087, distance=959.0,
        center_x=size * 150.0 / 2000.0, center_y=size * 150.0 / 2000.0,
        pixel_size_x=150.0, pixel_size_y=150.0, size_x=size, size_y=size,
        iotth=(1.0, 12.7), out_channels=2500, num_chans_om=1000,
        pola_val=0.99, esd_mul=3.0, dataset="keepup",
    )
    pixels = bench._synthetic_pixels(spark, c, n_images=batch).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pixels.count()

    def _rest(path):
        import urllib.request

        base_url = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base_url}/api/v1/applications/{app}/{path}", timeout=60
        ) as r:
            return json.load(r)

    def _done():
        return {
            (s["stageId"], s["attemptId"]): s
            for s in _rest("stages?status=complete")
        }

    def _noop(o, label=None):
        if label:
            spark.sparkContext.setLocalProperty("callSite.short", label)
        try:
            o.write.format("noop").mode("overwrite").save()
        finally:
            if label:
                spark.sparkContext.setLocalProperty("callSite.short", None)

    def one_batch(band_rows: int) -> dict:
        os.environ["XRDSPARK_GRAD_BAND_ROWS"] = str(band_rows)
        before = _done()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as pool:
            csim_fut = pool.submit(
                _noop, cosine_similarity_series(pixels), "out:csim"
            )
            res = run_image_plan(
                pixels, None, c, gradient_stage=True, barrier="hybrid",
                n_images=batch, h_maxima=True,
            )
            outs = [
                (res.integrals, "out:integrals"),
                (res.spot_stats, "out:spot_stats"),
                (res.spottiness, "out:spottiness"),
                (res.outliers, "out:outliers"),
                (res.h_maxima, "out:h_maxima"),
                (res.gradient.on_arc_labels, "out:grad_arcs"),
            ]
            futs = [pool.submit(_noop, o, l) for o, l in outs]
            for f in futs:
                f.result()
            csim_fut.result()
        wall = time.perf_counter() - t0
        res.unpersist_all()
        after = _done()
        new = [s for k, s in after.items() if k not in before]
        gf = [s for s in new if "grad_fused" in s.get("name", "")]
        rec = {
            "band_rows": band_rows,
            "batch_wall_sec": round(wall, 2),
            "batch_run_core_sec": round(
                sum(s.get("executorRunTime", 0) for s in new) / 1000, 1
            ),
            "gf_stages": len(gf),
            "gf_tasks": sum(s.get("numCompleteTasks", 0) for s in gf),
            "gf_run_core_sec": round(
                sum(s.get("executorRunTime", 0) for s in gf) / 1000, 1
            ),
            "gf_cpu_core_sec": round(
                sum(s.get("executorCpuTime", 0) for s in gf) / 1e9, 1
            ),
        }
        return rec

    # pilot at the full-size controls (same as bench) so variant 1 doesn't
    # eat the JIT bill
    from dataclasses import replace as _replace

    from pyspark.sql import functions as F

    pc = _replace(c, dataset="pilot")
    ppx = (
        bench._synthetic_pixels(spark, pc, n_images=1)
        .where(F.col("y") < 512)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ppx.count()
    pres = run_image_plan(
        ppx, None, pc, gradient_stage=True, barrier="hybrid", n_images=1
    )
    pouts = [pres.integrals, pres.spot_stats, pres.spottiness, pres.outliers,
             cosine_similarity_series(ppx), pres.h_maxima,
             pres.gradient.on_arc_labels]
    with ThreadPoolExecutor(max_workers=len(pouts)) as pool:
        for f in [pool.submit(_noop, o) for o in pouts]:
            f.result()
    pres.unpersist_all()
    ppx.unpersist()
    print("pilot done", flush=True)

    import ast
    seq = ast.literal_eval(os.environ.get(
        'AB_GRADBAND_SEQ', '[512, 720, 360, 512, 720, 360]'))
    for band_rows in seq:
        rec = one_batch(band_rows)
        print(json.dumps(rec), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
