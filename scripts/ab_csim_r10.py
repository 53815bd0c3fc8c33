#!/usr/bin/env python
"""Round-10 A/B (VERDICT r9 task 5): csim formulations at 8 x 2880^2.

out:csim was the top stage of the round-9 cold profile (1405 core-s). The
window formulation pays one 66 M-row exchange + a GLOBAL SORT per
partition. Candidates measured here, interleaved (weather cancels):

  window   — current: Window.partitionBy(dataset, yx).orderBy(seq)
             (exchange + sort + window eval + partial agg)
  pivot    — same single exchange, but the per-key pairing is a codegen
             HashAggregate: per (dataset, yx) compute v_s for each seq via
             max(when(seq==s, v)) — no sort anywhere; products explode to
             a map-side-collapsed 8-key agg
  selfjoin — the streaming path's join shape in batch form: src ⋈ prev on
             (dataset, seq, yx) + src ⋈ first on (dataset, yx) — THREE
             66 M-row exchanges + SMJ sorts (expected worst in batch; the
             streaming variant wins only via partition pruning on a store)

Prints one JSON line per run + a summary; values cross-checked to 1e-12
against the window formulation before timing counts.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets SPARK_DRIVER_MEMORY)
from xrddatapipeline_spark.session import get_spark  # noqa: E402


def csim_pivot(pixels, seqs):
    from pyspark.sql import functions as F

    ids = pixels.select("dataset", "seq", "image_id").distinct()
    yx = (
        F.shiftleft(F.col("y").cast("long"), 32) + F.col("x").cast("long")
    ).alias("yx")
    src = pixels.select("dataset", yx, "seq", "intensity")
    seqs = sorted(seqs)
    wide = src.groupBy("dataset", "yx").agg(
        *[
            F.max(F.when(F.col("seq") == s, F.col("intensity"))).alias(f"v{s}")
            for s in seqs
        ]
    )
    pairs = []
    for i, s in enumerate(seqs):
        v = F.col(f"v{s}").cast("double")
        vp = F.col(f"v{seqs[max(0, i - 1)]}").cast("double")
        v0 = F.col(f"v{seqs[0]}").cast("double")
        pairs.append(
            F.struct(
                F.lit(s).alias("seq"),
                (v * v).alias("p_self"),
                (v * vp).alias("p_prev"),
                (vp * vp).alias("p_prevn"),
                (v * v0).alias("p_first"),
                (v0 * v0).alias("p_firstn"),
            )
        )
    ex = wide.select(
        "dataset", F.explode(F.array(*pairs)).alias("e")
    ).select("dataset", "e.*")
    sims = ex.groupBy("dataset", "seq").agg(
        (
            F.sum("p_first") / F.sqrt(F.sum("p_self") * F.sum("p_firstn"))
        ).alias("csim_first"),
        (
            F.sum("p_prev") / F.sqrt(F.sum("p_self") * F.sum("p_prevn"))
        ).alias("csim_prev"),
    )
    return sims.join(F.broadcast(ids), ["dataset", "seq"]).select(
        "dataset", "seq", "image_id", "csim_first", "csim_prev"
    )


def csim_selfjoin(pixels):
    from pyspark.sql import functions as F

    ids = pixels.select("dataset", "seq", "image_id").distinct()
    yx = (
        F.shiftleft(F.col("y").cast("long"), 32) + F.col("x").cast("long")
    ).alias("yx")
    src = pixels.select("dataset", "seq", yx, "intensity")
    prev = src.select(
        "dataset",
        (F.col("seq") + 1).alias("seq"),
        "yx",
        F.col("intensity").alias("v_prev"),
    )
    first = src.where(F.col("seq") == 0).select(
        "dataset", "yx", F.col("intensity").alias("v_first")
    )
    j = (
        src.join(prev, ["dataset", "seq", "yx"], "left")
        .join(first, ["dataset", "yx"], "left")
        .select(
            "dataset",
            "seq",
            "intensity",
            F.coalesce("v_prev", "intensity").alias("v_prev"),
            F.coalesce("v_first", "intensity").alias("v_first"),
        )
    )
    dot = lambda a, b: F.sum(  # noqa: E731
        F.col(a).cast("double") * F.col(b).cast("double")
    )
    sims = j.groupBy("dataset", "seq").agg(
        (
            dot("intensity", "v_first")
            / F.sqrt(dot("intensity", "intensity") * dot("v_first", "v_first"))
        ).alias("csim_first"),
        (
            dot("intensity", "v_prev")
            / F.sqrt(dot("intensity", "intensity") * dot("v_prev", "v_prev"))
        ).alias("csim_prev"),
    )
    return sims.join(F.broadcast(ids), ["dataset", "seq"]).select(
        "dataset", "seq", "image_id", "csim_first", "csim_prev"
    )


def main() -> None:
    from pyspark import StorageLevel

    from xrddatapipeline_spark.calib.geometry import ImageControls
    from xrddatapipeline_spark.plans.image_pipeline import (
        cosine_similarity_series,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="xrdspark-ab-csim",
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
    seqs = list(range(batch))

    variants = {
        "window": lambda: cosine_similarity_series(pixels),
        "pivot": lambda: csim_pivot(pixels, seqs),
        "selfjoin": lambda: csim_selfjoin(pixels),
    }

    # correctness gate (tiny collect: 8 rows per variant)
    base = {
        (r.dataset, r.seq): (r.csim_first, r.csim_prev)
        for r in variants["window"]().collect()
    }
    for name in ("pivot", "selfjoin"):
        got = {
            (r.dataset, r.seq): (r.csim_first, r.csim_prev)
            for r in variants[name]().collect()
        }
        assert got.keys() == base.keys(), name
        for k, (f1, p1) in base.items():
            f2, p2 = got[k]
            assert abs(f1 - f2) < 1e-12 and abs(p1 - p2) < 1e-12, (
                name, k, (f1, p1), (f2, p2)
            )
    print("correctness gate: pivot + selfjoin match window to 1e-12",
          flush=True)

    # REST stage capture
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

    results: dict[str, list] = {n: [] for n in variants}
    order = ["window", "pivot", "selfjoin"] * 3
    for rep, name in enumerate(order):
        before = _done()
        spark.sparkContext.setLocalProperty("callSite.short", f"csim:{name}")
        t0 = time.perf_counter()
        variants[name]().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setLocalProperty("callSite.short", None)
        after = _done()
        new = [s for k, s in after.items() if k not in before]
        run = sum(s.get("executorRunTime", 0) for s in new) / 1000
        cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e9
        rec = {
            "variant": name, "rep": rep, "wall_sec": round(wall, 2),
            "run_core_sec": round(run, 1), "cpu_core_sec": round(cpu, 1),
            "n_stages": len(new),
        }
        results[name].append(rec)
        print(json.dumps(rec), flush=True)

    summary = {
        n: {
            "wall_min": round(min(r["wall_sec"] for r in rs), 2),
            "wall_med": round(
                statistics.median(r["wall_sec"] for r in rs), 2
            ),
            "run_min": round(min(r["run_core_sec"] for r in rs), 1),
            "cpu_min": round(min(r["cpu_core_sec"] for r in rs), 1),
        }
        for n, rs in results.items()
    }
    print("SUMMARY " + json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
