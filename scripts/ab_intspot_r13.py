#!/usr/bin/env python
"""Round-13 A/B: the fused A1+A15 aggregation shape (barrier:intspot).

After the r12 float32 work, barrier:intspot is the top stage in every
split arm (r13 per-arm profile, STATUS). The production shape is
GROUPING SETS ((image, tth_idx), (image, qbin)): Expand doubles the
66 M-row stream map-side and every copy carries all 10 aggregate
buffers (~20 agg-updates per source row). But tth_idx and qbin are
FUNCTIONALLY DEPENDENT (both monotone in 2theta), so a joint
groupBy(image, tth_idx, qbin) sees only ~2.6k live cells per image at
HALF the row volume and half the agg-updates; the two margins are then
re-aggregations of a ~21k-row frame (negligible, but included in
variant B's timing via an eager localCheckpoint + two tiny aggs, so B
pays its full production cost).

Both variants consume the SAME persisted `flagged` input (scan + flag
join excluded from the comparison — identical work either way).
Variants alternate A,B,A,B,... so host-weather drift cancels pairwise.
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

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="xrdspark-ab-intspot",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    size, batch = 2880, 8
    n_px = size * size
    # synthetic flagged frame with the production column shape and the
    # real functional dependence qbin = g(tth_idx); ~1% flagged pixels
    flagged = (
        spark.range(batch * n_px)
        .select(
            F.concat(F.lit("img-"), (F.col("id") % batch).cast("string"))
            .alias("image_id"),
            ((F.col("id") % n_px) % 7919).alias("h"),
            F.col("id"),
        )
        .select(
            "image_id",
            (1 + F.col("h") % 2500).cast("int").alias("tth_idx"),
            # qbin rides the same monotone axis: 100 bins over the 2500
            F.expr("CAST((1 + h % 2500) * 100 DIV 2501 AS INT)").alias("qbin"),
            (F.col("h") % 1000).cast("double").alias("intensity"),
            F.lit(1.0).alias("pol"),
            F.lit(1.0).alias("dist_sq"),
            (F.col("h") % 997 == 0).alias("base_mask"),
            (F.col("h") % 101 == 0).alias("is_om"),
            (F.col("h") % 211 == 0).alias("is_spot_px"),
            (F.col("h") % 307 == 0).alias("is_arc_px"),
        )
        .withColumn(
            "_v",
            F.col("intensity") / F.col("pol") * F.pow(F.col("dist_sq"), 1.5),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    print("rows:", flagged.count(), flush=True)

    kinds = {
        "base": F.col("base_mask"),
        "om": F.col("base_mask") | F.col("is_om"),
        "spotsmasked": F.col("base_mask") | F.col("is_spot_px"),
        "arcsmasked": F.col("base_mask") | F.col("is_arc_px"),
    }
    aggs = []
    for kind, mask in kinds.items():
        aggs.append(F.sum(F.when(~mask, F.col("_v"))).alias(f"sum_{kind}"))
        aggs.append(F.count(F.when(~mask, F.lit(1))).alias(f"n_{kind}"))
    aggs.append(F.count(F.lit(1)).alias("n_total"))
    aggs.append(F.sum(F.col("is_om").cast("int")).alias("n_masked"))

    def _rest(path):
        import urllib.request

        with urllib.request.urlopen(
            f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
            f"{spark.sparkContext.applicationId}/{path}",
            timeout=60,
        ) as r:
            return json.load(r)

    def _done():
        return {
            (s["stageId"], s["attemptId"]): s
            for s in _rest("stages?status=complete")
        }

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_a() -> None:
        fused = flagged.groupingSets(
            [["image_id", "tth_idx"], ["image_id", "qbin"]],
            "image_id", "tth_idx", "qbin",
        ).agg(*aggs, F.grouping_id().alias("_gid"))
        _noop(fused)

    def run_b() -> None:
        joint = (
            flagged.groupBy("image_id", "tth_idx", "qbin")
            .agg(*aggs)
            .localCheckpoint(eager=True)
        )
        sums = [F.sum(f"sum_{k}").alias(f"sum_{k}") for k in kinds] + [
            F.sum(f"n_{k}").alias(f"n_{k}") for k in kinds
        ]
        _noop(joint.groupBy("image_id", "tth_idx").agg(*sums))
        _noop(
            joint.groupBy("image_id", "qbin").agg(
                F.sum("n_total").alias("n_total"),
                F.sum("n_masked").alias("n_masked"),
            )
        )

    variants = {"A_grouping_sets": run_a, "B_joint_margins": run_b}
    # JIT warmup for both shapes before measuring
    for fn in variants.values():
        fn()
    recs = []
    for rep in range(4):
        for name, fn in variants.items():
            before = _done()
            t0 = time.perf_counter()
            fn()
            wall = time.perf_counter() - t0
            new = [s for k, s in _done().items() if k not in before]
            recs.append(
                {
                    "variant": name,
                    "rep": rep,
                    "wall_sec": round(wall, 2),
                    "run_core_sec": round(
                        sum(s.get("executorRunTime", 0) for s in new) / 1000, 1
                    ),
                    "cpu_core_sec": round(
                        sum(s.get("executorCpuTime", 0) for s in new) / 1e9, 1
                    ),
                    "n_stages": len(new),
                }
            )
            print(json.dumps(recs[-1]), flush=True)
    import statistics

    for name in variants:
        runs = [r["run_core_sec"] for r in recs if r["variant"] == name]
        cpus_ = [r["cpu_core_sec"] for r in recs if r["variant"] == name]
        walls = [r["wall_sec"] for r in recs if r["variant"] == name]
        print(
            f"{name}: run median {statistics.median(runs)} "
            f"cpu {statistics.median(cpus_)} wall {statistics.median(walls)}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
