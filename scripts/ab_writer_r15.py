#!/usr/bin/env python
"""Round-15 A/B: spark.shuffle.sort.bypassMergeThreshold=1 (serialized-sort
writer, the r14 default) vs Spark's default threshold 200 (bypass writer at
local partition counts) — the one r14 change the driver could not verify
(r14 verdict #2). Alternating FRESH sessions (the conf is session-fixed),
each measuring the same headline-query subset min-of-2 plus the r14 trivial
repartition+agg shuffle probe.

Usage: python scripts/ab_writer_r15.py [pairs=3]
  (child mode, internal: ab_writer_r15.py --child <variant>)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "tpch_q1_pricing", "tpch_q5ish_regional_volume", "dedup_simhash",
    "dedup_exact_hash", "events_rollup_grouping", "text_tfidf_top_terms",
    "a2_ring_median_mad", "w5_circular_gap_scan",
]


def child(variant: str) -> None:
    os.environ["XRDSPARK_SHUFFLE_WRITER"] = (
        "legacy" if variant == "legacy" else "sort"
    )
    from xrddatapipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name=f"xrdspark-ab-writer-{variant}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.codegen.hugeMethodLimit": "3000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert (
        spark.conf.get("spark.shuffle.sort.bypassMergeThreshold")
        == ("200" if variant == "legacy" else "1")
    )
    from pyspark.sql import functions as F

    from xrddatapipeline_spark.plans.driver_queries import REGISTRY

    # the r14 trivial shuffle probe: repartition+agg at `cpus` partitions
    def probe() -> float:
        t0 = time.perf_counter()
        (
            spark.range(2_000_000)
            .repartition(cpus, "id")
            .groupBy((F.col("id") % 97).alias("k"))
            .agg(F.sum("id"))
            .write.format("noop").mode("overwrite").save()
        )
        return time.perf_counter() - t0

    REGISTRY[QUERIES[0]].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()  # session warmup
    probe()
    out = {"variant": variant, "probe_sec": round(min(probe(), probe()), 3)}
    timings = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    out["queries"] = timings
    out["total"] = round(sum(timings.values()), 3)
    print("ABWRITER " + json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    recs = []
    for p in range(pairs):
        order = ("sort", "legacy") if p % 2 == 0 else ("legacy", "sort")
        for variant in order:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 variant],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [
                ln for ln in r.stdout.splitlines()
                if ln.startswith("ABWRITER ")
            ]
            if not line:
                print(f"child {variant} failed:\n{r.stdout[-2000:]}\n"
                      f"{r.stderr[-2000:]}", file=sys.stderr)
                continue
            rec = json.loads(line[0][len("ABWRITER "):])
            recs.append(rec)
            print(f"pair{p} {variant}: total={rec['total']} "
                  f"probe={rec['probe_sec']}", flush=True)
    for v in ("sort", "legacy"):
        ts = [r["total"] for r in recs if r["variant"] == v]
        ps = [r["probe_sec"] for r in recs if r["variant"] == v]
        if ts:
            print(f"{v}: totals={ts} probes={ps}")


if __name__ == "__main__":
    main()
