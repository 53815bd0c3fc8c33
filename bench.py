#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {"q": sec, ...}, "sf": ...}

Queries are materialized via the noop sink (no driver-side collect of large
results; executors do all the work, as they would on a cluster).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from xrddatapipeline_spark.session import get_spark
from xrddatapipeline_spark.plans.driver_queries import REGISTRY

HEADLINE = [
    "tpch_q1_pricing",
    "tpch_q5ish_regional_volume",
    "a1_integrate_binned_mean",
    "a2_ring_median_mad",
    "a9_shape_classifier",
    "a11_central_band_percentile",
    "w1_lag_first_pairing",
    "w5_circular_gap_scan",
    # training-corpus layer
    "dedup_exact_hash",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_lsh_bucketed",
    "text_fingerprint_winnow",
    "mm_decode_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        app_name="xrdspark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in REGISTRY]
    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    REGISTRY[names[0]].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
