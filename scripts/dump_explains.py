#!/usr/bin/env python
"""Regenerate EXPLAIN.md: formatted physical plans + the scale evidence
(pushed filters, pruned read schemas, broadcast joins, codegen spans,
exchange counts) for a representative slice of the registry.

Run from the repo root: python scripts/dump_explains.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    # name -> what the plan should prove
    ("tpch_q6ish_forecast_revenue",
     "every predicate reaches the parquet scan (PushedFilters), ReadSchema "
     "is pruned to the 4 referenced columns, no exchange before the "
     "single-row agg"),
    ("tpch_q1_pricing",
     "single hash-agg shuffle, map-side partial aggregation, "
     "whole-stage codegen over the scan+project+partial-agg pipeline"),
    ("tpch_q14_promo_share",
     "dimension side broadcast (BroadcastHashJoin) — the fact table is "
     "never shuffled for the join; one exchange total (final agg)"),
    ("a2_ring_median_mad",
     "per-ring exact order statistics in ONE keyed exchange"),
    ("dedup_exact_hash",
     "hash-groupBy dedup: one exchange on the content hash, partial_min "
     "map-side combine"),
    ("dedup_minhash_bands",
     "shingle explosion is consumed map-side; shuffle carries signatures, "
     "not shingles"),
    ("ann_lsh_bucketed",
     "bucket assignment is a shuffle-free projection; WindowGroupLimit "
     "prunes per-partition before the rank exchange"),
    ("w6_sessionize_events",
     "both windows and the session aggregation ride one user_id exchange"),
    ("events_rollup_grouping",
     "Expand (grouping sets) feeds ONE exchange for all rollup levels"),
    ("docs_length_deciles",
     "global rank without a global window: the ranked frame is "
     "range-partitioned + localCheckpointed ONCE (the parquet is scanned "
     "once; pre-fix Catalyst re-derived it per consumer = 3 scans / 9 "
     "exchanges), then pid-partitioned row_number + broadcast offsets"),
    ("text_contamination_check",
     "decontamination at corpus scale: the eval-set shingle hashes are a "
     "BroadcastExchange; the training side is shingled map-side and "
     "never shuffled before the per-doc agg"),
    ("emb_pq_encode",
     "PQ encoding is ONE shuffle-free map-side projection: codebooks are "
     "driver-side literals; the single exchange is _t()'s round-robin "
     "fan-out of the single-file test parquet (absent at production "
     "scale), not part of the operator"),
    ("docs_chunk_tokens",
     "overlap chunking is pure per-row array math behind a Generate "
     "boundary: no operator exchanges (the one shown is _t()'s "
     "single-file test-data fan-out)"),
    ("emb_kmeans_update",
     "nearest-centroid assignment is a literal-matrix map-side projection "
     "(no exchange); only (cell, dim) partial sums shuffle"),
    ("j9_range_join_error_burst",
     "banded range join: equi-join on (user, band) buckets, the "
     "inequality is a post-join filter — candidates are output-"
     "proportional, never |left|x|right|"),
    ("tpch_q4ish_exists_semijoin",
     "correlated EXISTS decorrelated to a LeftSemi hash join; the "
     "l_quantity predicate is pushed to the lineitem scan below the "
     "join and the probe side carries only the join key"),
    ("docs_mixture_token_budget",
     "mixture sampling: per-source token totals are a tiny "
     "map-side-combined agg, the rates come back as a BroadcastExchange, "
     "and the corpus side is a pure filter — scanned, never shuffled"),
    ("tpch_q16ish_supplier_cnt",
     "NOT IN compiled to BroadcastHashJoin LeftAnti (the excluded-supplier "
     "set broadcast), part dimension broadcast, count(DISTINCT) as a "
     "two-level hash aggregate — the fact side shuffles once"),
    ("tpch_q18ish_big_orders",
     "HAVING-sum driver joined WITHOUT a forced hint: the planner/AQE "
     "broadcasts whichever side size stats say is small (orders at test "
     "SF; the post-HAVING aggregate at scale); global top-100 via "
     "TakeOrderedAndProject, no full sort"),
    ("f4_geometric_mask_counts",
     "every geometric mask kind (spot/ring/arc/polygon/frame/threshold/"
     "lines) as pure Catalyst predicates: one pruned 6-column scan, one "
     "exchange (the groupBy), zero Python — the crossing-number polygon "
     "test is an F.aggregate fold over a literal edge array"),
    ("w3_contour_stride_view",
     "the contour read-back view (readback.contour_matrix end-to-end): "
     "the kept-line selection ranks one row per IMAGE (distinct "
     "image_id/seq — bounded by the contour's line budget, never "
     "pixels), the kept set returns as a BroadcastHashJoin onto the "
     "line table, and the per-image ordered intensity array is one "
     "keyed exchange"),
    ("w5_circular_gap_scan",
     "the reference-exact wraparound gap-scan "
     "(wrapped_extent_gap_scan): ONE (image, label) exchange serves "
     "both the sorted-lag window and the extent aggregation — the "
     "first-qualifying-gap argmin is a min(struct) inside the same "
     "agg, no second shuffle, no join back"),
    ("image_plan_spine",
     "the composed §2.9 spine (label -> classify -> masked integrate) "
     "as one query: the CC kernel is a FlatMapGroupsInPandas per "
     "image, the classifier verdict joins back to pixels on "
     "(image, label), the flag table left-joins the dense grid once, "
     "and all four mask variants resolve in ONE conditional-sum hash "
     "aggregation (no per-kind re-scan); the SinglePartition "
     "exchanges belong to the row_number FIXTURE constructor, not "
     "the operators"),
]

#: separates generated plan dumps from hand-written analysis below it
HAND_MARKER = "<!-- HAND-WRITTEN BELOW: preserved by dump_explains.py -->"

INTERESTING = re.compile(
    r"PushedFilters: \[[^\]]*[A-Za-z][^\]]*\]|ReadSchema|BroadcastHashJoin"
    r"|BroadcastExchange|Exchange (hash|range|Single)|WindowGroupLimit"
    r"|WholeStageCodegen|Expand|SortMergeJoin|partial_"
)


def main() -> None:
    from xrddatapipeline_spark.session import get_spark
    from xrddatapipeline_spark.plans import corpus_queries  # noqa: F401
    from xrddatapipeline_spark.plans.driver_queries import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="xrdspark-explain", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# EXPLAIN — physical-plan evidence for the scale claims",
        "",
        f"Generated by `scripts/dump_explains.py` at `{sf_dir}` "
        "(plan SHAPE is SF-independent; AQE may further coalesce at "
        "runtime). For each showcased operator: the claim its docstring "
        "makes, then the plan lines that prove it (full `.explain"
        "('formatted')` output elided to the load-bearing operators).",
        "",
    ]
    for name, claim in SHOWCASE:
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = [
            ln.rstrip() for ln in plan.splitlines()
            if INTERESTING.search(ln)
        ]
        n_ex = sum(1 for ln in plan.splitlines()
                   if "Exchange" in ln and "BroadcastExchange" not in ln)
        out += [
            f"## {name}",
            "",
            f"**Claim:** {claim}",
            "",
            f"**Data exchanges (non-broadcast): {n_ex}**",
            "",
            "```",
            *(lines or ["(no matching operators — pure projection/filter)"]),
            "```",
            "",
        ]
    # Everything after the marker is HAND-WRITTEN analysis (kernel-feed
    # plan walkthroughs, stage economics) — preserve it across regens
    # (round 10: a regen without this silently dropped four sections).
    tail = ""
    try:
        with open("EXPLAIN.md") as f:
            old = f.read()
        if HAND_MARKER in old:
            tail = old[old.index(HAND_MARKER):]
    except OSError:
        pass
    if not tail:
        tail = HAND_MARKER + "\n"
    with open("EXPLAIN.md", "w") as f:
        f.write("\n".join(out) + tail)
    print(f"wrote EXPLAIN.md ({len(SHOWCASE)} plans, hand tail "
          f"{len(tail.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
