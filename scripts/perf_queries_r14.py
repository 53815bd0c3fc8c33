#!/usr/bin/env python
"""Round-14 per-query profiler: for each headline query, run it with the
noop sink (bench methodology) and attribute its cost — wall (min of reps),
executor run/cpu core-seconds, shuffle bytes/records, task and stage
counts, exchange count from the executed plan — via the UI REST API.

Output: /tmp/perf_r14_<tag>.json. Does NOT touch the published bench line.

Usage: python scripts/perf_queries_r14.py [tag] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrddatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "base"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    spark = get_spark(
        app_name="xrdspark-perf-r14",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.codegen.hugeMethodLimit": "3000",
            "spark.ui.enabled": "true",
            "spark.ui.retainedJobs": "10000",
            "spark.ui.retainedStages": "10000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import HEADLINE  # noqa: E402
    from xrddatapipeline_spark.plans.driver_queries import REGISTRY  # noqa: E402

    names = [n for n in HEADLINE if n in REGISTRY]
    if only:
        names = [n for n in names if n in only]

    def _rest(path: str):
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/{path}", timeout=60
        ) as r:
            return json.load(r)

    def _stages_done() -> set:
        return {(s["stageId"], s["attemptId"])
                for s in _rest("stages?status=complete")}

    # warm once (parquet footers, session JIT baseline)
    REGISTRY[names[0]].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in names:
        walls = []
        per_rep = []
        for rep in range(reps):
            before = _stages_done()
            t0 = time.perf_counter()
            df = REGISTRY[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            walls.append(wall)
            # let the async listener drain
            time.sleep(0.3)
            stages = [
                s for s in _rest("stages?status=complete")
                if (s["stageId"], s["attemptId"]) not in before
            ]
            stages.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
            per_rep.append({
                "wall": round(wall, 3),
                "n_stages": len(stages),
                "n_tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
                "run_sec": round(sum(
                    s.get("executorRunTime", 0) for s in stages) / 1000, 2),
                "cpu_sec": round(sum(
                    s.get("executorCpuTime", 0) for s in stages) / 1e9, 2),
                "shuffle_write_mb": round(sum(
                    s.get("shuffleWriteBytes", 0) for s in stages) / 2**20, 2),
                "shuffle_write_recs": sum(
                    s.get("shuffleWriteRecords", 0) for s in stages),
                "top": [
                    [s["name"].splitlines()[0][:60],
                     round(s.get("executorRunTime", 0) / 1000, 2),
                     round(s.get("executorCpuTime", 0) / 1e9, 2),
                     s.get("numCompleteTasks", 0)]
                    for s in stages[:6]
                ],
            })
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = sum(1 for ln in plan.splitlines()
                   if "Exchange" in ln and "BroadcastExchange" not in ln)
        out[name] = {
            "wall_min": round(min(walls), 3),
            "walls": [round(w, 3) for w in walls],
            "exchanges_initial": n_ex,
            "reps": per_rep,
        }
        print(f"{name}: wall_min={min(walls):.3f} "
              f"run={per_rep[-1]['run_sec']} cpu={per_rep[-1]['cpu_sec']} "
              f"stages={per_rep[-1]['n_stages']} "
              f"tasks={per_rep[-1]['n_tasks']} "
              f"shW={per_rep[-1]['shuffle_write_mb']}MB", flush=True)

    path = f"/tmp/perf_r14_{tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
