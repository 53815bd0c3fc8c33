#!/usr/bin/env python
"""Round-10 pilot probe (VERDICT r9 task 4): what does the 30-39 s pilot
spend, and do fewer rows trim it without reopening the warm[0] JIT spike?

Runs ONE keep-up session (pilot + cold + 1 warm + 0 hoff) at the given
SPARK_GRAFT_PILOT_ROWS and prints the keep-up block + the pilot's stage
profile. Run in a FRESH process per variant (JIT state is per-JVM)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_KEEPUP_WARM_REPS"] = "1"
os.environ["SPARK_GRAFT_KEEPUP_HOFF_REPS"] = "0"

import bench  # noqa: E402

out = bench._keepup_2880()
prof = {}
try:
    with open(os.path.join(os.path.dirname(bench.__file__),
                           "BENCH_PROFILES.json")) as f:
        prof = json.load(f)
except OSError:
    pass
print("PROBE " + json.dumps({
    "pilot_rows": os.environ.get("SPARK_GRAFT_PILOT_ROWS", "512"),
    "pilot_sec": out.get("pilot_sec"),
    "px_build_sec": out.get("px_build_sec"),
    "cold_batch_sec": out.get("cold_batch_sec"),
    "warm0_sec": out.get("warm_batches_sec", [None])[0],
    "pilot_profile": prof.get("pilot"),
}), flush=True)
