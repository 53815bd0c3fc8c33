"""Run the FULL query registry against the DuckDB oracle, driver-style.

Mirrors the per-round CORRECTNESS check: for every registry entry with an
oracle, run the Spark plan and the oracle SQL at the given SF and compare
exactly (dtype-strict, rtol=0 via tests/oracle_harness.compare_frames).

Usage: python scripts/check_registry.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from oracle_harness import compare_frames, run_oracle  # noqa: E402

from xrddatapipeline_spark.plans.driver_queries import REGISTRY  # noqa: E402
from xrddatapipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    spark = get_spark()
    failures: list[str] = []
    n_run = 0
    for name, qd in REGISTRY.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        if qd.oracle is None:
            print(f"SKIP  {name} (no oracle)")
            continue
        n_run += 1
        t0 = time.time()
        try:
            spark_pdf = qd.spark(spark, sf_dir).toPandas()
            oracle_pdf = run_oracle(qd.oracle, sf_dir)
            errs = compare_frames(spark_pdf, oracle_pdf)
        except Exception as e:  # noqa: BLE001
            errs = [f"EXCEPTION: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        if errs:
            failures.append(name)
            print(f"FAIL  {name} ({dt:.1f}s)")
            for e in errs[:4]:
                print(f"      {e}")
        else:
            print(f"ok    {name} ({dt:.1f}s)")
    print(f"\n{n_run - len(failures)}/{n_run} pass; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
