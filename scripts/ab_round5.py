"""Round-5 same-session A/Bs (host weather immunity per STATUS method):

1. Gradient-stage sentinel union on/off at the flagship 8 x 2880^2 config
   (the round-4 fully-masked-band fix added a distinct+explode+union onto
   the kernel feed; VERDICT asked its cost to be shown < 5% or gated).
2. text_tfidf_top_terms: current AQE-decided df join vs the round-1
   broadcast-hinted join (the 1.04 -> 1.45 s step landed exactly when the
   hint was dropped in 9a5c1c6).

3. h-maxima stage (A19, newly wired into run_image_plan this round) on/off
   at the same flagship config (VERDICT asked sec_per_image with h-maxima
   to sit inside the same-session variance of the run without it).

Alternating-run design inside ONE session: [cold discard] A B A B ...;
report per-run times and the A/B means over warm runs only.

Usage: python scripts/ab_round5.py [sentinel|tfidf|hmaxima|both|all]
NEVER run concurrently with pytest/bench (taints the profile).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrddatapipeline_spark.session import get_spark  # noqa: E402


def _ab_image_plan(
    name: str,
    arm_a: tuple[dict, dict],
    arm_b: tuple[dict, dict],
    batch: int = 8,
    rounds: int = 2,
) -> None:
    """Alternating A/B of the flagship 8 x 2880^2 batch inside ONE session.

    Each arm is (env_overrides, run_image_plan_kwargs). Cold run (arm A)
    is discarded — both arms' plan shapes share most generated classes, so
    residual JIT skew favors the arm run second, i.e. against A."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import StorageLevel

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from perf_image_plan import controls_for

    import bench
    from xrddatapipeline_spark.plans.image_pipeline import (
        cosine_similarity_series,
        run_image_plan,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name=f"ab-{name}", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    c = controls_for(2880, 2500, 1000, 959.0)
    pixels = bench._synthetic_pixels(spark, c, n_images=batch).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pixels.count()

    def one_batch(env: dict, kwargs: dict) -> float:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            t0 = time.perf_counter()
            res = run_image_plan(
                pixels, None, c, gradient_stage=True, barrier="hybrid",
                n_images=batch, **kwargs,
            )
            outs = [res.integrals, res.spot_stats, res.spottiness,
                    res.outliers, cosine_similarity_series(res.pixels)]
            if res.h_maxima is not None:
                outs.append(res.h_maxima)
            if res.gradient is not None:
                outs.append(res.gradient.on_arc_labels)
            with ThreadPoolExecutor(max_workers=len(outs)) as pool:
                for f in [
                    pool.submit(
                        lambda o: o.write.format("noop")
                        .mode("overwrite").save(),
                        o2,
                    )
                    for o2 in outs
                ]:
                    f.result()
            el = time.perf_counter() - t0
            res.unpersist_all()
            return el
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    cold = one_batch(*arm_a)
    print(f"AB {name} cold(discard) {cold:.1f}s", flush=True)
    a_times, b_times = [], []
    for _ in range(rounds):
        t = one_batch(*arm_a)
        a_times.append(t)
        print(f"AB {name} A {t:.1f}s", flush=True)
        t = one_batch(*arm_b)
        b_times.append(t)
        print(f"AB {name} B {t:.1f}s", flush=True)
    ma = sum(a_times) / len(a_times)
    mb = sum(b_times) / len(b_times)
    print(
        f"AB {name} RESULT A={ma:.1f}s B={mb:.1f}s "
        f"delta={(ma - mb):.1f}s ({100 * (ma - mb) / mb:+.1f}% A vs B)",
        flush=True,
    )
    pixels.unpersist()
    spark.stop()


def ab_sentinel(batch: int = 8, rounds: int = 2) -> None:
    # A = sentinel union on (production), B = off
    _ab_image_plan(
        "sentinel",
        ({"XRDSPARK_GRAD_SENTINEL": "1"}, {}),
        ({"XRDSPARK_GRAD_SENTINEL": "0"}, {}),
        batch=batch, rounds=rounds,
    )


def ab_hmaxima(batch: int = 8, rounds: int = 2) -> None:
    # A = h-maxima stage wired in (round-5 parity keep-up), B = without
    _ab_image_plan(
        "hmaxima",
        ({}, {"h_maxima": True}),
        ({}, {"h_maxima": False}),
        batch=batch, rounds=rounds,
    )


def ab_tfidf(rounds: int = 4) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from xrddatapipeline_spark.plans.driver_queries import REGISTRY, _t

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="ab-tfidf", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.codegen.hugeMethodLimit": "3000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def current() -> None:
        REGISTRY["text_tfidf_top_terms"].spark(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()

    def r1_broadcast() -> None:
        docs = _t(spark, sf_dir, "documents")
        tok = docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        tf = tok.groupBy("doc_id", "term").agg(
            F.count("*").cast("long").alias("tf")
        )
        dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
        n = docs.agg(F.count("*").cast("long").alias("n"))
        scored = (
            tf.join(F.broadcast(dfreq), "term")
            .crossJoin(F.broadcast(n))
            .withColumn("score", F.expr("tf * ((1000000 * n) div df)"))
        )
        w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
        (
            scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= 3)
            .select("doc_id", "term", "tf", "df", "score", "rnk")
            .write.format("noop").mode("overwrite").save()
        )

    # cold both variants once (JIT), then alternate
    current(); r1_broadcast()
    cur_t, r1_t = [], []
    for _ in range(rounds):
        t0 = time.perf_counter(); current(); cur_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); r1_broadcast(); r1_t.append(time.perf_counter() - t0)
    print("AB tfidf current  :", " ".join(f"{t:.2f}" for t in cur_t), flush=True)
    print("AB tfidf broadcast:", " ".join(f"{t:.2f}" for t in r1_t), flush=True)
    mc, mb = sum(cur_t) / len(cur_t), sum(r1_t) / len(r1_t)
    print(
        f"AB tfidf RESULT current={mc:.2f}s broadcast={mb:.2f}s "
        f"delta={(mc - mb):.2f}s ({100 * (mc - mb) / mb:+.1f}% vs broadcast)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("tfidf", "both", "all"):
        ab_tfidf()
    if which in ("sentinel", "both", "all"):
        ab_sentinel()
    if which in ("hmaxima", "all"):
        ab_hmaxima()
