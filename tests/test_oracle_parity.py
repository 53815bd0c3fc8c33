"""Every registry query must match its DuckDB oracle on sf0.001."""

from __future__ import annotations

import pytest

from xrddatapipeline_spark.plans.driver_queries import REGISTRY
from tests.oracle_harness import compare_frames, run_oracle

ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    spark_pdf = q.spark(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    errs = compare_frames(spark_pdf, oracle_pdf)
    assert not errs, f"{name}: {errs}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.spark(spark, sf_dir)
    assert df.count() >= 0


def test_f4_mask_anchor_exercises_every_kind(spark, sf_dir):
    """The F4 driver anchor must keep discriminating power: every mask
    kind's count is nonzero and none masks everything — a testdata drift
    that degenerates a predicate to constant true/false would otherwise
    still pass parity (both sides constant)."""
    pdf = (
        REGISTRY["f4_geometric_mask_counts"]
        .spark(spark, sf_dir)
        .toPandas()
        .sum(numeric_only=True)
    )
    for kind in ("n_spot", "n_ring", "n_arc", "n_poly", "n_frame",
                 "n_thresh", "n_line"):
        assert 0 < pdf[kind] < pdf["n_pts"], f"{kind}={pdf[kind]}"
    assert 0 < pdf["n_masked"] < pdf["n_pts"]


def test_ordered_registry_window_is_sound():
    """r04 regression: a promised-but-unregistered window name must fail
    loudly, not silently shrink the driver's hash-checked window."""
    from xrddatapipeline_spark.plans import driver_queries as dq

    reg = dq.ordered_registry()
    window = list(reg)[:50]
    assert len(set(window)) == 50
    # every explicitly-listed name resolved (none silently dropped)
    assert [n for n in dq._DRIVER_WINDOW_FIRST if n not in reg] == []

    orig = dq._DRIVER_WINDOW_FIRST
    try:
        dq._DRIVER_WINDOW_FIRST = orig + ("query_that_does_not_exist",)
        with pytest.raises(KeyError, match="query_that_does_not_exist"):
            dq.ordered_registry()
        dq._DRIVER_WINDOW_FIRST = orig + (orig[0],)
        with pytest.raises(KeyError, match="duplicate"):
            dq.ordered_registry()
    finally:
        dq._DRIVER_WINDOW_FIRST = orig


def test_driver_window_rotation_staleness_bound():
    """The rotation schedule is enforced, not promised (round-4 ADVICE):
    every registry query must have a driver CORRECTNESS row within the
    last 2 rounds, i.e. REGISTRY ⊆ current_window ∪ _PREVIOUS_WINDOW.
    When rotating the window next round, update _PREVIOUS_WINDOW to this
    round's CORRECTNESS keys — forgetting to rotate (or rotating so a
    query falls out of both) fails here before the driver ever runs."""
    from xrddatapipeline_spark.plans import driver_queries as dq

    current = set(list(dq.ordered_registry())[: dq.DRIVER_WINDOW_SIZE])
    covered = current | dq._PREVIOUS_WINDOW
    stale = sorted(set(dq.REGISTRY) - covered)
    assert not stale, (
        f"queries with no driver row in the last 2 rounds: {stale} — "
        "rotate them into _DRIVER_WINDOW_FIRST"
    )
    # _PREVIOUS_WINDOW must itself be real query names (catch typos when
    # it is rotated each round)
    ghost = sorted(dq._PREVIOUS_WINDOW - set(dq.REGISTRY))
    assert not ghost, f"_PREVIOUS_WINDOW names not in REGISTRY: {ghost}"
