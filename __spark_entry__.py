"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the oracle-checked registry
(xrddatapipeline_spark.plans.driver_queries) — one entry per implemented
operator family from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xrddatapipeline_spark.plans.driver_queries import REGISTRY, ordered_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on /root/testdata/sf0.001."""
    return REGISTRY["tpch_q1_pricing"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ordered_registry() fronts the queries that still lack a driver
    # CORRECTNESS row (the driver hash-checks the first 50 per round).
    return {name: q.spark for name, q in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in ordered_registry().items()
        if q.oracle is not None
    }
