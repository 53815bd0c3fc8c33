"""Load the driver's synthetic parquet tables as temp views.

At cluster scale these reads benefit from Parquet column pruning and
predicate pushdown automatically; nothing here forces a full scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read each table and register it as a temp view of the same name."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_user_profile(spark, path: str):
    """S11 (mainUI/user_data_import.py:37-39): external two-column
    whitespace-separated profile (e.g. CrystalMaker export) -> (x, y)."""
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        raw.where(F.trim("value") != "")
        .where(~F.col("value").startswith("#"))
        .select(
            parts.getItem(0).cast("double").alias("x"),
            parts.getItem(1).cast("double").alias("y"),
        )
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
