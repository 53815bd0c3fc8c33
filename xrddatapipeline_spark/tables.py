"""Columnar table-format abstraction for the output tables (SURVEY §1.4).

The survey maps the streaming output tables (integrals / spot_stats /
spottiness / outliers / csim / calib maps) to Delta tables for the ACID
append + compaction + time-travel story; this container lacks delta-spark,
so parquet stands in. All write/read sites go through this ONE config
point so Delta drops in without touching the plans:

- format selection: explicit ``fmt=`` argument > Spark conf
  ``spark.xrdspark.tableFormat`` > env ``XRDSPARK_TABLE_FORMAT`` >
  ``"parquet"``.
- graceful fallback: requesting ``delta`` without delta-spark installed
  warns once and writes parquet (the plans are format-agnostic).

Production note (100 TB): on Delta, the streaming appends become ACID
commits (no partial-batch files on crash — today's parquet appends can
duplicate rows on a foreachBatch retry, see streaming/pipeline.py
docstring), `OPTIMIZE`/auto-compaction bounds small-file growth under
maxFilesPerTrigger=1, and MERGE on image_id gives exactly-once sinks.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, SparkSession

#: Spark conf key consulted by :func:`resolve_table_format`
TABLE_FORMAT_CONF = "spark.xrdspark.tableFormat"
#: environment fallback for processes without a session-level choice
TABLE_FORMAT_ENV = "XRDSPARK_TABLE_FORMAT"

_SUPPORTED = ("parquet", "delta")


def delta_available() -> bool:
    """True when delta-spark is importable (the container baseline lacks
    it; deployments add the package + the two session extensions)."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def resolve_table_format(
    spark: SparkSession | None = None, fmt: str | None = None
) -> str:
    """The effective table format: explicit > conf > env > parquet, with a
    warn-and-fall-back when delta is requested but not installed."""
    if fmt is None and spark is not None:
        try:
            fmt = spark.conf.get(TABLE_FORMAT_CONF, None)
        except Exception:  # pragma: no cover - conf API moved
            fmt = None
    if fmt is None:
        fmt = os.environ.get(TABLE_FORMAT_ENV) or "parquet"
    fmt = fmt.lower()
    if fmt not in _SUPPORTED:
        raise ValueError(
            f"unsupported table format {fmt!r}; expected one of {_SUPPORTED}"
        )
    if fmt == "delta" and not delta_available():
        warnings.warn(
            "table format 'delta' requested but delta-spark is not "
            "installed; falling back to parquet (append-only, no ACID)",
            RuntimeWarning,
            stacklevel=2,
        )
        return "parquet"
    return fmt


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
    fmt: str | None = None,
) -> None:
    """Write ``df`` to ``path`` in the resolved format."""
    fmt = resolve_table_format(df.sparkSession, fmt)
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Read ``path`` back in the resolved format. ``schema`` applies to
    parquet only (Delta's schema lives in its transaction log)."""
    fmt = resolve_table_format(spark, fmt)
    r = spark.read.format(fmt)
    if schema is not None and fmt == "parquet":
        r = r.schema(schema)
    return r.load(path)
