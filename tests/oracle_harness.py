"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, sorts columns by name and rows by value, and compares with
a small numeric tolerance (the driver hashes quantized values; exact sums
of integral doubles match bit-for-bit, open-ended double sums match to
~1e-9 relative).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
        elif "decimal" in str(df[c].dtype).lower():
            df[c] = df[c].astype(float)
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str), ignore_index=True)
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rtol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty == match).

    Exact by default (rtol=0): the driver hashes values, so a last-ulp float
    difference or an int64-vs-float64 dtype skew is a real failure there.
    Queries are expected to produce order-independent exact outputs (integer
    aggregates, exact medians, quantized dot products — see similarity.py).
    """
    errs: list[str] = []
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"column mismatch: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count mismatch: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if (av.dtype.kind in "fc") != (bv.dtype.kind in "fc"):
            # int-vs-float dtype skew (e.g. DuckDB HUGEINT -> float64 while
            # Spark emits int64) changes the driver's value hash even when
            # the numbers agree — flag it as a schema-level mismatch.
            errs.append(
                f"col {c}: dtype kind mismatch spark={av.dtype} oracle={bv.dtype}"
            )
            continue
        if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
            for i, (x, y) in enumerate(zip(av.astype(float), bv.astype(float))):
                if pd.isna(x) and pd.isna(y):
                    continue
                if pd.isna(x) != pd.isna(y) or not math.isclose(
                    x, y, rel_tol=rtol, abs_tol=1e-9
                ):
                    errs.append(f"col {c} row {i}: spark={x!r} oracle={y!r}")
                    if len(errs) > 5:
                        return errs
        else:
            neq = av.astype(str).values != bv.astype(str).values
            if neq.any():
                i = int(neq.argmax())
                errs.append(f"col {c} row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}")
    return errs
