"""Local replica of the driver's oracle comparison.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB (fixture parquet pre-registered as
views), then compares row count + schema + order-insensitive value hash.
This harness reproduces that so mismatches surface in pytest before the
driver sees them — stricter, in fact: it diffs actual cell values.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

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


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all values (stringified)."""
    df = df[sorted(df.columns)].copy()
    if len(df):
        key = df.astype(str).agg("\x1f".join, axis=1)
        df = df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def _cell_equal(a, b, float_tol: float) -> bool:
    a_null = a is None or (isinstance(a, float) and math.isnan(a))
    b_null = b is None or (isinstance(b, float) and math.isnan(b))
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb or abs(fa - fb) <= float_tol * max(1.0, abs(fa), abs(fb))
    return a == b


def compare_frames(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    *,
    float_tol: float = 0.0,
    max_report: int = 5,
) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match).

    ``float_tol=0.0`` is the default because the driver hashes values:
    queries must produce bit-identical floats (via rounding on both
    sides). Tests may loosen for approximate operators.
    """
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"schema: spark={s_cols} oracle={o_cols}")
    if problems:
        return problems

    s = canonicalize(spark_pdf)
    o = canonicalize(oracle_pdf)
    n_bad = 0
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _cell_equal(a, b, float_tol):
                n_bad += 1
                if len(problems) < max_report:
                    problems.append(f"value [{col}][row {i}]: spark={a!r} oracle={b!r}")
    if n_bad > len(problems):
        problems.append(f"... {n_bad} mismatched cells total")
    return problems


def run_compare(spark, name: str, sf_dir: str, *, float_tol: float = 0.0) -> list[str]:
    """Run registry query ``name`` on Spark and DuckDB; return mismatches."""
    from healthcare_etl_spark.plans.registry import get_registry

    q = get_registry()[name]
    assert q.oracle is not None, f"{name} has no oracle"
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.sql(q.oracle).df()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf, float_tol=float_tol)
