"""Data-quality operators: profiling and expectation gates.

The reference's only quality control was eyeballing row-count logs
(``etl_script.py:100,120``). These are the production equivalents: a
single-pass column profile and a declarative expectations gate, both
pure aggregate plans (one job each, any table size).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile in one aggregate pass.

    Returns long-form rows (column, n_nulls, n_distinct, min_str,
    max_str) — everything stringly-typed so heterogeneous columns share
    one output schema. n_distinct is exact here; swap in
    ``approx_count_distinct`` at 100 TB.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) AS (column, n_nulls, n_distinct, min_str, max_str)"
    )


@dataclass
class Expectation:
    name: str
    predicate: Column  # row-level predicate that must hold


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations in one pass.

    Returns (expectation, n_rows, n_violations, pass) — callers decide
    whether to raise, quarantine, or log. Never collects the data.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for e in expectations:
        aggs.append(F.sum(F.when(~e.predicate, 1).otherwise(0)).alias(f"__v_{e.name}"))
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{e.name}', `__v_{e.name}`" for e in expectations)
    long = wide.selectExpr(
        "__n", f"stack({len(expectations)}, {stack_expr}) AS (expectation, n_violations)"
    )
    return long.select(
        "expectation",
        F.col("__n").alias("n_rows"),
        "n_violations",
        (F.col("n_violations") == 0).alias("pass"),
    )


def expect_or_raise(df: DataFrame, expectations: list[Expectation]) -> None:
    """Gate: raise ``ValueError`` listing failed expectations, if any."""
    failed = [r for r in check_expectations(df, expectations).collect() if not r["pass"]]
    if failed:
        detail = ", ".join(f"{r['expectation']} ({r['n_violations']} rows)" for r in failed)
        raise ValueError(f"expectations failed: {detail}")
