"""Relational operators (SURVEY.md §2.2 P4-P7, §2.3 J1, §2.5 O1-O2).

Each helper is a pure DataFrame -> DataFrame function, composable with
``df.transform``. They are deliberately thin: the value is the
documented mapping from the reference's pandas semantics to the
Catalyst-optimizable Spark form, plus the scale annotations (broadcast,
top-k fusion) that matter at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def filter_eq(df: DataFrame, column: str, value) -> DataFrame:
    """Equality filter (P4) — reference ``etl_script.py:99``.

    Declared as a Column predicate so Catalyst pushes it below joins and
    into the parquet scan (PushedFilters); the reference had to order
    this by hand before its merge.
    """
    return df.filter(F.col(column) == value)


def project(df: DataFrame, columns: list[str]) -> DataFrame:
    """Column projection (P5) — reference ``etl_script.py:105``.

    Catalyst's ColumnPruning carries this into the scan: a parquet read
    under this projection materializes only these columns.
    """
    return df.select(*columns)


def drop_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Drop columns (P6) — reference ``etl_script.py:112``.

    Kept for its *semantic* effect (which join side supplies
    ``state``/``facility_name``); the performance effect is automatic.
    """
    return df.drop(*columns)


def broadcast_inner_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Inner equi-join with a broadcast right side (J1) — reference
    ``etl_script.py:119`` (``pd.merge(..., on='facility_id',
    how='inner')``).

    The dimension side (hospital_info, ~5k rows in the reference) is
    broadcast so the 100 TB fact side never shuffles for this join.
    Duplicate-key semantics match ``pd.merge``: matching keys produce the
    cross-product of matches. Using the ``on=<name>`` form dedupes the
    key column exactly like pandas' single ``facility_id`` output column.
    """
    return left.join(F.broadcast(right), on=on, how="inner")


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k (O1+O2) — reference ``app.py:95-101`` (sort + head).

    ``orderBy(...).limit(k)`` fuses into ``TakeOrderedAndProject``:
    each partition keeps a k-row heap and only k rows per partition reach
    the driver — never a full global sort, no matter the table size.
    Callers should include a unique tiebreak column for determinism.
    """
    return df.orderBy(*order_by).limit(k)


def top_n_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-N per group — the window-function generalization of O1+O2
    (SURVEY.md §2.8): one shuffle on the group key, then a per-partition
    sort; no global sort.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
        .drop(rank_col)
    )
