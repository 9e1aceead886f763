"""Schema normalization (SURVEY.md §2.2 P1).

The reference cleans column names with
``df.columns.str.strip().str.lower().str.replace(' ', '_').str.replace('/', '_')``
(reference ``etl_app/etl_script.py:74-75``). Column names are plan-time
metadata, so this is pure Python at plan-build time — zero runtime cost,
no shuffle, no codegen impact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def normalize_column_name(name: str) -> str:
    """strip -> lower -> ' '->'_' -> '/'->'_' (etl_script.py:74)."""
    return name.strip().lower().replace(" ", "_").replace("/", "_")


def normalize_columns(df: DataFrame) -> DataFrame:
    """Rename every column through the reference's convention.

    ``toDF`` is a projection-only rename: Catalyst collapses it into the
    scan, so the parquet reader still prunes to exactly the columns a
    downstream query touches.
    """
    return df.toDF(*[normalize_column_name(c) for c in df.columns])
