"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``healthcare_etl_spark.plans.registry`` — the single
source of truth where every implemented operator from SURVEY.md §2
registers its Spark program and (where SQL-expressible) its DuckDB
oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from healthcare_etl_spark.plans.registry import get_oracle_sql, get_queries  # noqa: E402
from healthcare_etl_spark.session import configure_session  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the full reference ETL chain
    (normalize -> coerce -> dropna -> filter -> project -> drop ->
    broadcast inner join), SURVEY.md §2.10 ``q_etl_replica``.
    """
    configure_session(spark)
    return get_queries()["q_etl_replica"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = get_queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL-expressible
    ops -> driver records the weaker rows-only check)."""
    return get_oracle_sql()
