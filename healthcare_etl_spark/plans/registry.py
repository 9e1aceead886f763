"""Query registry — single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 (and every extension
operator) registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``;
- where SQL-expressible, the equivalent ANSI SQL for the DuckDB oracle
  (the fixture tables are pre-registered views on the driver side).

Column names are aliased identically on both sides: the driver's compare
sorts columns by name before hashing values. Computed floating-point
columns are rounded on both sides because double summation order differs
between engines (last-ulp drift would break the value hash).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator registering a query program under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, description=description, tags=tags)
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every query module so its @register calls run."""
    import healthcare_etl_spark.plans.healthcare  # noqa: F401
    import healthcare_etl_spark.plans.queries_core  # noqa: F401
    import healthcare_etl_spark.plans.queries_agg  # noqa: F401
    import healthcare_etl_spark.plans.queries_tpch  # noqa: F401
    import healthcare_etl_spark.plans.queries_tpch_deep  # noqa: F401
    import healthcare_etl_spark.plans.queries_pipeline_ops  # noqa: F401
    import healthcare_etl_spark.plans.queries_events  # noqa: F401
    import healthcare_etl_spark.plans.queries_text  # noqa: F401
    import healthcare_etl_spark.plans.queries_corpus  # noqa: F401
    import healthcare_etl_spark.plans.queries_subqueries  # noqa: F401
    import healthcare_etl_spark.plans.queries_dedup  # noqa: F401
    import healthcare_etl_spark.plans.queries_similarity  # noqa: F401
    import healthcare_etl_spark.plans.queries_multimodal  # noqa: F401

    from healthcare_etl_spark.streaming.joins import register_join_queries
    from healthcare_etl_spark.streaming.stateful import register_stateful_queries
    from healthcare_etl_spark.streaming.windows import register_streaming_queries

    register_streaming_queries()
    register_stateful_queries()
    register_join_queries()


def get_registry() -> dict[str, Query]:
    _load_all_modules()
    return REGISTRY


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in get_registry().items()}


def get_oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in get_registry().items() if q.oracle is not None}
