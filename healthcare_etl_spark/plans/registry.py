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


# The driver's correctness gate oracle-checks the FIRST 50 registered
# queries (registration order == dict order).  This list curates that
# window.  Rotation policy: the 22 SURVEY.md §2 core rows stay pinned
# every round (reference parity must never lose driver signal); the
# remaining 28 slots ROTATE each round over the oracle-backed extension
# queries so that every one of them regains a driver-green row at most
# a couple of rounds apart.  Round 2 covered the extension families
# (dedup/similarity/text/corpus/pipeline/events/multimodal — all green
# in CORRECTNESS_r02); round 3 swaps those slots for the deep TPC-H
# shapes, set-ops, pivot/rollup/cube/grouping-sets, subqueries,
# as-of/range joins, sampling/quality and multimodal kernels that were
# last driver-checked in round 1.  Queries outside the window keep
# their in-repo DuckDB-parity test (tests/test_oracle_parity.py runs
# ALL oracle-backed queries at sf0.001 and, under -m sf001, at sf0.01);
# rows-only (non-SQL-expressible) queries register last so they never
# burn a checked slot on `no_oracle`.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- SURVEY.md §2 core (reference parity; must stay green every round)
    "q_etl_replica",
    "q_etl_replica_by_state",
    "q_etl_replica_by_ownership",
    "q_etl_metrics",
    "q_etl_topn_by_state",
    "q_scan_project",
    "q_select_star",
    "q_normalize_columns",
    "q_try_cast_coerce",
    "q_dropna",
    "q_filter_eq",
    "q_drop_cols",
    "q_inner_join",
    "q_count",
    "q_count_distinct",
    "q_avg_global",
    "q_groupby_avg",
    "q_groupby_avg_sorted",
    "q_topk",
    "q_string_funcs",
    "q_sql_surface",
    "q_format_number",
    # -- round-3 rotation: deep TPC-H shapes (the complex ones: EXISTS/
    #    NOT-EXISTS, threshold subqueries, left-join-count, decorrelated
    #    correlated forms)
    "q_tpch_q7_shape",
    "q_tpch_q8_shape",
    "q_tpch_q9_shape",
    "q_tpch_q11_shape",
    "q_tpch_q13_shape",
    "q_tpch_q15_shape",
    "q_tpch_q16_shape",
    "q_tpch_q17_shape",
    "q_tpch_q18_shape",
    "q_tpch_q20_shape",
    "q_tpch_q21_shape",
    "q_tpch_q22_shape",
    # -- set operations
    "q_union_distinct",
    "q_intersect",
    "q_except",
    # -- multi-dimensional grouping
    "q_pivot",
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    # -- subqueries
    "q_scalar_subquery",
    "q_correlated_subquery",
    # -- temporal joins
    "q_asof_join",
    "q_range_join",
    # -- sampling / quality / statistics
    "q_cluster_balanced_sample",
    "q_repetition_quality",
    "q_corr_cov",
    # -- multimodal kernels (Arrow-batched mapInPandas plumbing)
    "q_multimodal_resize",
    "q_multimodal_frames",
)


def _ordered(reg: dict[str, Query]) -> dict[str, Query]:
    """Window names first, then remaining oracle-backed, then rows-only."""
    missing = [name for name in DRIVER_WINDOW if name not in reg]
    if missing:
        raise KeyError(
            "DRIVER_WINDOW names not present in the registry (renamed or "
            f"unregistered?): {missing}"
        )
    out: dict[str, Query] = {}
    for name in DRIVER_WINDOW:
        out[name] = reg[name]
    rest = [q for name, q in reg.items() if name not in out]
    for q in rest:
        if q.oracle is not None:
            out[q.name] = q
    for q in rest:
        if q.oracle is None:
            out[q.name] = q
    return out


def get_registry() -> dict[str, Query]:
    _load_all_modules()
    return _ordered(REGISTRY)


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in get_registry().items()}


def get_oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in get_registry().items() if q.oracle is not None}
