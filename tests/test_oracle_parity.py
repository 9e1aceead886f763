"""Differential tests: every oracle-backed registry query must match
DuckDB exactly (the driver's correctness gate, reproduced locally).

Runs at sf0.001 for speed; the driver runs the same comparison at
sf0.01. A nightly-ish marker runs sf0.01 too.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import run_compare


def _oracle_query_names():
    from healthcare_etl_spark.plans.registry import get_registry

    return sorted(n for n, q in get_registry().items() if q.oracle is not None)


@pytest.mark.parametrize("name", _oracle_query_names())
def test_oracle_parity_smoke(spark, sf_smoke, name):
    problems = run_compare(spark, name, sf_smoke)
    assert not problems, f"{name} @ sf0.001: " + "; ".join(problems)


@pytest.mark.sf001
@pytest.mark.parametrize("name", _oracle_query_names())
def test_oracle_parity_sf001(spark, sf_correct, name):
    problems = run_compare(spark, name, sf_correct)
    assert not problems, f"{name} @ sf0.01: " + "; ".join(problems)


def _canon_type(t: str) -> str:
    t = str(t).lower()
    return {
        "int64": "long", "bigint": "long",
        "int32": "int", "integer": "int",
        "float64": "double", "object": "string", "varchar": "string",
        "bool": "boolean",
    }.get(t, t)


@pytest.mark.parametrize("name", _oracle_query_names())
def test_oracle_schema_types(spark, sf_smoke, name):
    """Column dtypes must align between Spark and the oracle (the driver's
    schema check may compare types, not just names — e.g. Spark's int
    length() vs DuckDB's BIGINT len())."""
    import duckdb

    from healthcare_etl_spark.plans.registry import get_registry
    from tests.oracle_harness import duckdb_connection

    q = get_registry()[name]
    sdt = {c: _canon_type(t) for c, t in q.fn(spark, sf_smoke).dtypes}
    con = duckdb_connection(sf_smoke)
    try:
        rel = con.sql(q.oracle)
        odt = {c: _canon_type(t) for c, t in zip(rel.columns, rel.types)}
    finally:
        con.close()
    assert sdt == odt
