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
