"""End-to-end pipeline cycle + data-quality operator tests."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F


def test_etl_pipeline_roundtrip(spark, sf_smoke, tmp_path):
    from healthcare_etl_spark.plans.healthcare import heart_failure_readmissions
    from healthcare_etl_spark.plans.pipeline import dashboard_aggregates, run_etl_pipeline

    out = str(tmp_path / "hf_readmissions")
    table = run_etl_pipeline(spark, sf_smoke, out)
    direct = heart_failure_readmissions(spark, sf_smoke)
    assert table.count() == direct.count()
    assert sorted(table.columns) == sorted(direct.columns)

    # per-state read prunes to one partition directory
    one_state = table.select("state").first()["state"]
    pruned = spark.read.parquet(out).filter(F.col("state") == one_state)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()

    # the dashboard reads all work over the loaded table
    aggs = dashboard_aggregates(table)
    m = aggs["metrics"].first()
    assert m.total_hospitals > 0 and m.avg_ratio is not None
    assert aggs["top_hospitals"].count() == 10


def test_profile(spark, sf_smoke):
    from healthcare_etl_spark.operators.quality import profile
    from healthcare_etl_spark.sources import load_table

    c = load_table(spark, sf_smoke, "customer")
    prof = {r.column: r for r in profile(c).collect()}
    assert prof["c_custkey"].n_nulls == 0
    assert prof["c_custkey"].n_distinct == c.count()
    assert set(prof) == set(c.columns)


def test_expectations_gate(spark, sf_smoke):
    from healthcare_etl_spark.operators.quality import (
        Expectation,
        check_expectations,
        expect_or_raise,
    )
    from healthcare_etl_spark.plans.healthcare import heart_failure_readmissions

    final = heart_failure_readmissions(spark, sf_smoke)
    good = [
        Expectation("facility_id_not_null", F.col("facility_id").isNotNull()),
        Expectation("ratio_positive", F.col("excess_readmission_ratio") > 0),
        Expectation("hf_measure_only", F.col("measure_name") == "READM-30-HF-HRRP"),
    ]
    res = {r.expectation: r for r in check_expectations(final, good).collect()}
    assert all(r["pass"] for r in res.values()), res
    expect_or_raise(final, good)  # must not raise

    bad = [Expectation("impossible", F.col("excess_readmission_ratio") > 100)]
    with pytest.raises(ValueError, match="impossible"):
        expect_or_raise(final, bad)
