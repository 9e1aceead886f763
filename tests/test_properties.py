"""Property-based spot checks (SURVEY.md §5.2 item 4).

Small hypothesis-generated frames exercise algebraic invariants that
hold for ANY input — complementary to the oracle tests, which pin exact
values on fixed fixtures.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

# one small, valid row: (key in {a,b,c}, float value without NaN/inf)
row = st.tuples(
    st.sampled_from(["a", "b", "c"]),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
)
frames = st.lists(row, min_size=1, max_size=30)

N_EXAMPLES = 12  # each example spins Spark jobs; keep the budget tight


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(frames)
def test_groupby_avg_equals_sum_over_count(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    agg = df.groupBy("k").agg(
        F.avg("v").alias("avg_v"), F.sum("v").alias("sum_v"), F.count("v").alias("n")
    )
    for r in agg.collect():
        assert math.isclose(r.avg_v, r.sum_v / r.n, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(frames)
def test_filter_partitions_counts(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    p = F.col("v") > 0
    assert df.filter(p).count() + df.filter(~p).count() == df.count()


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(frames, frames)
def test_inner_join_count_bounds(spark, lrows, rrows):
    left = spark.createDataFrame(lrows, ["k", "v"])
    right = spark.createDataFrame(rrows, ["k", "w"])
    n = left.join(right, "k").count()
    # inner join row count == sum over keys of count_l * count_r
    lc = pd.DataFrame(lrows, columns=["k", "v"]).groupby("k").size()
    rc = pd.DataFrame(rrows, columns=["k", "w"]).groupby("k").size()
    expected = sum(int(lc[k]) * int(rc[k]) for k in set(lc.index) & set(rc.index))
    assert n == expected


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(frames)
def test_exact_dedup_partitions_rows(spark, rows):
    from healthcare_etl_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, k) for i, (k, _) in enumerate(rows)], ["doc_id", "text"]
    )
    out = exact_dedup(df).collect()
    # every group keeps exactly one representative; copies sum to total
    assert sum(r.n_copies for r in out) == len(rows)
    assert len({r.keeper_id for r in out}) == len(out)


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(frames)
def test_topk_is_prefix_of_sort(spark, rows):
    from healthcare_etl_spark.operators.relational import top_k

    df = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(rows)], ["id", "v"]
    )
    k = min(5, len(rows))
    got = [(r.id, r.v) for r in top_k(df, [F.desc("v"), F.asc("id")], k).collect()]
    full = [(r.id, r.v) for r in df.orderBy(F.desc("v"), F.asc("id")).collect()]
    assert got == full[:k]
