"""Aggregation / sort / top-k / window parity queries (SURVEY.md §2.4-§2.5).

Float note: every computed double (avg/sum) is rounded identically on
both sides — double summation order differs between Spark's partial+final
hash aggregation and DuckDB's, so unrounded values can drift in the last
ulp and break the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_spark.functions.rounding import stable_round, stable_round_sql
from healthcare_etl_spark.operators import top_k, top_n_per_group
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table


@register(
    "q_count",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
    description="A1: count(*) (etl_script.py:100,120)",
    tags=("parity",),
)
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "q_count_distinct",
    oracle="SELECT count(DISTINCT o_custkey) AS n_customers FROM orders",
    description="A2: exact distinct count (app.py:47)",
    tags=("parity",),
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(F.countDistinct("o_custkey").alias("n_customers"))


@register(
    "q_avg_global",
    oracle="SELECT (round((avg(l_extendedprice)) * 1000000.0) / 1000000.0) AS avg_price FROM lineitem",
    description="A3: global mean; Spark avg ignores NULLs like pandas mean skips NaN (app.py:48)",
    tags=("parity",),
)
def q_avg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(stable_round(F.avg("l_extendedprice"), 6).alias("avg_price"))


@register(
    "q_groupby_avg",
    oracle="""
SELECT l_returnflag, (round((avg(l_discount)) * 1000000.0) / 1000000.0) AS avg_discount, count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    description="A4: group-by mean, partial+final hash agg (app.py:57)",
    tags=("parity",),
)
def q_groupby_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.avg("l_discount"), 6).alias("avg_discount"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_groupby_avg_sorted",
    oracle="""
SELECT o_orderpriority, (round((avg(o_totalprice)) * 1000000.0) / 1000000.0) AS avg_price
FROM orders GROUP BY o_orderpriority ORDER BY avg_price DESC
""",
    description="A5: group-by mean + sort (app.py:74); order-insensitive hash, sort kept for parity",
    tags=("parity",),
)
def q_groupby_avg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(stable_round(F.avg("o_totalprice"), 6).alias("avg_price"))
        .orderBy(F.desc("avg_price"))
    )


@register(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
    description="O1+O2: top-k fused to TakeOrderedAndProject; unique-key tiebreak for determinism (app.py:95-101)",
    tags=("parity",),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        10,
    )


@register(
    "q_topn_per_group",
    oracle="""
SELECT c_nationkey, c_custkey, c_acctbal FROM (
    SELECT c_nationkey, c_custkey, c_acctbal,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
    FROM customer
) WHERE rn <= 3
""",
    description="Window top-N per group: one shuffle on the group key, no global sort (SURVEY §2.8)",
    tags=("parity", "window"),
)
def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return top_n_per_group(
        c.select("c_nationkey", "c_custkey", "c_acctbal"),
        partition_by=["c_nationkey"],
        order_by=[F.desc("c_acctbal"), F.asc("c_custkey")],
        n=3,
    )


@register(
    "q_window_running_sum",
    oracle="""
SELECT l_orderkey, l_linenumber,
       (round((sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0) / 10000.0) AS running_qty,
       CAST(rank() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS BIGINT) AS price_rank
FROM lineitem
""",
    description=(
        "Window aggregates: running sum + rank within order. RANGE frame (not ROWS): "
        "(l_orderkey, l_linenumber) is not unique in the fixtures, and a ROWS frame over "
        "tied sort keys is tie-order-dependent; RANGE includes peers, so it is deterministic."
    ),
    tags=("window",),
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    w_sum = Window.partitionBy("l_orderkey").orderBy("l_linenumber").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_rank = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        stable_round(F.sum("l_quantity").over(w_sum), 4).alias("running_qty"),
        F.rank().over(w_rank).cast("long").alias("price_rank"),
    )


@register(
    "q_pivot",
    oracle="""
SELECT l_returnflag,
       (round((sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)) * 10000.0) / 10000.0) AS qty_O,
       (round((sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)) * 10000.0) / 10000.0) AS qty_F
FROM lineitem GROUP BY l_returnflag
""",
    description="Pivot on linestatus; oracle expressed as conditional aggregation (same result)",
    tags=("extra-relational",),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(stable_round(F.sum("l_quantity"), 4))
    )
    return piv.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@register(
    "q_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       (round((sum(l_extendedprice)) * 100.0) / 100.0) AS sum_price, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    description="ROLLUP grouping sets (subtotals + grand total)",
    tags=("extra-relational",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        stable_round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_stats_summary",
    oracle="""
SELECT (round((min(l_quantity)) * 10000.0) / 10000.0)                         AS min_qty,
       (round((max(l_quantity)) * 10000.0) / 10000.0)                         AS max_qty,
       (round((stddev_samp(l_quantity)) * 1000000.0) / 1000000.0)                 AS std_qty,
       (round((var_samp(l_quantity)) * 1000000.0) / 1000000.0)                    AS var_qty,
       (round((sum(l_quantity)) * 10000.0) / 10000.0)                         AS sum_qty,
       (round((quantile_cont(l_quantity, 0.5)) * 1000000.0) / 1000000.0)          AS median_qty
FROM lineitem
""",
    description="Statistical aggregates: min/max/stddev/variance/median (exact percentile)",
    tags=("extra-agg",),
)
def q_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        stable_round(F.min("l_quantity"), 4).alias("min_qty"),
        stable_round(F.max("l_quantity"), 4).alias("max_qty"),
        stable_round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        stable_round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        stable_round(F.sum("l_quantity"), 4).alias("sum_qty"),
        stable_round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
    )


@register(
    "q_approx_count_distinct",
    description=(
        "A2 at scale: HyperLogLog approximate distinct — the 100 TB-friendly variant. "
        "No oracle: HLL estimates are engine-specific; correctness asserted in tests "
        "(±5% of exact) instead."
    ),
    tags=("extra-agg", "approx"),
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    )


@register(
    "q_approx_quantiles",
    description=(
        "Approximate quantiles (KLL/GK-style percentile_approx) over lineitem "
        "price — the sketch path for 100 TB percentiles. Rows-only: estimates "
        "are engine-specific; accuracy vs exact percentile is unit-tested."
    ),
    tags=("extra-agg", "approx"),
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("p99"),
    )


@register(
    "q_grouped_zscore",
    oracle="""
WITH stats AS (
    SELECT o_orderkey, o_custkey, o_totalprice,
           avg(o_totalprice) OVER (PARTITION BY o_custkey)         AS mu,
           stddev_samp(o_totalprice) OVER (PARTITION BY o_custkey) AS sigma,
           count(*) OVER (PARTITION BY o_custkey)                  AS n
    FROM orders
)
SELECT o_orderkey, o_custkey,
       (round((CASE WHEN n > 1 AND sigma > 0
                    THEN (o_totalprice - mu) / sigma ELSE 0.0 END) * 1000000.0)
        / 1000000.0) AS zscore
FROM stats
""",
    description=(
        "Per-customer z-score of order totals via window aggregates — the "
        "built-in form of a grouped normalization; an applyInPandas "
        "implementation is cross-checked against it in tests"
    ),
    tags=("window", "extra-agg"),
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from healthcare_etl_spark.functions.rounding import stable_round

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    mu = F.avg("o_totalprice").over(w)
    sigma = F.stddev_samp("o_totalprice").over(w)
    n = F.count(F.lit(1)).over(w)
    z = F.when((n > 1) & (sigma > 0), (F.col("o_totalprice") - mu) / sigma).otherwise(0.0)
    return o.select(
        "o_orderkey", "o_custkey", stable_round(z, 6).alias("zscore")
    )


@register(
    "q_group_median",
    oracle="""
SELECT l_returnflag,
       (round(quantile_cont(l_quantity, 0.5) * 1000000.0) / 1000000.0)      AS median_qty,
       (round(quantile_cont(l_extendedprice, 0.25) * 1000000.0) / 1000000.0) AS p25_price,
       (round(quantile_cont(l_extendedprice, 0.75) * 1000000.0) / 1000000.0) AS p75_price
FROM lineitem
GROUP BY l_returnflag
""",
    description=(
        "Exact grouped percentiles (median / IQR): Spark percentile() and "
        "DuckDB quantile_cont() both linearly interpolate, so values match "
        "after stable rounding. Exact percentile requires a per-group sort — "
        "the approx_percentile sketch (q_approx_quantiles) is the 100 TB path"
    ),
    tags=("agg", "parity"),
)
def q_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        stable_round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25_price"),
        stable_round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75_price"),
    )


@register(
    "q_grouping_sets",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL')            AS returnflag,
       coalesce(CAST(year(l_shipdate) AS VARCHAR), 'ALL') AS ship_year,
       CAST(count(*) AS BIGINT)                 AS n,
       (round((sum(l_quantity)) * 10000.0) / 10000.0)                AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, year(l_shipdate)), (l_returnflag), ())
""",
    description=(
        "Explicit GROUPING SETS (custom margins, not the full cube): "
        "(flag, year), (flag), and grand total in one Expand + single "
        "shuffle — three margins for one pass over the fact table"
    ),
    tags=("agg", "parity"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("v_gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL')                        AS returnflag,
               coalesce(CAST(year(l_shipdate) AS STRING), 'ALL')    AS ship_year,
               count(*)                                             AS n,
               (round((sum(l_quantity)) * 10000.0) / 10000.0)                            AS sum_qty
        FROM v_gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, year(l_shipdate)), (l_returnflag), ())
        """
    )


@register(
    "q_corr_cov",
    oracle=f"""
SELECT l_returnflag,
       {stable_round_sql("corr(l_quantity, l_extendedprice)", 6)}       AS corr_qty_price,
       {stable_round_sql("covar_samp(l_quantity, l_extendedprice)", 4)} AS covs_qty_price,
       {stable_round_sql("covar_pop(l_quantity, l_extendedprice)", 4)}  AS covp_qty_price,
       {stable_round_sql("regr_slope(l_extendedprice, l_quantity)", 6)} AS slope_price_on_qty
FROM lineitem
GROUP BY l_returnflag
""",
    description=(
        "Bivariate statistical aggregates per group: Pearson correlation, "
        "sample/population covariance, OLS slope — single-pass partial-aggregable "
        "moments, so map-side combine applies at any scale. Rounded with the "
        "stable_round idiom on both sides (engine-native round() differs at "
        "half-boundaries)"
    ),
    tags=("extra-agg",),
)
def q_corr_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        stable_round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covs_qty_price"),
        stable_round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covp_qty_price"),
        stable_round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope_price_on_qty"),
    )


@register(
    "q_window_analytics",
    oracle="""
SELECT o_orderkey,
       o_orderpriority,
       CAST(ntile(4) OVER w AS INT)                                   AS price_quartile,
       (round(percent_rank() OVER w * 1000000.0) / 1000000.0)         AS pct_rank,
       (round(cume_dist() OVER w * 1000000.0) / 1000000.0)            AS cume,
       (round((o_totalprice - lag(o_totalprice) OVER w) * 100.0) / 100.0)              AS gap_to_prev
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
    description=(
        "Rank-family window analytics in one pass: quartile bucketing (ntile), "
        "percent_rank, cume_dist, and gap-to-previous (lag) per priority class — "
        "one shuffle on the partition key, deterministic via the unique "
        "o_orderkey tiebreak"
    ),
    tags=("window",),
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from healthcare_etl_spark.functions.rounding import stable_round

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        stable_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        stable_round(F.cume_dist().over(w), 6).alias("cume"),
        stable_round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias(
            "gap_to_prev"
        ),
    )


@register(
    "q_hll_rollup",
    description=(
        "Mergeable-sketch rollup — the pre-aggregation pattern that makes "
        "100 TB distinct counts cheap: per-(day, event_type) HLL user "
        "sketches (hll_sketch_agg, the materializable daily table) are "
        "UNION-MERGED to per-event_type totals (hll_union_agg + "
        "hll_sketch_estimate) without ever re-touching raw events. Unlike "
        "approx_count_distinct, the intermediate sketches are reusable: any "
        "coarser rollup (weekly, monthly, all-time) derives from the daily "
        "sketch table alone. Rows-only: sketch estimates are engine-"
        "specific; accuracy vs exact distinct is unit-tested (±5%)."
    ),
    tags=("extra-agg", "approx", "extension"),
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily_sketches = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    return (
        daily_sketches.groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            "event_type",
            F.hll_sketch_estimate("merged").alias("approx_users"),
        )
        .orderBy("event_type")
    )


@register(
    "q_string_agg",
    oracle="""
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       string_agg(s.s_name, ',' ORDER BY s.s_name) AS supplier_names
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    description=(
        "Ordered string aggregation (LISTAGG/STRING_AGG parity): "
        "suppliers concatenated per nation in sorted order. Unordered "
        "collect is nondeterministic under parallelism, so the Spark "
        "side sorts the collected array before joining — "
        "array_join(array_sort(collect_list())) — which makes the "
        "result identical on any partitioning/engine. Nation (25 rows) "
        "broadcasts onto the supplier scan; the collect shuffles once "
        "on the group key."
    ),
    tags=("agg", "extension", "parity"),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "supplier_names"
            ),
        )
    )


@register(
    "q_percentile_disc",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.5)  AS p50_price,
       quantile_disc(l_extendedprice, 0.9)  AS p90_price,
       quantile_disc(l_extendedprice, 0.99) AS p99_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    description=(
        "Discrete grouped percentiles (PERCENTILE_DISC / quantile_disc): "
        "the SLA/latency-report form that returns an actual observed "
        "value rather than an interpolation — so the result is "
        "bit-exact across engines with NO rounding bridge at all "
        "(contrast q_group_median's interpolated percentile(), which "
        "needs stable_round). Same scale caveat: exact percentiles "
        "sort per group; approx_percentile is the sketch path."
    ),
    tags=("agg", "extension", "parity"),
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p50_price"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p90_price"),
        F.expr(
            "percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p99_price"),
        F.count(F.lit(1)).alias("n"),
    )
