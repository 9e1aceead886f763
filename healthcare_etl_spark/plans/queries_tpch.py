"""TPC-H-shaped headline queries — the bench workload.

These exercise the scale-critical plan shapes: multi-way joins with
broadcast dimensions, partial+final hash aggregation over the fact
table, and fused top-k. They generalize the reference's single
join+aggregate pattern (etl_script.py:119 + app.py:57,74) to the plans a
real warehouse runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_spark.functions.rounding import stable_round
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table


@register(
    "q_tpch_q1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       (round((sum(l_quantity)) * 10000.0) / 10000.0)                                        AS sum_qty,
       (round((sum(l_extendedprice)) * 100.0) / 100.0)                                   AS sum_base_price,
       (round((sum(l_extendedprice * (1 - l_discount))) * 100.0) / 100.0)                AS sum_disc_price,
       (round((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0) / 100.0)  AS sum_charge,
       (round((avg(l_quantity)) * 1000000.0) / 1000000.0)                                        AS avg_qty,
       (round((avg(l_extendedprice)) * 1000000.0) / 1000000.0)                                   AS avg_price,
       (round((avg(l_discount)) * 1000000.0) / 1000000.0)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates; one shuffle, map-side combine",
    tags=("bench", "parity"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 4).alias("sum_qty"),
            stable_round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            stable_round(F.sum(disc_price), 2).alias("sum_disc_price"),
            stable_round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            stable_round(F.avg("l_quantity"), 6).alias("avg_qty"),
            stable_round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            stable_round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_tpch_q3",
    oracle="""
SELECT l_orderkey,
       (round((sum(l_extendedprice * (1 - l_discount))) * 100.0) / 100.0) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 20
""",
    description=(
        "TPC-H Q3 shape: selective filters -> join chain -> agg -> fused top-k. "
        "orders/customer are fact-sized at scale, so no forced broadcast: AQE "
        "converts to broadcast at runtime when the filtered side is actually small."
    ),
    tags=("bench", "parity"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            stable_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


@register(
    "q_tpch_q5",
    oracle="""
SELECT n_name,
       (round((sum(l_extendedprice * (1 - l_discount))) * 100.0) / 100.0) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
    description=(
        "TPC-H Q5 shape: 6-way star join. lineitem/orders/customer are all huge at "
        "scale -> shuffle joins under AQE; only the true dimensions "
        "(supplier/nation/region) get broadcast hints. Forcing orders/customer "
        "broadcasts measured 4x slower here and would OOM a real cluster."
    ),
    tags=("bench", "parity"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            stable_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q_tpch_q6",
    oracle="""
SELECT (round((sum(l_extendedprice * l_discount)) * 100.0) / 100.0) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    description="TPC-H Q6 shape: pure scan+filter+agg; every predicate pushed to parquet",
    tags=("bench", "parity"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            stable_round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
        )
    )


@register(
    "q_tpch_q10_shape",
    oracle="""
SELECT c_custkey, c_name, (round((revenue) * 100.0) / 100.0) AS revenue, n_name
FROM (
    SELECT c.c_custkey, c.c_name, n.n_name,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
)
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    description="TPC-H Q10 shape: returned-item revenue per customer, 4-way join + top-k",
    tags=("bench", "parity"),
)
def q_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_raw"))
        .select(
            "c_custkey", "c_name", stable_round("rev_raw", 2).alias("revenue"), "n_name"
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_tpch_q12_shape",
    oracle="""
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
""",
    description="TPC-H Q12 shape: conditional counts by priority class over a date-ranged join",
    tags=("bench", "parity"),
)
def q_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q14_shape",
    oracle="""
SELECT (round((100.0 * sum(CASE WHEN p_type LIKE 'ECONOMY%'
                THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
        / sum(l_extendedprice * (1 - l_discount))) * 1000000.0) / 1000000.0) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
""",
    description="TPC-H Q14 shape: economy-type revenue share (PROMO% in classic TPC-H; fixture p_type domain is {ECONOMY,STANDARD,...}) (conditional agg ratio over a part join)",
    tags=("bench", "parity"),
)
def q_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("ECONOMY%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(stable_round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue_pct"))
    )


@register(
    "q_tpch_q19_shape",
    oracle="""
SELECT (round((sum(l_extendedprice * (1 - l_discount))) * 100.0) / 100.0) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_size BETWEEN 1 AND 50 AND l_quantity >= 45)
""",
    description="TPC-H Q19 shape: disjunctive multi-attribute predicates across the join",
    tags=("bench", "parity"),
)
def q_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 40))
        | (F.col("p_size").between(1, 50) & (F.col("l_quantity") >= 45))
    )
    return j.filter(cond).agg(
        stable_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
