"""Subquery surface — scalar, correlated, EXISTS/IN — plus null-key
group semantics (extension beyond the reference, SURVEY.md §2.6 note).

Expressed through ``spark.sql`` over temp views: Catalyst decorrelates
the correlated forms into joins (RewriteCorrelatedScalarSubquery), so
each of these compiles to the same shuffle/broadcast plans as the
hand-written DataFrame programs — no per-row re-execution, which is
what makes correlated subqueries survive at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table
from healthcare_etl_spark.functions.rounding import stable_round


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(f"v_{n}")


@register(
    "q_scalar_subquery",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_extendedprice > 1.8 * (SELECT avg(l_extendedprice) FROM lineitem)
""",
    description="Uncorrelated scalar subquery: items above 1.8x global average price",
    tags=("subquery", "extra-relational"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM v_lineitem
        WHERE l_extendedprice > 1.8 * (SELECT avg(l_extendedprice) FROM v_lineitem)
        """
    )


@register(
    "q_correlated_subquery",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 1.8 * (
    SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
""",
    description=(
        "Correlated scalar subquery (each order vs its customer's average) — "
        "Catalyst decorrelates to an aggregate + join, not per-row re-execution"
    ),
    tags=("subquery", "extra-relational"),
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders o
        WHERE o_totalprice > 1.8 * (
            SELECT avg(o2.o_totalprice) FROM v_orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "q_tpch_q4_shape",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
""",
    description="TPC-H Q4 shape: correlated EXISTS (compiles to left-semi join) + group count",
    tags=("subquery", "bench"),
)
def q_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM v_orders o
        WHERE EXISTS (
            SELECT 1 FROM v_lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        )
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_tpch_q13_shape",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
)
GROUP BY c_count
""",
    description="TPC-H Q13 shape: order-count histogram incl. zero-order customers (left join + double group)",
    tags=("extra-relational", "bench"),
)
def q_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM v_customer c LEFT JOIN v_orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        """
    )


@register(
    "q_tpch_q18_shape",
    oracle="""
SELECT c_custkey, o_orderkey, (round((sum_qty) * 10000.0) / 10000.0) AS sum_qty
FROM (
    SELECT c.c_custkey, o.o_orderkey, sum(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_custkey, o.o_orderkey
)
""",
    description="TPC-H Q18 shape: IN + grouped HAVING subquery (large-volume orders)",
    tags=("subquery", "bench"),
)
def q_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, (round((sum_qty) * 10000.0) / 10000.0) AS sum_qty
        FROM (
            SELECT c.c_custkey, o.o_orderkey, sum(l.l_quantity) AS sum_qty
            FROM v_customer c
            JOIN v_orders o ON c.c_custkey = o.o_custkey
            JOIN v_lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderkey IN (
                SELECT l_orderkey FROM v_lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
            )
            GROUP BY c.c_custkey, o.o_orderkey
        )
        """
    )


@register(
    "q_null_group_keys",
    oracle="""
WITH src AS (
    SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS status,
           o_totalprice
    FROM orders
)
SELECT status, count(*) AS n, (round((sum(o_totalprice)) * 100.0) / 100.0) AS total
FROM src GROUP BY status
""",
    description=(
        "NULL group keys: Spark and SQL keep NULL as a group (pandas groupby drops "
        "it — a documented semantic divergence from the reference, SURVEY §2.4)"
    ),
    tags=("extra-relational", "semantics"),
)
def q_null_group_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    src = o.select(
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        "o_totalprice",
    )
    return src.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        stable_round(F.sum("o_totalprice"), 2).alias("total"),
    )
