"""The flagship ETL-replica pipeline (SURVEY.md §2.10 ``q_etl_replica``).

Re-expresses the reference's complete transform chain (reference
``etl_app/etl_script.py:74-119``: normalize -> coerce -> dropna ->
filter -> project -> drop -> inner merge) over a healthcare-shaped view
of the TPC-H-ish fixtures:

- ``readmissions`` (fact)      <- ``orders``  (15k rows @ sf0.01)
- ``hospital_info`` (dimension) <- ``customer ⋈ nation``

The raw views deliberately carry the reference's ugly pre-normalization
headers ("Facility ID", "City/Town", ...) so the P1 rename operator is
exercised for real, and embed the reference's data quirks: zero-padded
string facility ids (etl_script.py:49), sentinel strings in numeric
columns ("N/A", "Too Few to Report" -> coerce to NULL, etl_script.py:86),
multiple measures per facility (filter selectivity, etl_script.py:99),
and facilities missing from the dimension (inner-join drops,
etl_script.py:119).

Scale shape: the fact side is never shuffled — the single join
broadcasts the dimension; every other step is a narrow map. At 100 TB
this plan is scan -> codegen map -> broadcast-hash-join -> sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_spark.operators import (
    broadcast_inner_join,
    coerce_numeric,
    drop_columns,
    drop_null_rows,
    filter_eq,
    normalize_columns,
    project,
)
from healthcare_etl_spark.functions.rounding import stable_round, stable_round_sql
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table

HF_MEASURE = "READM-30-HF-HRRP"

NUMERIC_COLS = ["excess_readmission_ratio", "number_of_discharges"]

HOSPITAL_INFO_COLS = [
    "facility_id",
    "facility_name",
    "city_town",
    "state",
    "hospital_type",
    "hospital_ownership",
]


def readmissions_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS-HRRP-shaped fact view over ``orders`` (pre-normalization headers)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.lpad(F.col("o_custkey").cast("string"), 6, "0").alias("Facility ID"),
        F.concat(F.lit("Hospital "), F.col("o_custkey").cast("string")).alias("Facility Name"),
        F.lit("XX").alias("State"),
        F.when(F.col("o_orderstatus") == "F", HF_MEASURE)
        .when(F.col("o_orderstatus") == "O", "READM-30-AMI-HRRP")
        .otherwise("READM-30-PN-HRRP")
        .alias("Measure Name"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("Too Few to Report"))
        .otherwise(F.floor(F.col("o_totalprice") / 1000).cast("string"))
        .alias("Number of Discharges"),
        # stable_round, not engine-native round: o_totalprice/300000 + 0.7
        # lands exactly on the 4dp half boundary for ~1/3000 orders, where
        # Spark's BigDecimal HALF_UP and DuckDB's std::round disagree.
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("N/A"))
        .otherwise(
            stable_round(F.col("o_totalprice") / 300000 + 0.7, 4).cast("string")
        )
        .alias("Excess Readmission Ratio"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("1")).alias("Footnote"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("Start Date"),
        F.date_format(F.date_add(F.col("o_orderdate"), 365), "yyyy-MM-dd").alias("End Date"),
    )


READMISSIONS_RAW_SQL = """
SELECT lpad(CAST(o_custkey AS VARCHAR), 6, '0') AS facility_id,
       'Hospital ' || CAST(o_custkey AS VARCHAR)  AS facility_name,
       'XX'                                        AS state,
       CASE o_orderstatus WHEN 'F' THEN 'READM-30-HF-HRRP'
                          WHEN 'O' THEN 'READM-30-AMI-HRRP'
                          ELSE 'READM-30-PN-HRRP' END AS measure_name,
       CASE WHEN o_orderkey % 10 = 0 THEN 'Too Few to Report'
            ELSE CAST(CAST(floor(o_totalprice / 1000) AS BIGINT) AS VARCHAR) END
           AS number_of_discharges,
       CASE WHEN o_orderkey % 13 = 0 THEN 'N/A'
            ELSE CAST((round((o_totalprice / 300000 + 0.7) * 10000.0) / 10000.0)
                      AS VARCHAR) END
           AS excess_readmission_ratio,
       CASE WHEN o_orderkey % 3 = 0 THEN '1' END   AS footnote,
       strftime(o_orderdate, '%Y-%m-%d')           AS start_date,
       strftime(o_orderdate + INTERVAL 365 DAY, '%Y-%m-%d') AS end_date
FROM orders
"""


def hospital_info_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hospital dimension view over ``customer ⋈ nation``.

    ``c_custkey % 5 == 0`` facilities are withheld so the flagship's
    inner join actually drops fact rows (the reference relies on this
    only-matching-rows semantic, etl_script.py:119).
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .filter(F.col("c_custkey") % 5 != 0)
        .select(
            F.lpad(F.col("c_custkey").cast("string"), 6, "0").alias("Facility ID"),
            F.col("c_name").alias("Facility Name"),
            F.concat(F.col("n_name"), F.lit(" CITY")).alias("City/Town"),
            F.col("n_name").alias("State"),
            F.col("c_mktsegment").alias("Hospital Type"),
            F.when(F.col("c_custkey") % 4 == 0, "Government")
            .when(F.col("c_custkey") % 4 == 1, "Proprietary")
            .when(F.col("c_custkey") % 4 == 2, "Voluntary non-profit")
            .otherwise("Physician")
            .alias("Hospital Ownership"),
        )
    )


HOSPITAL_INFO_RAW_SQL = """
SELECT lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS facility_id,
       c_name                                    AS facility_name,
       n_name || ' CITY'                         AS city_town,
       n_name                                    AS state,
       c_mktsegment                              AS hospital_type,
       CASE c_custkey % 4 WHEN 0 THEN 'Government'
                          WHEN 1 THEN 'Proprietary'
                          WHEN 2 THEN 'Voluntary non-profit'
                          ELSE 'Physician' END   AS hospital_ownership
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey % 5 != 0
"""


def heart_failure_readmissions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full reference transform chain, one lazy Catalyst plan.

    Mirrors etl_script.py steps in order: normalize (:74-75) -> coerce
    (:79-86) -> dropna (:93) -> HF filter (:99) -> dim projection (:105)
    -> drop overlapping cols (:112) -> inner join (:119). Authoring order
    is irrelevant to the physical plan: Catalyst pushes the filter and
    the pruning into the scans regardless.
    """
    re_df = normalize_columns(readmissions_raw(spark, sf_dir))
    hi_df = normalize_columns(hospital_info_raw(spark, sf_dir))

    re_df = coerce_numeric(re_df, NUMERIC_COLS)
    re_df = drop_null_rows(re_df, NUMERIC_COLS)
    re_df = filter_eq(re_df, "measure_name", HF_MEASURE)

    hi_sub = project(hi_df, HOSPITAL_INFO_COLS)
    re_df = drop_columns(re_df, ["state", "facility_name"])

    return broadcast_inner_join(re_df, hi_sub, on="facility_id")


ETL_REPLICA_SQL = f"""
WITH readmissions AS ({READMISSIONS_RAW_SQL}),
hospital_info AS ({HOSPITAL_INFO_RAW_SQL}),
cleaned AS (
    SELECT facility_id,
           measure_name,
           TRY_CAST(number_of_discharges AS DOUBLE)     AS number_of_discharges,
           TRY_CAST(excess_readmission_ratio AS DOUBLE) AS excess_readmission_ratio,
           footnote, start_date, end_date
    FROM readmissions
    WHERE TRY_CAST(number_of_discharges AS DOUBLE) IS NOT NULL
      AND TRY_CAST(excess_readmission_ratio AS DOUBLE) IS NOT NULL
      AND measure_name = 'READM-30-HF-HRRP'
)
SELECT c.facility_id, c.measure_name, c.number_of_discharges,
       c.excess_readmission_ratio, c.footnote, c.start_date, c.end_date,
       h.facility_name, h.city_town, h.state, h.hospital_type, h.hospital_ownership
FROM cleaned c
JOIN hospital_info h USING (facility_id)
"""


register(
    "q_etl_replica",
    oracle=ETL_REPLICA_SQL,
    description="Flagship: full reference ETL chain (P1-P6, J1) over the healthcare-shaped view",
    tags=("parity", "flagship"),
)(heart_failure_readmissions)


@register(
    "q_etl_replica_by_state",
    oracle=f"""
WITH final AS ({ETL_REPLICA_SQL})
SELECT state,
       (round((avg(excess_readmission_ratio)) * 1000000.0) / 1000000.0) AS avg_ratio,
       count(*) AS n_rows
FROM final GROUP BY state
""",
    description="Dashboard choropleth aggregate (A4) over the flagship output — app.py:57",
    tags=("parity",),
)
def etl_replica_by_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = heart_failure_readmissions(spark, sf_dir)
    return df.groupBy("state").agg(
        stable_round(F.avg("excess_readmission_ratio"), 6).alias("avg_ratio"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_etl_replica_by_ownership",
    oracle=f"""
WITH final AS ({ETL_REPLICA_SQL})
SELECT hospital_ownership,
       (round((avg(excess_readmission_ratio)) * 1000000.0) / 1000000.0) AS avg_ratio
FROM final GROUP BY hospital_ownership
""",
    description="Dashboard ownership bar-chart aggregate (A5) — app.py:74",
    tags=("parity",),
)
def etl_replica_by_ownership(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = heart_failure_readmissions(spark, sf_dir)
    return df.groupBy("hospital_ownership").agg(
        stable_round(F.avg("excess_readmission_ratio"), 6).alias("avg_ratio")
    )


@register(
    "q_etl_metrics",
    oracle=f"""
WITH final AS ({ETL_REPLICA_SQL})
SELECT count(DISTINCT facility_id) AS total_hospitals,
       (round((avg(excess_readmission_ratio)) * 1000.0) / 1000.0) AS avg_ratio
FROM final
""",
    description="Dashboard metric tiles (A2+A3 over the flagship output) — app.py:45-48",
    tags=("parity",),
)
def etl_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = heart_failure_readmissions(spark, sf_dir)
    return df.agg(
        F.countDistinct("facility_id").alias("total_hospitals"),
        stable_round(F.avg("excess_readmission_ratio"), 3).alias("avg_ratio"),
    )


@register(
    "q_format_number",
    oracle=(
        "WITH final AS (" + ETL_REPLICA_SQL + ")\n"
        "SELECT state,\n"
        "       format('{:,}', count(DISTINCT facility_id)) AS n_hospitals_fmt,\n"
        "       format('{:.3f}', "
        + stable_round_sql("avg(excess_readmission_ratio)", 3)
        + ") AS avg_ratio_fmt\n"
        "FROM final\n"
        "GROUP BY state\n"
    ),
    description=(
        "F3 numeric display formatting — thousands separator + fixed 3dp "
        "(reference app.py:47-48 f'{{n:,}}' / f'{{mean:.3f}}' tiles), as "
        "format_number over stable-rounded aggregates"
    ),
    tags=("parity",),
)
def etl_format_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = heart_failure_readmissions(spark, sf_dir)
    return df.groupBy("state").agg(
        F.format_number(F.countDistinct("facility_id"), 0).alias("n_hospitals_fmt"),
        F.format_number(stable_round(F.avg("excess_readmission_ratio"), 3), 3).alias(
            "avg_ratio_fmt"
        ),
    )


@register(
    "q_etl_topn_by_state",
    oracle=f"""
WITH final AS ({ETL_REPLICA_SQL})
SELECT state, facility_id, facility_name, excess_readmission_ratio
FROM (
    SELECT state, facility_id, facility_name, excess_readmission_ratio,
           row_number() OVER (PARTITION BY state
               ORDER BY excess_readmission_ratio DESC, facility_id ASC) AS rn
    FROM final
) WHERE rn <= 3
""",
    description=(
        "Top-3 facilities per state by readmission ratio — the window-function "
        "generalization of the dashboard's sorted table (SURVEY §2.8 note), over "
        "the flagship output"
    ),
    tags=("parity", "window"),
)
def etl_topn_by_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators import top_n_per_group

    df = heart_failure_readmissions(spark, sf_dir)
    return top_n_per_group(
        df.select("state", "facility_id", "facility_name", "excess_readmission_ratio"),
        partition_by=["state"],
        order_by=[F.desc("excess_readmission_ratio"), F.asc("facility_id")],
        n=3,
    )
