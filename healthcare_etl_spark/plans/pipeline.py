"""End-to-end batch pipeline: the reference's full lifecycle.

The reference's system is transform -> load to PostgreSQL
(``etl_app/etl_script.py:163-169``) -> dashboard reads it back and
aggregates (``dashboard_app/app.py:29-57``). This module reproduces that
cycle on the durable, scale-correct substrate: a state-partitioned
parquet table as the sink (partition pruning for every state-scoped
dashboard query), read-back, and the dashboard aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_spark.plans.healthcare import heart_failure_readmissions
from healthcare_etl_spark.sources import write_table
from healthcare_etl_spark.functions.rounding import stable_round


def run_etl_pipeline(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """Transform -> partitioned overwrite sink -> read back.

    Partitioning by ``state`` mirrors how a 100 TB deployment would lay
    the table out: the dashboard's per-state queries (choropleth drill-
    downs) then prune to one partition directory.
    """
    final = heart_failure_readmissions(spark, sf_dir)
    write_table(final, out_dir, partition_by=["state"])
    return spark.read.parquet(out_dir)


def dashboard_aggregates(table: DataFrame) -> dict[str, DataFrame]:
    """The four dashboard reads (app.py:45-101) over the loaded table."""
    return {
        "metrics": table.agg(
            F.countDistinct("facility_id").alias("total_hospitals"),
            stable_round(F.avg("excess_readmission_ratio"), 3).alias("avg_ratio"),
        ),
        "by_state": table.groupBy("state").agg(
            stable_round(F.avg("excess_readmission_ratio"), 6).alias("avg_ratio")
        ),
        "by_ownership": table.groupBy("hospital_ownership").agg(
            stable_round(F.avg("excess_readmission_ratio"), 6).alias("avg_ratio")
        ),
        "top_hospitals": table.orderBy(
            F.desc("excess_readmission_ratio"), F.asc("facility_id")
        ).limit(10),
    }
