from healthcare_etl_spark.operators.cleaning import coerce_numeric, drop_null_rows
from healthcare_etl_spark.operators.normalize import normalize_column_name, normalize_columns
from healthcare_etl_spark.operators.relational import (
    broadcast_inner_join,
    drop_columns,
    filter_eq,
    project,
    top_k,
    top_n_per_group,
)
from healthcare_etl_spark.operators.scd import scd2_intervals

__all__ = [
    "normalize_columns",
    "normalize_column_name",
    "coerce_numeric",
    "drop_null_rows",
    "filter_eq",
    "project",
    "drop_columns",
    "broadcast_inner_join",
    "top_k",
    "top_n_per_group",
    "scd2_intervals",
]
