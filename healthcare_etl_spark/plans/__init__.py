from healthcare_etl_spark.plans.registry import REGISTRY, Query, get_queries, get_oracle_sql

__all__ = ["REGISTRY", "Query", "get_queries", "get_oracle_sql"]
