"""healthcare_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference pipeline ``adithyadaine/healthcare-etl`` (a pandas ETL +
dashboard, see SURVEY.md), re-expressed as a layered PySpark library:

- ``sources``   — schema'd readers/writers (parquet, csv, jdbc).
- ``operators`` — pure DataFrame -> DataFrame transforms (the SURVEY.md §2
  operator inventory plus the large-scale extension operators: dedup,
  similarity search, text analysis, multimodal columns, as-of joins,
  sessionization).
- ``functions`` — column-level expression helpers (vector math, text
  features) built from ``pyspark.sql.functions`` so they stay JVM-side.
- ``plans``     — named query programs and the query registry consumed by
  ``__spark_entry__.py`` (driver contract).
- ``streaming`` — Structured Streaming variants of the event-time
  operators.

Everything is lazy, declarative DataFrame code: Catalyst does predicate
pushdown, column pruning, and join-strategy selection; we add broadcast
hints for dimension tables and keep expressions inside whole-stage
codegen (no row-at-a-time Python UDFs in any hot path).
"""

from healthcare_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
