from healthcare_etl_spark.streaming.drift import run_streaming_psi_drift
from healthcare_etl_spark.streaming.incremental import run_incremental_ingest
from healthcare_etl_spark.streaming.windows import (
    run_streaming_dedup,
    run_streaming_sessionization,
    run_streaming_tumbling,
    streaming_events,
)

__all__ = [
    "run_incremental_ingest",
    "streaming_events",
    "run_streaming_tumbling",
    "run_streaming_dedup",
    "run_streaming_sessionization",
    "run_streaming_psi_drift",
]
