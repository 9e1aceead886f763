"""Streaming==batch equivalence tests for jobs added after the main
streaming suite (see tests/test_extensions.py for the original eight).
"""

from __future__ import annotations


def test_stream_sliding_topk_equals_batch(spark, sf_smoke):
    """The sliding-window trending top-k must equal its batch twin on a
    one-batch replay (same windows, same counts, same rank order)."""
    from healthcare_etl_spark.streaming.windows import (
        batch_sliding_topk,
        run_streaming_sliding_topk,
    )

    got = (
        run_streaming_sliding_topk(spark, sf_smoke, query_name="t_slide_topk")
        .orderBy("window_start", "rank")
        .collect()
    )
    want = (
        batch_sliding_topk(spark, sf_smoke).orderBy("window_start", "rank").collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0
