"""Structured Streaming surface (SURVEY.md §2.B-9).

The reference is strictly batch (one MR job per k-means iteration,
``hadoop_tutorial/src/Kmeans.java:170-183``); the engine adds streams
per the north star. Structured Streaming incrementalizes the same
Catalyst plans the batch queries use, so each streaming operator is
defined ONCE (the ``*_transform`` functions in
``queries/streaming_batch.py``) and run both ways; the test suite
asserts batch↔stream parity (SURVEY.md §5.3).
"""

from nchu_bigdata_spark.streaming.runner import (
    events_stream,
    run_events_stream,
    run_events_stream_to_parquet,
    STREAM_TRANSFORMS,
)

__all__ = [
    "events_stream",
    "run_events_stream",
    "run_events_stream_to_parquet",
    "STREAM_TRANSFORMS",
]
