"""Structured Streaming surface (SURVEY.md §2.10).

The reference's "streaming" is incremental batch (progress files +
anti-joins, `abstract_preprocessor.py:122-140`); that path is served by
``sources.manifest``.  This package is the true streaming engine surface:
file-source ingest with ``Trigger.AvailableNow`` (the faithful
re-expression of the reference's daily-cron intent, `main.py:103`),
event-time windows with watermarks for late data, and session windows.

Every streaming aggregation here has a batch twin in
``plans.window_queries``; tests/test_streaming.py asserts streaming ==
batch on the same input, which is exactly the guarantee Structured
Streaming's unified model is supposed to give.
"""

from swisscourtrulingcorpus_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    tumbling_counts_stream,
    session_counts_stream,
    run_available_now,
    streaming_dedup,
)
