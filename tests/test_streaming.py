"""Structured Streaming == batch equivalence (the unified-model check).

Runs the streaming jobs with Trigger.AvailableNow over the events
fixture and asserts the finished result equals the oracle-verified
batch query on the same data.
"""

from __future__ import annotations

import pandas as pd


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    from swisscourtrulingcorpus_spark.plans.window_queries import tumbling_hourly
    from swisscourtrulingcorpus_spark.streaming import (
        read_events_stream,
        run_available_now,
        tumbling_counts_stream,
    )

    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    got = run_available_now(
        tumbling_counts_stream(stream), "t_tumbling_counts"
    )
    want = tumbling_hourly(spark, sf_dir)
    pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(want))


def test_streaming_sessions_equal_batch(spark, sf_dir):
    from swisscourtrulingcorpus_spark.plans.window_queries import session_windows
    from swisscourtrulingcorpus_spark.streaming import (
        read_events_stream,
        run_available_now,
        session_counts_stream,
    )

    got = run_available_now(
        session_counts_stream(read_events_stream(spark, sf_dir)),
        "t_session_counts",
    )
    want = session_windows(spark, sf_dir).select(
        "user_id", "session_start", "n_events"
    )
    pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(want))


def test_incremental_manifest(spark, sf_dir):
    from swisscourtrulingcorpus_spark.streaming.jobs import incremental_event_counts

    # first run: everything is new
    counts1, manifest = incremental_event_counts(spark, sf_dir, None)
    total1 = sum(r.cnt for r in counts1.collect())
    # second run with the manifest: nothing is new
    counts2, manifest2 = incremental_event_counts(spark, sf_dir, manifest)
    assert counts2.count() == 0
    assert total1 > 0
    assert manifest2.count() == manifest.count()
