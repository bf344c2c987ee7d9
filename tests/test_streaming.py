"""Batch/stream parity via Trigger.AvailableNow (SURVEY.md §7a)."""

from __future__ import annotations

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    events as batch_events,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    load_table,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.streaming import (
    jobs,
)


def test_stream_tumbling_matches_batch(spark, sf_dir):
    stream = jobs.events_stream(spark, sf_dir)
    assert stream.isStreaming
    result = jobs.run_available_now(
        jobs.tumbling_counts_stream(stream), "t_tumbling"
    )
    got = {
        (r.window_start, r.event_type): r.events for r in result.collect()
    }
    expected = {
        (r.window_start, r.event_type): r.events
        for r in batch_events.tumbling_5min(spark, sf_dir)
        .select("window_start", "event_type", "events")
        .collect()
    }
    assert got == expected


def test_stream_dedup_within_watermark(spark, sf_dir):
    stream = jobs.events_stream(spark, sf_dir)
    result = jobs.run_available_now(
        jobs.dedup_within_watermark_stream(stream), "t_dedup"
    )
    n_events = load_table(spark, sf_dir, "events").count()
    # fixture has unique event_ids → dedup is lossless
    assert result.count() == n_events
