"""Composite driver entries must stay consistent with the operators they
package (operators/composites.py) — guards the driver-window packaging
against drift in either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    composites,
    dashboard,
    events,
    multimodal,
    relational,
    text,
)

# composite name -> (tag column, {tag value: component builder})
_UNIONS = {
    "join_semi_anti_urgent": (
        "op",
        {
            "semi": relational.semi_urgent_customers,
            "anti": relational.anti_no_urgent_customers,
        },
    ),
    "setop_intersect_except": (
        "op",
        {
            "intersect": relational.intersect_building_urgent,
            "except": relational.except_customers_without_open_orders,
        },
    ),
    "agg_rollup_cube": (
        "op",
        {
            "rollup": relational.rollup_status_priority,
            "cube": relational.cube_status_priority,
        },
    ),
    "window_top3_running": (
        "op",
        {
            "top3": relational.top3_orders_per_customer,
            "running": relational.running_customer_revenue,
        },
    ),
    "events_windowed_counts": (
        "kind",
        {
            "tumbling": events.tumbling_5min,
            "sliding": events.sliding_10min_every_5,
        },
    ),
    "events_hourly_daily": (
        "grain",
        {
            "hourly": events.hourly_user_activity,
            "daily": events.daily_rollup_from_hourly,
        },
    ),
    "mm_frame_audio": (
        "modality",
        {
            "video": multimodal.frame_sample,
            "audio": multimodal.audio_rms_windows,
        },
    ),
}


@pytest.mark.parametrize("name", sorted(_UNIONS))
def test_union_composites_partition_into_components(spark, sf_correct, name):
    tag_col, parts = _UNIONS[name]
    composite = composites.QUERIES[name](spark, sf_correct)
    by_tag = {
        r[tag_col]: r.n
        for r in composite.groupBy(tag_col).agg(F.count("*").alias("n")).collect()
    }
    assert set(by_tag) == set(parts)
    for tag, fn in parts.items():
        assert by_tag[tag] == fn(spark, sf_correct).count()


def test_join_composites_are_one_row_per_doc(spark, sf_correct):
    meta = multimodal.image_metadata(spark, sf_correct).count()
    combo = composites.mm_image_meta_resize(spark, sf_correct)
    assert combo.count() == meta
    assert combo.select("doc_id").distinct().count() == meta

    tok = text.token_stats(spark, sf_correct).count()
    profile = composites.text_doc_profile(spark, sf_correct)
    assert profile.count() == tok
    # the joined quality/fingerprint columns arrived intact
    assert {"q_tokens", "verdict", "fingerprint", "canon_len"} <= set(profile.columns)


def test_q01_approx_median_close_to_exact(spark, sf_correct):
    exact = dashboard.q01_overview(spark, sf_correct).collect()[0]
    approx = dashboard.q01_overview(spark, sf_correct, approx_median=True).collect()[0]
    assert approx.total_medications == exact.total_medications
    # rounded medians from a 1/10000-accuracy sketch on ~1600 rows: equal
    assert abs(approx.median_price_DA - exact.median_price_DA) <= 1.0
