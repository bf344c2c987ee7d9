"""Extended operator invariants: as-of attribution, approx distinct,
range join, scalable encoding."""

from __future__ import annotations

from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    encoding,
    events,
    relational,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    load_table,
)


def test_attribution_click_strictly_before_purchase(spark, sf_correct):
    df = events.purchase_attribution(spark, sf_correct)
    # attributed click must precede the purchase (or be absent)
    assert df.filter(F.col("gap_sec") < 0).count() == 0
    # every purchase appears exactly once
    n_purchases = (
        load_table(spark, sf_correct, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert df.count() == n_purchases


def test_approx_distinct_within_rsd(spark, sf_correct):
    ev = load_table(spark, sf_correct, "events")
    exact = {
        r.event_type: r.users
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in events.approx_distinct_users(spark, sf_correct).collect()
    }
    for t, exact_n in exact.items():
        assert abs(approx[t] - exact_n) / exact_n < 0.10  # 2% rsd, wide margin


def test_range_join_covers_all_orders(spark, sf_correct):
    total = load_table(spark, sf_correct, "orders").count()
    tiers = relational.range_join_price_tiers(spark, sf_correct)
    assert tiers.agg(F.sum("orders")).collect()[0][0] == total


def test_range_join_broadcasts(spark, sf_correct):
    plan = (
        relational.range_join_price_tiers(spark, sf_correct)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_encoding_is_dense_rank_equivalent(spark, sf_correct):
    """Broadcast-join encoding must equal the reference's unpartitioned
    dense_rank (same ordinals) — checked against a direct dense_rank
    computed over the same frame."""
    from pyspark.sql import Window

    base = encoding.q13_ml_dataset(spark, sf_correct)
    direct = base.withColumn(
        "form_idx_direct",
        (F.dense_rank().over(Window.orderBy("form")) - 1).cast("double"),
    ).select("form", "form_idx_direct")
    ours = encoding.ml_feature_encoding(spark, sf_correct)
    # join on form: each form value must map to one ordinal, equal in both
    direct_map = {r.form: r.form_idx_direct for r in direct.distinct().collect()}
    med = encoding.q13_ml_dataset(spark, sf_correct).select("form").distinct()
    ours_map = {
        r.form: r.form_idx
        for r in encoding.encode_column(med, "form", "form_idx").collect()
    }
    assert {k: float(v) for k, v in ours_map.items()} == direct_map


def test_encoding_no_unpartitioned_window_on_fact(spark, sf_correct):
    """The scale fix (SURVEY §4.3.1): the plan must not sort the fact
    table into a single partition (no global Window over the base); the
    windows run over tiny distinct sets instead."""
    df = encoding.ml_feature_encoding(spark, sf_correct)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_events_funnel_monotone(spark, sf_correct):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        events as ev_ops,
    )

    rows = {r.stage: r.users for r in ev_ops.funnel(spark, sf_correct).collect()}
    assert set(rows) == set(ev_ops.FUNNEL_STAGES)
    # ordered funnel is monotone non-increasing, and the fixture has
    # activity at every stage
    assert rows["view"] >= rows["click"] >= rows["purchase"]
    assert rows["purchase"] > 0


def test_hll_overlap_bounds_against_exact(spark, sf_correct):
    """Inclusion-exclusion overlap estimates land within HLL tolerance
    of the exact pairwise intersections, and the sketch identities
    hold (union ≤ a+b, union ≥ max(a,b) within error)."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        events as ev_ops,
    )
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        load_table,
    )

    got = {
        (r.type_a, r.type_b): r.users_overlap_est
        for r in ev_ops.hll_audience_overlap(spark, sf_correct).collect()
    }
    assert len(got) > 0
    ev = load_table(spark, sf_correct, "events")
    users = {
        r.event_type: set()
        for r in ev.select("event_type").distinct().collect()
    }
    for r in ev.select("event_type", "user_id").distinct().collect():
        users[r.event_type].add(r.user_id)
    for (ta, tb), est in got.items():
        exact = len(users[ta] & users[tb])
        # HLL default error ~1.6%/side; inclusion-exclusion compounds 3
        # estimates, allow 10% + small absolute slack
        assert abs(est - exact) <= max(10, 0.10 * exact), (ta, tb, est, exact)
