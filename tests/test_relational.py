"""Join/set-op/window pack invariants at correctness scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    events,
    relational,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    load_table,
)


def test_all_queries_have_oracles():
    assert set(relational.ORACLES) == set(relational.QUERIES)
    # approx sketches are rows-only by design; everything else oracle-checked
    assert set(events.QUERIES) - set(events.ORACLES) == {
        "events_approx_distinct_users",
        "events_hll_daily_users",
        "events_hll_overlap",
    }


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_runs_nonempty(spark, sf_correct, name):
    assert relational.QUERIES[name](spark, sf_correct).count() > 0


@pytest.mark.parametrize("name", sorted(events.QUERIES))
def test_events_runs_nonempty(spark, sf_correct, name):
    assert events.QUERIES[name](spark, sf_correct).count() > 0


def test_semi_anti_partition_customers(spark, sf_correct):
    """semi ∪ anti = all customers, disjoint."""
    total = load_table(spark, sf_correct, "customer").count()
    semi = relational.semi_urgent_customers(spark, sf_correct).count()
    anti = relational.anti_no_urgent_customers(spark, sf_correct).count()
    assert semi + anti == total


def test_left_join_preserves_all_orders(spark, sf_correct):
    orders = load_table(spark, sf_correct, "orders").count()
    assert relational.left_join_order_linecounts(spark, sf_correct).count() == orders


def test_top3_at_most_three_per_customer(spark, sf_correct):
    df = relational.top3_orders_per_customer(spark, sf_correct)
    over = df.groupBy("o_custkey").count().filter(F.col("count") > 3).count()
    assert over == 0


def test_rollup_grand_total(spark, sf_correct):
    rows = relational.rollup_status_priority(spark, sf_correct).collect()
    grand = [r for r in rows if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(grand) == 1
    assert grand[0].orders == load_table(spark, sf_correct, "orders").count()


def test_sliding_window_double_counts(spark, sf_correct):
    """Each event lands in exactly 2 windows of the 10min/5min slide."""
    ev_total = load_table(spark, sf_correct, "events").count()
    slid = events.sliding_10min_every_5(spark, sf_correct)
    assert slid.agg(F.sum("events")).collect()[0][0] == 2 * ev_total


def test_sessionization_gap_invariant(spark, sf_correct):
    """No session spans a gap: every session's span ≤ events*gap."""
    df = events.sessionization(spark, sf_correct)
    bad = df.filter(
        F.col("duration_sec") > (F.col("events") - 1) * events.SESSION_GAP_SEC
    ).count()
    assert bad == 0


def test_q5_broadcasts_dims(spark, sf_correct):
    plan = relational.q5_region_revenue(spark, sf_correct)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scd2_periods_tile_and_single_current(spark, sf_correct):
    """SCD2 laws: per customer the periods tile (valid_to of version n
    equals valid_from of version n+1), versions are dense from 1,
    exactly one open row per customer, and no two consecutive periods
    carry the same status (else they'd be one period)."""
    hist = relational.scd2_status_history(spark, sf_correct).cache()
    per = hist.groupBy("custkey").agg(
        F.count("*").alias("n"),
        F.min("version").alias("vmin"),
        F.max("version").alias("vmax"),
        F.sum(F.col("is_current").cast("int")).alias("open_rows"),
    )
    bad = per.filter(
        (F.col("vmin") != 1)
        | (F.col("vmax") != F.col("n"))
        | (F.col("open_rows") != 1)
    ).count()
    assert bad == 0
    # pair version n with version n+1: row v re-keys as v-1
    nxt = hist.select(
        "custkey",
        (F.col("version") - 1).alias("version"),
        F.col("valid_from").alias("next_from"),
        F.col("status").alias("next_status"),
    )
    j = hist.join(nxt, ["custkey", "version"])
    assert j.filter(F.col("valid_to") != F.col("next_from")).count() == 0
    assert j.filter(F.col("status") == F.col("next_status")).count() == 0
    hist.unpersist()


def test_scd2_single_exchange(spark, sf_correct):
    """Both window passes share the custkey partitioning: the whole
    history build must plan exactly one shuffle."""
    plan = (
        relational.scd2_status_history(spark, sf_correct)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


# --------------------------------------------------------------------------
# Declarative data-quality constraints (operators/constraints.py)
# --------------------------------------------------------------------------


def test_dq_audit_single_pass_and_firing_rule(spark, sf_correct):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        constraints,
    )

    [row] = constraints.audit_orders(spark, sf_correct).collect()
    # clean fixture: structural rules all pass
    assert row.null_orderkey == 0 and row.null_custkey == 0
    assert row.bad_status == 0 and row.nonpositive_price == 0
    assert row.duplicate_orderkeys == 0 and row.orphan_custkeys == 0
    # the deliberately-tight range rule fires (proves counting works)
    assert row.price_above_400k > 0


def test_dq_rules_detect_injected_violations(spark):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        constraints,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (1, -5.0), (None, 3.0), (4, None)],
        "id long, v double",
    )
    [row] = constraints.check_rows(
        df,
        [
            constraints.RowRule("null_id", F.col("id").isNotNull()),
            constraints.RowRule("bad_v", F.col("v") > 0),
        ],
    ).collect()
    assert row.null_id == 1
    # NULL predicate is a violation: v=None fails `v > 0`
    assert row.bad_v == 2
    assert constraints.count_duplicate_keys(df, ["id"]) == 1
    parent = spark.createDataFrame([(1,), (4,)], "pk long")
    # id=None and the non-parent rows orphan; NULL fk counts as orphan
    orphans = constraints.count_orphans(df, parent, "id", "pk")
    assert orphans == 1  # the NULL id row (1,1,4 all have parents)
