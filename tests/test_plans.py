"""Plan-quality pins: pushdown, pruning, broadcast, codegen, and the
absence of Python row-UDFs in hot paths. These are the 100-TB
guarantees — a regression here is a performance bug even if results
stay correct."""

from __future__ import annotations

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    dashboard,
    relational,
    similarity,
    text,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.plans import (
    executed_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)


def test_q3_filters_pushed_to_scan(spark, sf_correct):
    """Raw-column predicates (segment, dates) must reach the parquet
    readers. (Derived-column filters, e.g. the medications price
    filter, correctly can't push below the derivation.)"""
    df = relational.q3_shipping_priority(spark, sf_correct)
    pushed = " ".join(pushed_filters(df))
    assert "c_mktsegment" in pushed and "l_shipdate" in pushed


def test_q13_medications_scan_prunes_to_derivation_inputs(spark, sf_correct):
    """The whole medications derivation must collapse into one
    scan+filter+project over only the part columns it needs."""
    df = dashboard.q13_ml_dataset(spark, sf_correct)
    schemas = read_schema_columns(df)
    assert len(schemas) == 1
    assert schemas[0] == {"p_partkey", "p_brand", "p_type", "p_size"}


def test_q6_prunes_columns(spark, sf_correct):
    """Q6 projects 5 columns; the part scan must not read all of part."""
    df = dashboard.q06_most_expensive(spark, sf_correct)
    schemas = read_schema_columns(df)
    assert schemas, "no parquet scan found"
    # medications derives from 5 part columns + retailprice never needed
    assert all("p_retailprice" not in s for s in schemas)


def test_tpch_q5_broadcasts_dimensions(spark, sf_correct):
    assert has_broadcast_join(relational.q5_region_revenue(spark, sf_correct))


def test_q1_single_shuffle(spark, sf_correct):
    """Q1 is scan→partial agg→exchange→final agg: exactly one shuffle."""
    plan = executed_plan(relational.q1_pricing_summary(spark, sf_correct))
    # one exchange for the groupBy; the orderBy on 6 rows may add one
    assert plan.count("Exchange hashpartitioning") == 1


def test_text_ops_are_codegen(spark, sf_correct):
    """Text pipeline must stay in whole-stage codegen (no Python UDFs)."""
    df = text.quality_score(spark, sf_correct)
    plan = executed_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert whole_stage_codegen_spans(df) >= 1


def test_knn_no_python_udf(spark, sf_correct):
    """Cosine fold is expression-level, not a UDF."""
    plan = executed_plan(similarity.knn_bruteforce(spark, sf_correct))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_topk_uses_take_ordered(spark, sf_correct):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject, not a global
    sort."""
    plan = executed_plan(dashboard.q06_most_expensive(spark, sf_correct))
    assert "TakeOrderedAndProject" in plan


def test_ngram_topk_plan(spark, sf_correct):
    """Corpus top-k n-grams: in-row n-gram build (no join anywhere in
    the plan), one aggregate, top-k as TakeOrderedAndProject — never a
    global sort."""
    plan = executed_plan(text.ngram_topk(spark, sf_correct))
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_events_funnel_no_global_sort(spark, sf_correct):
    """Funnel stages are frontier joins + aggregates on user_id; the
    plan must contain no Sort outside SortMergeJoin exchanges and no
    Python UDFs."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        events,
    )

    plan = executed_plan(events.funnel(spark, sf_correct))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q10_pushdown_broadcast_topk(spark, sf_correct):
    """Q10: date and returnflag filters reach the scans, nation
    broadcasts, and the top-20 is TakeOrderedAndProject."""
    df = relational.q10_returned_items(spark, sf_correct)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed and "l_returnflag" in pushed
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_q17_single_shuffle_window(spark, sf_correct):
    """Q17: the correlated scalar subquery decorrelates to ONE
    l_partkey exchange (the window), the brand filter broadcasts, and
    no second lineitem scan exists."""
    df = relational.q17_small_quantity_revenue(spark, sf_correct)
    plan = executed_plan(df)
    assert has_broadcast_join(df)
    # exactly one hash-partitioned exchange: the window's l_partkey
    # shuffle (the final single-row agg is a SinglePartition exchange)
    assert plan.count("hashpartitioning(l_partkey") == 1
    assert plan.count("Scan parquet") <= 2  # lineitem once + part once


def test_q18_semi_join_broadcast_no_fact_shuffle(spark, sf_correct):
    """Q18: the HAVING set semi-joins into orders via broadcast and the
    detail pass joins lineitem against a broadcast side — the fact
    table never shuffles on a join key."""
    df = relational.q18_large_volume_customers(spark, sf_correct)
    plan = executed_plan(df)
    assert "LeftSemi" in plan
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in plan


def test_ivf_pq_serving_plan_has_no_fit(spark, sf_correct, tmp_path):
    """The serving path is pure joins/windows over the frozen parquet
    index — no KMeans/ML stage, no embedding-wide scan besides the
    re-rank and query projections."""
    idx = str(tmp_path / "ivfpq_plan")
    df = similarity.ann_ivf_pq_serving(spark, sf_correct, index_dir=idx)
    plan = executed_plan(df)
    assert "KMeans" not in plan and "TreeAggregate" not in plan
    assert has_broadcast_join(df)


def test_topic_serving_plan_has_no_fit(spark, sf_correct, tmp_path):
    """The topic serving path transforms through FROZEN reloaded models
    — no IDF/KMeans fit stage, no Python row-UDF; one scan of
    documents feeds both the assignment and the label join."""
    idx = str(tmp_path / "topic_plan")
    df = text.topic_clusters_serving(spark, sf_correct, index_dir=idx)
    plan = executed_plan(df)
    assert "TreeAggregate" not in plan
    assert "BatchEvalPython" not in plan


def test_skew_join_splits_hot_partition(spark, sf_correct):
    """With skew thresholds lowered to fixture scale, AQE must split
    the planted hot key's partition: SortMergeJoin(skew=true) +
    AQEShuffleRead skewed in the FINAL adaptive plan.  (Correctness of
    the same entry is oracle-checked; this pins the plan.)"""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        events,
    )

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2048",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2048",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = events.skewed_hot_user_join(spark, sf_correct)
        df.collect()  # finalize the adaptive plan
        plan = executed_plan(df)
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # the AQEShuffleRead marker
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_grouping_sets_and_unpivot_single_expand_pass(spark, sf_correct):
    """GROUPING SETS and UNPIVOT must plan as ONE Expand each (single
    pass over the input), not unioned rescans."""
    gs = relational.grouping_sets_status_priority(spark, sf_correct)
    plan = executed_plan(gs)
    assert plan.count("Expand") >= 1
    assert plan.count("Scan parquet") == 1  # one orders scan, not three

    up = relational.unpivot_status_metrics(spark, sf_correct)
    plan2 = executed_plan(up)
    assert "Expand" in plan2
    assert plan2.count("Scan parquet") == 1


def test_q19_disjunction_pushed_no_shuffle(spark, sf_correct):
    """Q19's OR-of-band predicate must push into BOTH parquet scans
    (quantity bands into lineitem, brand/size bands into part) and the
    whole plan must run shuffle-free: broadcast join + single-partition
    aggregate."""
    df = relational.q19_banded_revenue(spark, sf_correct)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed and "p_brand" in pushed
    assert "Or(" in pushed  # the disjunction itself reached the scans
    assert has_broadcast_join(df)
    assert "Exchange hashpartitioning" not in executed_plan(df)


def test_q7_nation_pair_pushed_to_dims(spark, sf_correct):
    """Q7's symmetric nation-pair predicate is pre-split into IN
    filters on each nation dim scan, and the 2-year window reaches the
    lineitem scan."""
    df = relational.q7_volume_shipping(spark, sf_correct)
    pushed = " ".join(pushed_filters(df))
    assert pushed.count("In(n_name") >= 2
    assert "l_shipdate" in pushed
    assert has_broadcast_join(df)


def test_q2_window_decorrelation_two_exchanges(spark, sf_correct):
    """Q2's correlated MIN subquery decorrelates to a window over the
    derived partsupp: the partsupp groupBy plus the window repartition
    are the ONLY hash exchanges — no second partsupp derivation, no
    join back for the min."""
    df = relational.q2_min_cost_supplier(spark, sf_correct)
    plan = executed_plan(df)
    assert has_broadcast_join(df)
    assert plan.count("Exchange hashpartitioning") <= 2
    # one lineitem scan: the min-cost filter must not rescan partsupp
    assert plan.count("Scan parquet") <= 5


def test_q21_aggregate_rewrite_no_self_join(spark, sf_correct):
    """Q21's EXISTS/NOT-EXISTS self-correlation must plan as the
    per-order aggregate rewrite: no sort-merge self-join of lineitem
    on (orderkey, suppkey), qualifying orders broadcast back."""
    df = relational.q21_waiting_suppliers(spark, sf_correct)
    plan = executed_plan(df)
    assert has_broadcast_join(df)
    # lineitem appears in the lo build twice (per-order agg + late
    # rows) but never more — the classic plan needs three passes
    assert plan.count("Scan parquet") <= 5
    assert "TakeOrderedAndProject" in plan


def test_q16_blacklist_is_anti_join(spark, sf_correct):
    """Q16's NOT IN blacklist must plan as a broadcast anti-join, not
    a nested-loop or in-subquery rescan."""
    plan = executed_plan(
        relational.q16_supplier_part_counts(spark, sf_correct)
    )
    assert "LeftAnti" in plan


def test_q20_nested_in_is_semi_join(spark, sf_correct):
    """Q20's nested IN chain must surface as a left-semi join into
    supplier (each IN level joins without row duplication)."""
    plan = executed_plan(relational.q20_surplus_suppliers(spark, sf_correct))
    assert "LeftSemi" in plan


def test_lateral_limit_decorrelates_to_window_group_limit(spark, sf_correct):
    """The correlated LATERAL ... LIMIT 2 must decorrelate: row_number
    window with a WindowGroupLimit (per-task top-2 pruning BEFORE the
    exchange) feeding a plain equi-join — never a per-row nested-loop
    or cartesian execution of the subquery."""
    df = relational.lateral_top2_orders(spark, sf_correct)
    plan = executed_plan(df)
    assert "WindowGroupLimit" in plan
    assert "row_number" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_join_strategy_hints_are_honored(spark, sf_correct):
    """The per-join strategy escape hatch: hints override the
    planner's size-based choice — broadcast / shuffle-hash / 
    sort-merge each produce their operator for the same join."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        load_table,
    )

    orders = load_table(spark, sf_correct, "orders")
    customer = load_table(spark, sf_correct, "customer")

    def plan_with(hint: str) -> str:
        j = orders.join(customer.hint(hint), orders.o_custkey == customer.c_custkey)
        return executed_plan(j)

    assert "BroadcastHashJoin" in plan_with("broadcast")
    assert "ShuffledHashJoin" in plan_with("shuffle_hash")
    assert "SortMergeJoin" in plan_with("merge")


def test_hybrid_rrf_serving_plan_has_no_fit_no_exact_scan(spark, sf_correct):
    """The serving hybrid's dense arm rides the frozen IVF-PQ index:
    no KMeans/ML fit stage, no query×corpus exact-scan cartesian —
    the only cross joins left are broadcast scalar/probe sides."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        retrieval,
    )

    df = retrieval.hybrid_rrf_serving(spark, sf_correct)
    plan = executed_plan(df)
    assert "KMeans" not in plan and "TreeAggregate" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert has_broadcast_join(df)
    # r9: the lexical arm rides the frozen postings index — no text
    # tokenization (explode-of-split) anywhere at query time
    assert "explode" not in plan.lower()
