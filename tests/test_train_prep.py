"""As-of join + training-data-prep operator invariants (round 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    composites,
    relational,
    text,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    load_table,
)


# --------------------------------------------------------------------------
# as-of join
# --------------------------------------------------------------------------


def test_asof_matches_bruteforce_argmax(spark, sf_correct):
    """The union-merge formulation must equal the naive inequality-join
    argmax (max_by over (o_orderdate, o_orderkey)) row for row — and
    the matches must be non-degenerate (orders genuinely precede
    events in this fixture)."""
    out = {
        r.event_id: (r.last_order_key, r.last_order_date_s)
        for r in relational.asof_latest_order(spark, sf_correct).collect()
    }
    events = load_table(spark, sf_correct, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_s")
    )
    orders = load_table(spark, sf_correct, "orders").select(
        "o_orderkey", "o_custkey", F.unix_timestamp("o_orderdate").alias("od_s")
    )
    brute = (
        events.join(
            orders,
            (F.col("o_custkey") == F.col("user_id"))
            & (F.col("od_s") <= F.col("ts_s")),
            "left",
        )
        .groupBy("event_id")
        .agg(
            F.max_by("o_orderkey", F.struct("od_s", "o_orderkey")).alias("ok"),
            F.max("od_s").alias("od"),
        )
    )
    expected = {r.event_id: (r.ok, r.od) for r in brute.collect()}
    assert out == expected
    assert sum(1 for v in out.values() if v[0] is not None) > 0.9 * len(out)


def test_asof_tiebreak_is_max_orderkey(spark, sf_correct):
    """Day-granular order dates tie often; the matched order must be
    the max o_orderkey among the user's orders on the matched date."""
    out = relational.asof_latest_order(spark, sf_correct).filter(
        F.col("last_order_key").isNotNull()
    )
    orders = load_table(spark, sf_correct, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.unix_timestamp("o_orderdate").alias("last_order_date_s"),
        F.col("o_orderkey").alias("tie_key"),
    )
    violations = (
        out.join(orders, ["user_id", "last_order_date_s"])
        .filter(F.col("tie_key") > F.col("last_order_key"))
        .count()
    )
    assert violations == 0


def test_asof_single_shuffle_no_join(spark, sf_correct):
    """The plan is the merge-scan: no join operator at all, one window
    over the unioned inputs."""
    plan = (
        relational.asof_latest_order(spark, sf_correct)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Window" in plan


# --------------------------------------------------------------------------
# sequence packing
# --------------------------------------------------------------------------


def test_pack_offsets_are_contiguous_partition(spark, sf_correct):
    """Offsets tile [0, total_tokens) exactly: sorted by start_offset,
    each doc begins where the previous one ended."""
    rows = sorted(
        (r.start_offset, r.n_tokens)
        for r in text.pack_sequences(spark, sf_correct).collect()
    )
    pos = 0
    for start, n in rows:
        assert start == pos
        assert n >= 1
        pos = start + n
    docs = load_table(spark, sf_correct, "documents").count()
    assert len(rows) == docs


def test_pack_seq_assignment_consistent(spark, sf_correct):
    bad = (
        text.pack_sequences(spark, sf_correct)
        .filter(
            (F.col("first_seq") != F.floor(F.col("start_offset") / text.SEQ_BUDGET))
            | (F.col("last_seq") < F.col("first_seq"))
            | (F.col("n_seqs") != F.col("last_seq") - F.col("first_seq") + 1)
        )
        .count()
    )
    assert bad == 0


def test_pack_no_unpartitioned_window_over_docs(spark, sf_correct):
    """The doc-level cumsum must run partitioned (by shard); the only
    global window is over the 16-row shard aggregate."""
    plan = (
        text.pack_sequences(spark, sf_correct)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every Window node either carries a partition spec or sits above
    # the 16-row aggregate — assert the doc-side window is partitioned
    assert "Window [sum(n_tokens" in plan
    doc_windows = [
        ln for ln in plan.splitlines() if "Window [sum(n_tokens" in ln
    ]
    assert any("shard" in ln for ln in doc_windows)


# --------------------------------------------------------------------------
# repetition metrics
# --------------------------------------------------------------------------


def test_repetition_bounds(spark, sf_correct):
    df = text.repetition_metrics(spark, sf_correct)
    bad = df.filter(
        (F.col("distinct_ratio") <= 0)
        | (F.col("distinct_ratio") > 1)
        | (F.col("top_token_frac") > F.col("top2_token_frac"))
        | (F.col("top2_token_frac") > 1)
        | (F.col("top_token_frac") * F.col("distinct_tokens") < 1.0 - 1e-9)
        | (F.col("distinct_tokens") > F.col("total_tokens"))
    ).count()
    assert bad == 0
    assert df.count() == load_table(spark, sf_correct, "documents").count()


# --------------------------------------------------------------------------
# contamination screen
# --------------------------------------------------------------------------


def test_contamination_excludes_eval_and_bounds(spark, sf_correct):
    df = text.contamination_overlap(spark, sf_correct)
    assert df.filter(F.col("doc_id") < text.EVAL_SET_MAX_ID).count() == 0
    bad = df.filter(
        (F.col("eval_overlap") > F.col("n_shingles"))
        | (F.col("eval_overlap") < 0)
        | (
            F.col("contaminated")
            != (F.col("eval_overlap") * 2 >= F.col("n_shingles"))
        )
    ).count()
    assert bad == 0


def test_contamination_eval_side_broadcast(spark, sf_correct):
    """The corpus⋈eval-shingle join must broadcast the eval side — the
    corpus never shuffles on shingle."""
    plan = (
        text.contamination_overlap(spark, sf_correct)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin [shingle" in plan


# --------------------------------------------------------------------------
# composite wiring
# --------------------------------------------------------------------------


def test_train_prep_composite_covers_all_docs(spark, sf_correct):
    df = composites.text_train_prep(spark, sf_correct)
    docs = load_table(spark, sf_correct, "documents").count()
    assert df.count() == docs
    # packing and repetition tokenize independently; counts must agree
    assert df.filter(F.col("n_tokens") != F.col("total_tokens")).count() == 0
