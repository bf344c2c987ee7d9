"""r15 optimization internals: the adaptive build-side choice
(functions/scale.py::adaptive_build_side) and its dedup wiring.

Pins three properties:
- the decision: broadcast under the session threshold, shuffled-hash
  above it (and with broadcasting disabled via -1);
- the plan: the dedup expansion joins actually become BroadcastHashJoin
  at fixture scale (the r15 win) while a tiny threshold flips them
  back to ShuffledHashJoin;
- the output: both strategies emit identical rows (the broadcast is a
  physical choice only).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.functions.scale import (
    adaptive_build_side,
    broadcast_threshold_bytes,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    dedup,
)


def _executed_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_threshold_parsing_forms(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, expect in [
            ("10485760", 10 << 20),
            ("10m", 10 << 20),
            ("10MB", 10 << 20),
            ("1g", 1 << 30),
            ("-1", -1),
        ]:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert broadcast_threshold_bytes(spark) == expect, raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_build_side_decision_flips_on_threshold(spark):
    small = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    big = spark.range(1000).select(F.col("id").alias("k"))
    # fits: broadcast
    j = big.join(adaptive_build_side(small, 10 * 64), "k")
    assert "BroadcastHashJoin" in _executed_plan(j)
    # does not fit: shuffled hash
    j = big.join(adaptive_build_side(small, broadcast_threshold_bytes(spark) + 1), "k")
    assert "ShuffledHashJoin" in _executed_plan(j)
    # unknown size: shuffled hash
    j = big.join(adaptive_build_side(small, None), "k")
    assert "ShuffledHashJoin" in _executed_plan(j)
    # broadcasting disabled (-1): shuffled hash even for a tiny side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = big.join(adaptive_build_side(small, 10), "k")
        assert "ShuffledHashJoin" in _executed_plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_expand_rep_pairs_broadcasts_at_fixture_scale(spark, sf_correct):
    """The r15 plan change: at fixture scale the membership build
    sides of the expansion join are broadcast (the candidate frame
    never shuffles); with the threshold floored the same builder
    falls back to the shuffled-hash plan and emits identical rows."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        load_table,
    )

    docs = load_table(spark, sf_correct, "documents")
    groups = dedup._contract(dedup._token_sets(docs))
    rep_pairs = dedup._rep_jaccard_pairs(groups, dedup.JACCARD_THRESHOLD)
    expanded = dedup._expand_rep_pairs(rep_pairs, groups, dedup.JACCARD_THRESHOLD)
    plan = _executed_plan(expanded)
    assert "BroadcastHashJoin" in plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        # fresh groups frame: the stats memo rides the DataFrame object
        groups2 = dedup._contract(dedup._token_sets(docs))
        rep_pairs2 = dedup._rep_jaccard_pairs(groups2, dedup.JACCARD_THRESHOLD)
        shuffled = dedup._expand_rep_pairs(
            rep_pairs2, groups2, dedup.JACCARD_THRESHOLD
        )
        plan2 = _executed_plan(shuffled)
        assert "ShuffledHashJoin" in plan2
        assert shuffled.exceptAll(expanded).count() == 0
        assert expanded.exceptAll(shuffled).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_groups_stats_memoized_and_exact(spark, sf_correct):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        load_table,
    )

    docs = load_table(spark, sf_correct, "documents")
    groups = dedup._contract(dedup._token_sets(docs))
    n_reps, n_docs, n_tokens = dedup._groups_stats(groups)
    assert n_reps == groups.count()
    assert n_docs == docs.count()
    assert n_tokens == groups.agg(F.sum("set_size")).first()[0]
    # memoized on the frame object: second call returns the same tuple
    assert dedup._groups_stats(groups) == (n_reps, n_docs, n_tokens)


def test_contract_docs_matches_exploded_contract(spark, sf_correct):
    """The r15 per-row contraction (`_contract_docs`, one shuffle) must
    be row-identical to the exploded formulation
    (`_contract(_token_sets(docs))`, two shuffles) — word AND shingle
    tokenization."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        load_table,
    )

    docs = load_table(spark, sf_correct, "documents")
    for shingle_n in (None, 5):
        old = dedup._contract(dedup._token_sets(docs, shingle_n=shingle_n))
        new = dedup._contract_docs(docs, shingle_n)
        # names+types must match (nullability flags may differ: count(*)
        # vs size().cast — value-irrelevant)
        assert old.schema.simpleString() == new.schema.simpleString(), shingle_n
        assert new.exceptAll(old).count() == 0, shingle_n
        assert old.exceptAll(new).count() == 0, shingle_n


def test_pq_parallel_fits_match_sequential(spark, sf_correct):
    """_fit_pq_codebooks (thread-pooled) must reproduce the sequential
    fits bit-for-bit: same seeds, same subspace slices, same input
    partitioning."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.functions.scale import (
        checkpoint_df,
    )
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        similarity,
    )
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        load_table,
    )

    emb = checkpoint_df(load_table(spark, sf_correct, "embeddings"))
    dim = emb.select(F.size("embedding")).first()[0]
    m = similarity.PQ_M
    sub_d = dim // m
    parallel = similarity._fit_pq_codebooks(emb, m, similarity.PQ_K, sub_d)
    for mi, model in enumerate(parallel):
        sub = F.slice(
            F.col("embedding").cast("array<double>"), mi * sub_d + 1, sub_d
        )
        seq = KMeans(
            k=similarity.PQ_K,
            seed=7 + mi,
            maxIter=5,
            featuresCol=f"_sub{mi}",
            predictionCol=f"code_{mi}",
        ).fit(emb.select(array_to_vector(sub).alias(f"_sub{mi}")))
        got = [list(c) for c in parallel[mi].clusterCenters()]
        want = [list(c) for c in seq.clusterCenters()]
        # exact equality: same seed, same input values, same
        # partitioning — concurrency must not change a fit's result
        assert got == want, f"subspace {mi} centroids differ"
