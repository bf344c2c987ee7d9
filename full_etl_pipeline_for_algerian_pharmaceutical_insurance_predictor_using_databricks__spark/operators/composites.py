"""Composite driver entries: tag-unions / per-doc joins of sibling
operators so every oracle-bearing operator fits the driver's 50-entry
correctness window.

The driver's gate (CORRECTNESS_r{N}.json) checks only the first 50
``queries()`` entries; round 1 had 60 oracle-bearing entries, leaving
similarity/multimodal/sampling/encoding unproven.  Each composite here
UNION ALLs (or joins, for per-doc metrics) the outputs of TWO OR THREE
existing operators with a discriminator column, so one driver row
value-checks both underlying plans.  The underlying single-operator
builders stay exported from their home modules and keep their own
pytest coverage and PLANS.md entries — composites add no new operator
logic, only packaging.

Plan-shape preservation: a union of two queries keeps both physical
subtrees side by side (e.g. ``join_semi_anti_urgent`` contains one
LeftSemi and one LeftAnti BroadcastHashJoin), so `.explain` evidence
for each operator is still inspectable through the composite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import curation, dashboard, events, multimodal, relational, text

__all__ = ["QUERIES", "ORACLES"]


def _tag(df: DataFrame, name: str, value: str) -> DataFrame:
    return df.withColumn(name, F.lit(value))


# --- dashboard --------------------------------------------------------------

def med_q01_q07_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Query 1 (global overview stats) × Query 7
    (affordability pcts) — both single-row global aggregates, composed
    by 1×1 cross join (Spark broadcasts the single row)."""
    q01 = dashboard.q01_overview(spark, sf_dir)
    q07 = dashboard.q07_affordability(spark, sf_dir)
    return q01.crossJoin(q07)


_Q01_Q07_SQL = f"""
SELECT * FROM ({dashboard.ORACLES["med_q01_overview"]}) a
CROSS JOIN ({dashboard.ORACLES["med_q07_affordability"]}) b
"""


def med_q04_q12_breakdowns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Query 4 (price-segment breakdown) + Query 12 (coverage
    breakdown) in one entry: both are CASE-bucket → count/avg/pct-of-
    total shapes, tag-unioned on a common (bucket, count, avg, pct)
    schema."""
    q04 = dashboard.q04_price_segmentation(spark, sf_dir).select(
        F.col("price_category").alias("bucket"),
        "medications_count",
        "avg_price_DA",
        F.col("market_pct").alias("pct"),
    )
    q12 = dashboard.q12_coverage_status(spark, sf_dir).select(
        F.col("coverage_status").alias("bucket"),
        "medications_count",
        "avg_price_DA",
        F.col("percentage").alias("pct"),
    )
    return _tag(q04, "op", "q04_segmentation").unionByName(
        _tag(q12, "op", "q12_coverage")
    )


_Q04_Q12_SQL = f"""
SELECT 'q04_segmentation' AS op, price_category AS bucket,
       medications_count, avg_price_DA, market_pct AS pct
FROM ({dashboard.ORACLES["med_q04_price_segmentation"]})
UNION ALL
SELECT 'q12_coverage' AS op, coverage_status AS bucket,
       medications_count, avg_price_DA, percentage AS pct
FROM ({dashboard.ORACLES["med_q12_coverage_status"]})
"""


# --- relational -------------------------------------------------------------

def join_semi_anti_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti join in one entry (identical schemas; the
    two partitions of customers by "has a 1-URGENT order")."""
    semi = _tag(relational.semi_urgent_customers(spark, sf_dir), "op", "semi")
    anti = _tag(relational.anti_no_urgent_customers(spark, sf_dir), "op", "anti")
    return semi.unionByName(anti)


_SEMI_ANTI_SQL = f"""
SELECT 'semi' AS op, * FROM ({relational.ORACLES["join_semi_urgent_customers"]})
UNION ALL
SELECT 'anti' AS op, * FROM ({relational.ORACLES["join_anti_no_urgent_customers"]})
"""


def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT in one entry (both emit a custkey set)."""
    inter = _tag(relational.intersect_building_urgent(spark, sf_dir), "op", "intersect")
    exc = _tag(
        relational.except_customers_without_open_orders(spark, sf_dir), "op", "except"
    )
    return inter.unionByName(exc)


_INTERSECT_EXCEPT_SQL = f"""
SELECT 'intersect' AS op, * FROM ({relational.ORACLES["setop_intersect_building_urgent"]})
UNION ALL
SELECT 'except' AS op, * FROM ({relational.ORACLES["setop_except_customers_without_open_orders"]})
"""


def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE grouping sets in one entry (identical schemas)."""
    ru = _tag(relational.rollup_status_priority(spark, sf_dir), "op", "rollup")
    cu = _tag(relational.cube_status_priority(spark, sf_dir), "op", "cube")
    return ru.unionByName(cu)


_ROLLUP_CUBE_SQL = f"""
SELECT 'rollup' AS op, * FROM ({relational.ORACLES["agg_rollup_status_priority"]})
UNION ALL
SELECT 'cube' AS op, * FROM ({relational.ORACLES["agg_cube_status_priority"]})
"""


def window_top3_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked top-k window + running-sum/lag window in one entry;
    columns unique to one side are null on the other."""
    top3 = _tag(relational.top3_orders_per_customer(spark, sf_dir), "op", "top3")
    run = _tag(relational.running_customer_revenue(spark, sf_dir), "op", "running")
    return top3.unionByName(run, allowMissingColumns=True)


_TOP3_RUNNING_SQL = f"""
SELECT 'top3' AS op, o_custkey, o_orderkey, o_totalprice, rn,
       CAST(NULL AS TIMESTAMP) AS o_orderdate,
       CAST(NULL AS DOUBLE) AS running_revenue,
       CAST(NULL AS DOUBLE) AS prev_totalprice
FROM ({relational.ORACLES["window_top3_orders_per_customer"]})
UNION ALL
SELECT 'running' AS op, o_custkey, o_orderkey, o_totalprice,
       CAST(NULL AS INTEGER) AS rn,
       o_orderdate, running_revenue, prev_totalprice
FROM ({relational.ORACLES["window_running_customer_revenue"]})
"""


# --- events -----------------------------------------------------------------

def events_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (5-min, per event_type, with value sums) + sliding
    (10-min every 5) window aggregates in one entry."""
    tm = _tag(events.tumbling_5min(spark, sf_dir), "kind", "tumbling")
    sl = _tag(events.sliding_10min_every_5(spark, sf_dir), "kind", "sliding")
    return tm.unionByName(sl, allowMissingColumns=True)


_WINDOWED_COUNTS_SQL = f"""
SELECT 'tumbling' AS kind, window_start, event_type, events, total_value
FROM ({events.ORACLES["events_tumbling_5min"]})
UNION ALL
SELECT 'sliding' AS kind, window_start,
       CAST(NULL AS VARCHAR) AS event_type, events,
       CAST(NULL AS DOUBLE) AS total_value
FROM ({events.ORACLES["events_sliding_10min"]})
"""


def events_hourly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly activity + the daily rollup COMPOSED FROM the hourly tier
    (pre-aggregate composition proof) in one entry."""
    hr = (
        events.hourly_user_activity(spark, sf_dir)
        .withColumnRenamed("hour_start", "bucket_start")
    )
    dy = (
        events.daily_rollup_from_hourly(spark, sf_dir)
        .withColumnRenamed("day_start", "bucket_start")
    )
    return _tag(hr, "grain", "hourly").unionByName(
        _tag(dy, "grain", "daily"), allowMissingColumns=True
    )


_HOURLY_DAILY_SQL = f"""
SELECT 'hourly' AS grain, hour_start AS bucket_start, events,
       active_users, distinct_types,
       CAST(NULL AS DOUBLE) AS total_value,
       CAST(NULL AS BIGINT) AS hours_active
FROM ({events.ORACLES["events_hourly_activity"]})
UNION ALL
SELECT 'daily' AS grain, day_start AS bucket_start, events,
       CAST(NULL AS BIGINT) AS active_users,
       CAST(NULL AS BIGINT) AS distinct_types,
       total_value, hours_active
FROM ({events.ORACLES["events_daily_rollup_from_hourly"]})
"""


# --- text -------------------------------------------------------------------

def text_train_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data prep profile: sequence-packing layout ⋈ repetition
    metrics ⋈ benchmark-contamination screen ⋈ context-window chunking
    (per-doc aggregate), 1:1 on doc_id (left join for contamination —
    eval docs and sub-n-gram docs have no screen row).  `n_tokens`
    (packing) and `total_tokens` (repetition) count the same
    tokenization from two independent plans — a built-in cross-check
    the oracle hashes both of; the chunk aggregate value-checks the
    chunking plan's layout arithmetic through the driver row (the
    per-chunk text rows are oracle-checked by `text_chunk_windows`)."""
    pack = text.pack_sequences(spark, sf_dir)
    rep = text.repetition_metrics(spark, sf_dir)
    cont = text.contamination_overlap(spark, sf_dir)
    chunks = (
        curation.chunk_windows(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("chunk_tokens").alias("chunk_token_sum"),
        )
    )
    return (
        pack.join(rep, "doc_id")
        .join(cont, "doc_id", "left")
        .join(chunks, "doc_id")
    )


_TRAIN_PREP_SQL = f"""
SELECT p.*,
       r.total_tokens, r.distinct_tokens, r.distinct_ratio,
       r.top_token_frac, r.top2_token_frac,
       c.n_shingles, c.eval_overlap, c.overlap_frac, c.contaminated,
       ch.n_chunks, ch.chunk_token_sum
FROM ({text.ORACLES["text_pack_sequences"]}) p
JOIN ({text.ORACLES["text_repetition_metrics"]}) r USING (doc_id)
LEFT JOIN ({text.ORACLES["text_contamination"]}) c USING (doc_id)
JOIN (
    SELECT doc_id, COUNT(*) AS n_chunks,
           CAST(SUM(chunk_tokens) AS BIGINT) AS chunk_token_sum
    FROM ({curation.ORACLES["text_chunk_windows"]})
    GROUP BY doc_id
) ch USING (doc_id)
"""


def text_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document profile: token stats ⋈ quality score ⋈ fingerprint
    ⋈ PII-redaction counts ⋈ dataset-split assignment on doc_id — five
    narrow scans joined 1:1 (each side is one row per doc, so the join
    is key-unique and AQE-broadcastable at test SF; at scale all five
    derive from the same scan and co-partition)."""
    tok = text.token_stats(spark, sf_dir)
    qual = text.quality_score(spark, sf_dir).withColumnRenamed("tokens", "q_tokens")
    fp = text.fingerprint(spark, sf_dir)
    pii = curation.pii_redaction(spark, sf_dir)
    split = curation.train_split(spark, sf_dir).select("doc_id", "bucket", "split")
    return (
        tok.join(qual, "doc_id")
        .join(fp, "doc_id")
        .join(pii, "doc_id")
        .join(split, "doc_id")
    )


_DOC_PROFILE_SQL = f"""
SELECT t.*,
       q.tokens AS q_tokens, q.mean_token_len, q.stopword_hits,
       q.stopword_ratio, q.verdict,
       f.fingerprint, f.canon_len,
       p.n_email, p.n_ip, p.n_phone, p.n_term, p.n_redactions, p.clean_text,
       s.bucket, s.split
FROM ({text.ORACLES["text_token_stats"]}) t
JOIN ({text.ORACLES["text_quality_score"]}) q USING (doc_id)
JOIN ({text.ORACLES["text_fingerprint"]}) f USING (doc_id)
JOIN ({curation.ORACLES["text_pii_redaction"]}) p USING (doc_id)
JOIN ({curation.ORACLES["sample_train_split"]}) s USING (doc_id)
"""


def text_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup ⋈ temperature mixture weights, 1:1 on
    (source, lang) — the per-stratum report plus the α-weighted
    sampling plan in one driver row."""
    roll = text.source_lang_rollup(spark, sf_dir)
    mix = curation.mixture_weights(spark, sf_dir).select(
        "source", "lang", "mix_weight", "epochs"
    )
    return roll.join(mix, ["source", "lang"])


_SOURCE_MIXTURE_SQL = f"""
SELECT r.*, m.mix_weight, m.epochs
FROM ({text.ORACLES["text_source_lang_rollup"]}) r
JOIN ({curation.ORACLES["sample_mixture_weights"]}) m USING (source, lang)
"""


# --- multimodal -------------------------------------------------------------

def mm_image_meta_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image metadata decode + resize in one entry (1:1 join on doc_id;
    both are mapInPandas kernels over the same synthetic binary col)."""
    meta = multimodal.image_metadata(spark, sf_dir)
    rz = multimodal.image_resize(spark, sf_dir)
    return meta.join(rz, "doc_id")


_IMAGE_META_RESIZE_SQL = f"""
SELECT m.*, r.out_width, r.out_height, r.n_bytes_out, r.pixel_sum
FROM ({multimodal.ORACLES["mm_image_metadata"]}) m
JOIN ({multimodal.ORACLES["mm_image_resize"]}) r USING (doc_id)
"""


def mm_frame_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling + audio RMS windows in one entry (both are
    1:N mapInPandas expansions; idx = frame_idx / window_idx)."""
    fr = (
        multimodal.frame_sample(spark, sf_dir)
        .withColumnRenamed("frame_idx", "idx")
    )
    au = (
        multimodal.audio_rms_windows(spark, sf_dir)
        .withColumnRenamed("window_idx", "idx")
    )
    return _tag(fr, "modality", "video").unionByName(
        _tag(au, "modality", "audio"), allowMissingColumns=True
    )


_FRAME_AUDIO_SQL = f"""
SELECT 'video' AS modality, doc_id, frame_idx AS idx, pixel_sum,
       CAST(NULL AS DOUBLE) AS rms, CAST(NULL AS INTEGER) AS n_samples
FROM ({multimodal.ORACLES["mm_frame_sample"]})
UNION ALL
SELECT 'audio' AS modality, doc_id, window_idx AS idx,
       CAST(NULL AS BIGINT) AS pixel_sum, rms, n_samples
FROM ({multimodal.ORACLES["mm_audio_rms"]})
"""


# --- corpus health report ---------------------------------------------------

def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mission-control composite: ONE row summarizing the audit surface
    a data lead reads every morning — corpus size and exact-dup mass,
    quality-verdict mix, sub-document dedup pressure (boilerplate +
    substring segments dropped), relational DQ violations, and the
    count of drifted event types.  Every term is an integer derived
    from an already-oracled operator, so the whole report value-checks
    cross-engine (the one double family, PSI, enters only through a
    thresholded count — each per-row double is computed identically on
    identical integers in both engines, so the comparison is
    deterministic).  Plan: five independent 1-row aggregates crossed
    together; each subtree is the underlying operator's plan."""
    from . import constraints as dq

    docs = text.load_table(spark, sf_dir, "documents")
    normalized = F.trim(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " ")
    )
    base = docs.agg(
        F.count("*").alias("docs_total"),
        (F.count("*") - F.countDistinct(F.md5(normalized))).alias(
            "exact_dup_docs"
        ),
    )
    q = text.with_quality(docs).agg(
        F.sum(F.when(F.col("verdict") == "keep", 1).otherwise(0))
        .cast("bigint")
        .alias("q_keep"),
        F.sum(F.when(F.col("verdict") == "review", 1).otherwise(0))
        .cast("bigint")
        .alias("q_review"),
        F.sum(F.when(F.col("verdict") == "drop", 1).otherwise(0))
        .cast("bigint")
        .alias("q_drop"),
    )
    boiler = curation.boilerplate_scrub(spark, sf_dir).agg(
        F.sum("segs_dropped").alias("boiler_segs_dropped")
    )
    substr = curation.substring_dedup(spark, sf_dir).agg(
        F.sum("segs_dropped").alias("substr_segs_dropped")
    )
    audit = dq.audit_orders(spark, sf_dir)
    viol = audit.select(
        sum(F.col(c) for c in audit.columns).cast("bigint").alias("dq_violations")
    )
    drift = dq.events_drift(spark, sf_dir).agg(
        F.sum(
            F.when(F.abs(F.col("psi_term")) > 0.01, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("drifted_types")
    )
    return (
        base.crossJoin(q)
        .crossJoin(boiler)
        .crossJoin(substr)
        .crossJoin(viol)
        .crossJoin(drift)
    )


def _health_sql() -> str:
    from . import constraints as dq

    return f"""
SELECT *
FROM (
    SELECT CAST(count(*) AS BIGINT) AS docs_total,
           CAST(count(*) - count(DISTINCT md5(trim(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g')))) AS BIGINT)
               AS exact_dup_docs
    FROM documents
) a
CROSS JOIN (
    SELECT CAST(SUM(CASE WHEN verdict = 'keep' THEN 1 ELSE 0 END) AS BIGINT)
               AS q_keep,
           CAST(SUM(CASE WHEN verdict = 'review' THEN 1 ELSE 0 END) AS BIGINT)
               AS q_review,
           CAST(SUM(CASE WHEN verdict = 'drop' THEN 1 ELSE 0 END) AS BIGINT)
               AS q_drop
    FROM ({text.ORACLES["text_quality_score"]})
) b
CROSS JOIN (
    SELECT CAST(SUM(segs_dropped) AS BIGINT) AS boiler_segs_dropped
    FROM ({curation.ORACLES["text_boilerplate_scrub"]})
) c
CROSS JOIN (
    SELECT CAST(SUM(segs_dropped) AS BIGINT) AS substr_segs_dropped
    FROM ({curation.ORACLES["text_substring_dedup"]})
) d
CROSS JOIN (
    SELECT CAST(null_orderkey + null_custkey + bad_status
                + nonpositive_price + price_above_400k
                + duplicate_orderkeys + orphan_custkeys AS BIGINT)
               AS dq_violations
    FROM ({dq.ORACLES["dq_orders_audit"]})
) e
CROSS JOIN (
    SELECT CAST(SUM(CASE WHEN ABS(psi_term) > 0.01 THEN 1 ELSE 0 END) AS BIGINT)
               AS drifted_types
    FROM ({dq.ORACLES["dq_events_drift"]})
) f
"""


QUERIES = {
    "med_q01_q07_overview": med_q01_q07_overview,
    "med_q04_q12_breakdowns": med_q04_q12_breakdowns,
    "text_train_prep": text_train_prep,
    "join_semi_anti_urgent": join_semi_anti_urgent,
    "setop_intersect_except": setop_intersect_except,
    "agg_rollup_cube": agg_rollup_cube,
    "window_top3_running": window_top3_running,
    "events_windowed_counts": events_windowed_counts,
    "events_hourly_daily": events_hourly_daily,
    "text_doc_profile": text_doc_profile,
    "text_source_mixture": text_source_mixture,
    "mm_image_meta_resize": mm_image_meta_resize,
    "mm_frame_audio": mm_frame_audio,
    "corpus_health_report": corpus_health_report,
}

ORACLES = {
    "med_q01_q07_overview": _Q01_Q07_SQL,
    "med_q04_q12_breakdowns": _Q04_Q12_SQL,
    "text_train_prep": _TRAIN_PREP_SQL,
    "join_semi_anti_urgent": _SEMI_ANTI_SQL,
    "setop_intersect_except": _INTERSECT_EXCEPT_SQL,
    "agg_rollup_cube": _ROLLUP_CUBE_SQL,
    "window_top3_running": _TOP3_RUNNING_SQL,
    "events_windowed_counts": _WINDOWED_COUNTS_SQL,
    "events_hourly_daily": _HOURLY_DAILY_SQL,
    "text_doc_profile": _DOC_PROFILE_SQL,
    "text_source_mixture": _SOURCE_MIXTURE_SQL,
    "mm_image_meta_resize": _IMAGE_META_RESIZE_SQL,
    "mm_frame_audio": _FRAME_AUDIO_SQL,
    "corpus_health_report": _health_sql(),
}
