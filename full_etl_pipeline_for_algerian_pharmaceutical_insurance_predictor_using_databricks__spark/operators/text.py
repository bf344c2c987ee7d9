"""Text-analysis operators over the `documents` table — the building
blocks of an LLM training-data pipeline (north-star extension,
SURVEY.md §7b): token statistics, quality scoring, heuristic language
ID, document fingerprinting.

Everything is built-in `pyspark.sql.functions` string/regex expressions
— JVM-side, codegen-eligible, no Python in the hot path. At 100 TB
these are embarrassingly parallel narrow transformations: no shuffle
except the final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources import load_table

#: Stopword regexes per language for the n-gram/stopword language ID.
#: \b word boundaries behave identically in Java regex and RE2 for
#: ASCII word characters.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|of|and|a|to|in|is)\b",
    "fr": r"\b(le|la|les|et|des|une|est)\b",
    "de": r"\b(der|die|das|und|ist|ein)\b",
    "es": r"\b(el|los|las|y|es|una|por)\b",
}

_STOPWORDS_RE = r"\b(the|a|of|and|in|to|is)\b"


def _n_tokens(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + derived ratios (whitespace tokenizer
    plus a BPE-ish subword proxy: 4 chars ≈ 1 token)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tok = _n_tokens(text)
    compact_len = F.length(F.regexp_replace(text, r"\s+", ""))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length(text).alias("chars"),
        n_tok.alias("tokens"),
        F.ceil(compact_len / F.lit(4)).cast("long").alias("subword_est"),
        (compact_len / n_tok).alias("avg_token_len"),
    )


_TOKEN_STATS_SQL = r"""
SELECT
    doc_id,
    lang,
    source,
    length(text) AS chars,
    len(regexp_split_to_array(trim(text), '\s+')) AS tokens,
    CAST(CEIL(length(regexp_replace(text, '\s+', '', 'g')) / 4) AS BIGINT) AS subword_est,
    length(regexp_replace(text, '\s+', '', 'g'))
        / len(regexp_split_to_array(trim(text), '\s+')) AS avg_token_len
FROM documents
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals (Gopher/C4-style rules): length bounds,
    mean token length, stopword density — bucketed into a verdict."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tok = _n_tokens(text)
    compact_len = F.length(F.regexp_replace(text, r"\s+", ""))
    mean_tok = compact_len / n_tok
    sw = F.regexp_count(text, F.lit(_STOPWORDS_RE))
    sw_ratio = sw / n_tok
    verdict = (
        F.when((n_tok >= 30) & (mean_tok >= 3.0) & (mean_tok <= 8.0) & (sw_ratio >= 0.05), "keep")
        .when((n_tok >= 10) & (sw_ratio >= 0.01), "review")
        .otherwise("drop")
    )
    return docs.select(
        "doc_id",
        n_tok.alias("tokens"),
        mean_tok.alias("mean_token_len"),
        sw.alias("stopword_hits"),
        sw_ratio.alias("stopword_ratio"),
        verdict.alias("verdict"),
    )


_QUALITY_SQL = r"""
SELECT
    doc_id,
    tokens,
    mean_token_len,
    stopword_hits,
    stopword_ratio,
    CASE
        WHEN tokens >= 30 AND mean_token_len >= 3.0 AND mean_token_len <= 8.0
             AND stopword_ratio >= 0.05 THEN 'keep'
        WHEN tokens >= 10 AND stopword_ratio >= 0.01 THEN 'review'
        ELSE 'drop'
    END AS verdict
FROM (
    SELECT
        doc_id,
        len(regexp_split_to_array(trim(text), '\s+')) AS tokens,
        length(regexp_replace(text, '\s+', '', 'g'))
            / len(regexp_split_to_array(trim(text), '\s+')) AS mean_token_len,
        len(regexp_extract_all(text, '\b(the|a|of|and|in|to|is)\b')) AS stopword_hits,
        len(regexp_extract_all(text, '\b(the|a|of|and|in|to|is)\b'))
            / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio
    FROM documents
)
"""


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID vs the labeled `lang` — returns the
    confusion matrix. Argmax with a fixed priority order (en > fr > de >
    es) so ties are deterministic; no marker hit → 'und'."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    c = {k: F.regexp_count(text, F.lit(v)) for k, v in LANG_MARKERS.items()}
    predicted = (
        F.when(
            (c["en"] > 0)
            & (c["en"] >= c["fr"]) & (c["en"] >= c["de"]) & (c["en"] >= c["es"]),
            "en",
        )
        .when((c["fr"] > 0) & (c["fr"] >= c["de"]) & (c["fr"] >= c["es"]), "fr")
        .when((c["de"] > 0) & (c["de"] >= c["es"]), "de")
        .when(c["es"] > 0, "es")
        .otherwise("und")
    )
    return (
        docs.select(F.col("lang").alias("labeled"), predicted.alias("predicted"))
        .groupBy("labeled", "predicted")
        .agg(F.count("*").alias("docs"))
    )


_LANG_ID_SQL = r"""
SELECT labeled, predicted, COUNT(*) AS docs
FROM (
    SELECT
        lang AS labeled,
        CASE
            WHEN c_en > 0 AND c_en >= c_fr AND c_en >= c_de AND c_en >= c_es THEN 'en'
            WHEN c_fr > 0 AND c_fr >= c_de AND c_fr >= c_es THEN 'fr'
            WHEN c_de > 0 AND c_de >= c_es THEN 'de'
            WHEN c_es > 0 THEN 'es'
            ELSE 'und'
        END AS predicted
    FROM (
        SELECT
            lang,
            len(regexp_extract_all(text, '\b(the|of|and|a|to|in|is)\b')) AS c_en,
            len(regexp_extract_all(text, '\b(le|la|les|et|des|une|est)\b')) AS c_fr,
            len(regexp_extract_all(text, '\b(der|die|das|und|ist|ein)\b')) AS c_de,
            len(regexp_extract_all(text, '\b(el|los|las|y|es|una|por)\b')) AS c_es
        FROM documents
    )
)
GROUP BY labeled, predicted
"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form document fingerprint: lowercase, collapse
    non-alphanumerics, md5. Identical fingerprints ⇒ exact near-dup
    under the normalization (consumed by dedup.exact_dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "))
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.length(normalized).alias("canon_len"),
    )


_FINGERPRINT_SQL = """
SELECT
    doc_id,
    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
    length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS canon_len
FROM documents
"""


def winnowed_fingerprints(
    spark: SparkSession, sf_dir: str, k: int = 5, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-char shingle (rolling-hash family —
    xxhash64 over each substring window), then keep the MINIMUM hash of
    every w-length window of consecutive shingle hashes.  Guarantees:
    any shared substring of length ≥ w+k-1 between two documents yields
    at least one shared fingerprint, while storing only ~2/(w+1) of the
    shingle hashes.

    Shape: two narrow selects — shingle-hash array built ONCE per doc
    (O(L)), windows then `slice` into it (no rehashing) — explode to
    (doc_id, fingerprint) rows. Pure expression codegen, no shuffle; at
    100 TB this is a map-only pass feeding the same inverted-index /
    banding joins as the token paths (a fingerprint IS a selected
    shingle hash)."""
    docs = load_table(spark, sf_dir, "documents")
    # normalize ONCE per doc in its own projection — inside the
    # transform lambda the O(L) rewrite would re-run per position
    normed = docs.select("doc_id", F.expr("trim(lower(text))").alias("t"))
    hashes = F.expr(
        f"transform(sequence(1, greatest(length(t) - {k} + 1, 1)),"
        f" i -> xxhash64(substring(t, i, {k})))"
    )
    with_hashes = normed.select("doc_id", hashes.alias("h"))
    winnowed = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size(h) - {w} + 1, 1)),"
            f" p -> array_min(slice(h, p, {w})))"
        )
    )
    return with_hashes.select(
        "doc_id", F.explode(winnowed).alias("fingerprint")
    )


def source_lang_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition: docs/chars per (source, lang) with per-source
    share — the mixture report a data pipeline publishes per snapshot."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count("*").alias("docs"),
        F.sum("n_chars").alias("chars"),
    )
    w_total = per.groupBy("source").agg(
        F.sum("docs").alias("_src_docs"),
    )
    return (
        per.join(F.broadcast(w_total), "source")
        .select(
            "source",
            "lang",
            "docs",
            "chars",
            F.round(F.col("docs") * 100.0 / F.col("_src_docs"), 1).alias("lang_share_pct"),
        )
    )


_SOURCE_LANG_SQL = """
SELECT
    source,
    lang,
    COUNT(*) AS docs,
    CAST(SUM(n_chars) AS BIGINT) AS chars,
    ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (PARTITION BY source), 1)
        AS lang_share_pct
FROM documents
GROUP BY source, lang
"""


QUERIES = {
    "text_winnowed_fingerprints": winnowed_fingerprints,
    "text_token_stats": token_stats,
    "text_quality_score": quality_score,
    "text_lang_id_confusion": lang_id_confusion,
    "text_fingerprint": fingerprint,
    "text_source_lang_rollup": source_lang_rollup,
}

ORACLES = {
    "text_token_stats": _TOKEN_STATS_SQL,
    "text_quality_score": _QUALITY_SQL,
    "text_lang_id_confusion": _LANG_ID_SQL,
    "text_fingerprint": _FINGERPRINT_SQL,
    "text_source_lang_rollup": _SOURCE_LANG_SQL,
}
