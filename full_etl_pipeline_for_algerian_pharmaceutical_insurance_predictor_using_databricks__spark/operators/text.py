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

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..functions.scale import checkpoint_df
from ..sources import load_table, local_rows_df

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


def with_quality(docs: DataFrame) -> DataFrame:
    """Append the quality-signal columns to any documents-shaped frame
    (batch OR streaming — stateless expressions only, so the same
    helper feeds the streaming ingestion gate)."""
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
    return docs.withColumns(
        {
            "tokens": n_tok,
            "mean_token_len": mean_tok,
            "stopword_hits": sw,
            "stopword_ratio": sw_ratio,
            "verdict": verdict,
        }
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals (Gopher/C4-style rules): length bounds,
    mean token length, stopword density — bucketed into a verdict."""
    docs = load_table(spark, sf_dir, "documents")
    return with_quality(docs).select(
        "doc_id",
        "tokens",
        "mean_token_len",
        "stopword_hits",
        "stopword_ratio",
        "verdict",
    )


CURRICULUM_BUCKETS = 10


def quality_curriculum(
    spark: SparkSession, sf_dir: str, buckets: int = CURRICULUM_BUCKETS
) -> DataFrame:
    """Curriculum schedule from the quality signals: rank every doc by
    a composite quality key (stopword_ratio, then mean_token_len —
    higher is cleaner on this corpus), NTILE it into `buckets` stages,
    and emit one row per stage with its doc count and signal ranges —
    the train-on-clean-data-first ordering used when curriculum-
    sampling a corpus.  One window pass over per-doc scalars + one
    aggregate; the per-doc stage assignment (the actual training-order
    column) is the pre-aggregate frame.

    NTILE at 100 TB: a global ntile window is a single-partition sort
    trap — the scale path assigns stages from approx-quantile cut
    points instead (see `equidepth_histogram` in curation.py, which is
    that operator); this entry keeps exact NTILE semantics so DuckDB
    can value-check the schedule."""
    scored = with_quality(load_table(spark, sf_dir, "documents"))
    w = Window.orderBy(
        F.desc("stopword_ratio"), F.desc("mean_token_len"), F.asc("doc_id")
    )
    staged = scored.withColumn("stage", F.ntile(buckets).over(w))
    return (
        staged.groupBy("stage")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.min("stopword_ratio"), 6).alias("min_stopword_ratio"),
            F.round(F.max("stopword_ratio"), 6).alias("max_stopword_ratio"),
            F.round(F.avg("tokens"), 2).alias("avg_tokens"),
        )
        .orderBy("stage")
    )


_CURRICULUM_SQL = rf"""
WITH scored AS (
    SELECT
        doc_id,
        len(regexp_split_to_array(trim(text), '\s+')) AS tokens,
        length(regexp_replace(text, '\s+', '', 'g'))
            / len(regexp_split_to_array(trim(text), '\s+')) AS mean_token_len,
        len(regexp_extract_all(text, '\b(the|a|of|and|in|to|is)\b'))
            / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio
    FROM documents
),
staged AS (
    SELECT *,
           NTILE({CURRICULUM_BUCKETS}) OVER (
               ORDER BY stopword_ratio DESC, mean_token_len DESC, doc_id
           ) AS stage
    FROM scored
)
SELECT stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(MIN(stopword_ratio), 6) AS min_stopword_ratio,
       ROUND(MAX(stopword_ratio), 6) AS max_stopword_ratio,
       ROUND(AVG(tokens), 2) AS avg_tokens
FROM staged
GROUP BY stage
ORDER BY stage
"""


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


# --------------------------------------------------------------------------
# Training-data preparation: packing, repetition filters, contamination
# --------------------------------------------------------------------------

#: fixed token budget of one packed training sequence
SEQ_BUDGET = 2048


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    budget: int = SEQ_BUDGET,
    shard_chars: int = 2,
) -> DataFrame:
    """Assign every document its byte range in the packed token stream:
    docs are laid out in a deterministic hash-shuffled order (md5 of
    doc_id — reproducible, engine- and partitioning-independent), all
    tokens concatenated, and sequences cut every `budget` tokens
    (GPT-style pretraining packing; docs may span a cut).

    The global running offset is computed SCALE-SAFE as a two-level
    cumsum: the canonical order is (h, doc_id), the shard is the first
    `shard_chars` hex chars of h — a PREFIX of the order key, so
    sharding never changes the global order, only the parallelism —
    the intra-shard prefix sum is a window partitioned 16^shard_chars
    ways, and the shard base offsets come from a 16^shard_chars-row
    aggregate joined back broadcast.  No unpartitioned window ever
    sees the full table (the trap SURVEY §4.3.1 flags), yet the result
    equals the single global cumsum the oracle runs.  Default 256
    shards; at 100 TB raise `shard_chars` so each shard's sequential
    window scan stays executor-sized (4 hex chars = 65k shards — the
    offset aggregate is still broadcast-trivial)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        _n_tokens(F.col("text")).cast("long").alias("n_tokens"),
    ).withColumn("shard", F.substring("h", 1, shard_chars))
    w_intra = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # shard totals (16^shard_chars rows); the prefix window over them
    # is effectively free at any corpus size
    w_shard = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    shard_offsets = (
        base.groupBy("shard")
        .agg(F.sum("n_tokens").alias("_tot"))
        .select(
            "shard", F.coalesce(F.sum("_tot").over(w_shard), F.lit(0)).alias("_base")
        )
    )
    first_seq = F.floor(F.col("start_offset") / budget)
    last_seq = F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / budget)
    return (
        base.withColumn(
            "_intra", F.coalesce(F.sum("n_tokens").over(w_intra), F.lit(0))
        )
        .join(F.broadcast(shard_offsets), "shard")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("_base") + F.col("_intra")).alias("start_offset"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_offset",
            first_seq.alias("first_seq"),
            last_seq.alias("last_seq"),
            (last_seq - first_seq + 1).alias("n_seqs"),
        )
    )


_PACK_SQL = rf"""
WITH t AS (
    SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR)) AS h,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
    FROM documents
),
o AS (
    -- the shard prefix adds nothing to (h, doc_id) order, so the
    -- oracle runs the plain global cumsum
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_offset
    FROM t
)
SELECT doc_id, n_tokens, start_offset,
       CAST(FLOOR(start_offset / {SEQ_BUDGET}) AS BIGINT) AS first_seq,
       CAST(FLOOR((start_offset + n_tokens - 1) / {SEQ_BUDGET}) AS BIGINT) AS last_seq,
       CAST(FLOOR((start_offset + n_tokens - 1) / {SEQ_BUDGET})
            - FLOOR(start_offset / {SEQ_BUDGET}) + 1 AS BIGINT) AS n_seqs
FROM o
"""


def repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality signals per document: distinct-
    token ratio and the mass fraction of the most frequent one and two
    tokens.  Token counts aggregate per (doc, token) first (map-side
    partials), then a window partitioned by doc ranks them — never an
    unpartitioned window, never a per-doc collect."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    counts = tok.groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), "token")
    ranked = counts.select("doc_id", "cnt", F.row_number().over(w).alias("rn"))
    return ranked.groupBy("doc_id").agg(
        F.sum("cnt").alias("total_tokens"),
        F.count("*").alias("distinct_tokens"),
        (F.count("*") / F.sum("cnt")).alias("distinct_ratio"),
        (F.max("cnt") / F.sum("cnt")).alias("top_token_frac"),
        (
            F.sum(F.when(F.col("rn") <= 2, F.col("cnt")).otherwise(0)) / F.sum("cnt")
        ).alias("top2_token_frac"),
    )


_REPETITION_SQL = r"""
WITH c AS (
    SELECT doc_id, token, COUNT(*) AS cnt
    FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        FROM documents
    )
    GROUP BY doc_id, token
),
r AS (
    SELECT doc_id, cnt,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, token) AS rn
    FROM c
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS total_tokens,
       COUNT(*) AS distinct_tokens,
       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS distinct_ratio,
       CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_token_frac,
       CAST(SUM(CASE WHEN rn <= 2 THEN cnt ELSE 0 END) AS DOUBLE)
           / CAST(SUM(cnt) AS DOUBLE) AS top2_token_frac
FROM r
GROUP BY doc_id
"""

#: docs below this id form the held-out "benchmark" set the corpus is
#: screened against (stand-in for a real eval suite)
EVAL_SET_MAX_ID = 20
CONTAMINATION_NGRAM = 3


def contamination_overlap(
    spark: SparkSession,
    sf_dir: str,
    eval_max_id: int = EVAL_SET_MAX_ID,
    n: int = CONTAMINATION_NGRAM,
) -> DataFrame:
    """Benchmark-contamination screen: for every corpus document, how
    many of its distinct word n-grams also appear in the (tiny) eval
    set.  The eval shingle set is deduplicated and BROADCAST — the
    corpus side never shuffles, which is the only sane plan when the
    corpus is 100 TB and the benchmark is kilobytes.  `contaminated`
    uses integer arithmetic (2·overlap ≥ n_shingles) so the flag is
    bit-exact across engines.  Docs shorter than n tokens have no
    n-grams and are absent, mirroring the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("a")
    )
    shingle_arr = F.when(
        F.size("a") >= n,
        F.expr(
            f"transform(sequence(1, size(a) - {n - 1}),"
            f" i -> concat_ws(' ', slice(a, i, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    shingles = arr.select(
        "doc_id", F.explode(F.array_distinct(shingle_arr)).alias("shingle")
    )
    eval_sh = (
        shingles.filter(F.col("doc_id") < eval_max_id).select("shingle").distinct()
    )
    corpus = shingles.filter(F.col("doc_id") >= eval_max_id)
    totals = corpus.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    overlap = (
        corpus.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("eval_overlap"))
    )
    ov = F.coalesce("eval_overlap", F.lit(0))
    return totals.join(overlap, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        ov.alias("eval_overlap"),
        (ov / F.col("n_shingles")).alias("overlap_frac"),
        (ov * 2 >= F.col("n_shingles")).alias("contaminated"),
    )


_CONTAMINATION_SQL = rf"""
WITH arrs AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
    FROM documents
),
idx AS (
    SELECT doc_id, a, unnest(generate_series(1, len(a) - 2)) AS i FROM arrs
),
sh AS (
    SELECT DISTINCT doc_id,
           a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS shingle
    FROM idx
),
eval_sh AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id < {EVAL_SET_MAX_ID}
),
corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= {EVAL_SET_MAX_ID}),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id),
ov AS (
    SELECT c.doc_id, COUNT(*) AS eval_overlap
    FROM corpus c JOIN eval_sh e USING (shingle)
    GROUP BY c.doc_id
)
SELECT t.doc_id,
       t.n_shingles,
       CAST(COALESCE(o.eval_overlap, 0) AS BIGINT) AS eval_overlap,
       CAST(COALESCE(o.eval_overlap, 0) AS DOUBLE) / t.n_shingles AS overlap_frac,
       COALESCE(o.eval_overlap, 0) * 2 >= t.n_shingles AS contaminated
FROM tot t LEFT JOIN ov o USING (doc_id)
"""


# --------------------------------------------------------------------------
# Corpus-unigram-LM surprisal score (the CCNet-style LM filter signal)
# --------------------------------------------------------------------------

#: Surprisal quantum: per-token -ln p(token) is rounded to integer
#: MILLI-NATS before the per-doc sum.  The sum is then exact BIGINT
#: arithmetic — order-independent across partial aggregations (floating
#: sums of logs would drift with Spark's nondeterministic combine
#: order) and ulp-robust against libm-vs-StrictMath ln differences
#: (a flip needs ln to land within ~1e-13 of a rounding boundary).
LM_SURPRISAL_QUANT = 1000


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document by its average token surprisal under the
    corpus's own unigram LM — the classic LM-based quality filter:
    boilerplate/templated docs score low (frequent tokens), gibberish
    scores high, and both tails get cut by the curation policy.

    Shape: per-(doc, token) counts first (map-side partials; also
    shrinks the LM join's left side to distinct tokens per doc), corpus
    frequencies from a second token-keyed agg, the 1-row corpus total
    broadcast, and the LM joined back on token — vocabulary is Zipf-
    bounded (≪ corpus), so AQE broadcasts it at small scale and the
    join stays a well-partitioned hash join at any scale.  No Python,
    no window, no collect."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    doc_tok = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    lm = doc_tok.groupBy("token").agg(F.sum("tf").alias("cf"))
    total = lm.agg(F.sum("cf").alias("corpus_tokens"))
    lm_scored = lm.crossJoin(F.broadcast(total)).select(
        "token",
        F.round(
            -F.log(F.col("cf") / F.col("corpus_tokens")) * LM_SURPRISAL_QUANT
        )
        .cast("bigint")
        .alias("mnats"),
    )
    return (
        doc_tok.join(lm_scored, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("mnats")).alias("sum_mnats"),
            (
                F.sum(F.col("tf") * F.col("mnats"))
                / (F.sum("tf") * LM_SURPRISAL_QUANT)
            ).alias("avg_surprisal_nats"),
        )
    )


_UNIGRAM_LM_SQL = rf"""
WITH tok AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
    FROM documents
),
dt AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
lm AS (SELECT token, SUM(tf) AS cf FROM dt GROUP BY 1),
t AS (SELECT SUM(cf) AS corpus_tokens FROM lm),
s AS (
    SELECT token,
           CAST(ROUND(-LN(CAST(cf AS DOUBLE) / corpus_tokens)
                      * {LM_SURPRISAL_QUANT}) AS BIGINT) AS mnats
    FROM lm CROSS JOIN t
)
SELECT dt.doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf * mnats) AS BIGINT) AS sum_mnats,
       CAST(SUM(tf * mnats) AS DOUBLE)
           / (SUM(tf) * {LM_SURPRISAL_QUANT}) AS avg_surprisal_nats
FROM dt JOIN s USING (token)
GROUP BY dt.doc_id
"""


#: Interpolation weight on the bigram term (Jelinek–Mercer smoothing);
#: an exact binary fraction so both engines compute the identical
#: double: p(w2|w1) = 3/4 · c(w1,w2)/c(w1·) + 1/4 · c(w2)/N.
BIGRAM_LAMBDA = 0.75


def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average surprisal under an interpolated BIGRAM LM
    trained on the corpus itself — the stronger sibling of
    `unigram_logprob` (CCNet's actual filter is a 5-gram KenLM; the
    Jelinek–Mercer-interpolated bigram is the same signal family with
    the same distributed shape).  Repetitive/templated docs score low
    (their transitions dominate the LM), incoherent token soup scores
    high even when its unigrams are common — which is exactly what the
    unigram filter cannot see.

    Shape: bigrams come from array slicing (`arrays_zip` of the
    token array offset by one) — per-row, no window, no shuffle to
    form pairs; then everything is token-keyed group-bys and equi-joins
    against Zipf-bounded LM tables (bigram counts, context totals,
    unigram backoff, one broadcast scalar).  Surprisal is quantized to
    integer milli-nats before the per-doc BIGINT sum — order-
    independent and cross-engine stable, same contract as
    `unigram_logprob`."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"),
    )
    tok = toks.select("doc_id", F.explode("t").alias("token"))
    uni = tok.groupBy("token").agg(F.count("*").alias("cf"))
    total = uni.agg(F.sum("cf").alias("n_corpus"))
    npairs = F.greatest(F.size("t") - 1, F.lit(0))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), F.lit(1), npairs).alias("w1"),
                F.slice(F.col("t"), F.lit(2), npairs).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # doc_bg feeds BOTH the LM derivation and the final per-doc scoring
    # join — two separate subtrees to Spark (no cross-branch CSE), so
    # without materialization the tokenize + bigram explode + corpus-
    # sized (doc,w1,w2) groupBy runs twice per query (guide §2.4).
    doc_bg = checkpoint_df(
        bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    )
    bg_lm = doc_bg.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    ctx = bg_lm.groupBy("w1").agg(F.sum("cb").alias("c1"))
    scored = (
        bg_lm.join(ctx, "w1")
        .join(uni.withColumnRenamed("token", "w2"), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    F.lit(BIGRAM_LAMBDA) * F.col("cb") / F.col("c1")
                    + F.lit(1 - BIGRAM_LAMBDA)
                    * F.col("cf")
                    / F.col("n_corpus")
                )
                * LM_SURPRISAL_QUANT
            )
            .cast("bigint")
            .alias("mnats"),
        )
    )
    return (
        doc_bg.join(scored, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("mnats")).cast("bigint").alias("sum_mnats"),
            (
                F.sum(F.col("tf") * F.col("mnats"))
                / (F.sum("tf") * LM_SURPRISAL_QUANT)
            ).alias("avg_surprisal_nats"),
        )
    )


_BIGRAM_LM_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
uni AS (SELECT token, COUNT(*) AS cf FROM tok GROUP BY 1),
tot AS (SELECT SUM(cf) AS n_corpus FROM uni),
bg AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM toks, UNNEST(range(1, len(t))) AS r(i)
),
doc_bg AS (
    SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3
),
bg_lm AS (SELECT w1, w2, SUM(tf) AS cb FROM doc_bg GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(cb) AS c1 FROM bg_lm GROUP BY 1),
scored AS (
    SELECT bg_lm.w1, bg_lm.w2,
           CAST(ROUND(-LN({BIGRAM_LAMBDA} * CAST(cb AS DOUBLE) / c1
                          + {1 - BIGRAM_LAMBDA} * CAST(cf AS DOUBLE) / n_corpus)
                      * {LM_SURPRISAL_QUANT}) AS BIGINT) AS mnats
    FROM bg_lm
    JOIN ctx USING (w1)
    JOIN uni ON uni.token = bg_lm.w2
    CROSS JOIN tot
)
SELECT doc_bg.doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       CAST(SUM(tf * mnats) AS BIGINT) AS sum_mnats,
       CAST(SUM(tf * mnats) AS DOUBLE)
           / (SUM(tf) * {LM_SURPRISAL_QUANT}) AS avg_surprisal_nats
FROM doc_bg
JOIN scored ON scored.w1 = doc_bg.w1 AND scored.w2 = doc_bg.w2
GROUP BY doc_bg.doc_id
"""


def source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift vs the whole corpus: each source's
    token distribution scored by cross-entropy against the corpus
    unigram LM, its own self-entropy, and their difference — the exact
    KL divergence KL(source ‖ corpus) in nats.  This is the mixture
    audit that answers "which source is the outlier" before reweighting
    (PSI drift in constraints.py answers the same question for numeric
    columns; this is its token-distribution sibling).

    Shape: one (source, token) count table feeds BOTH distributions
    (corpus counts = a second agg over it), joined back token-keyed —
    Zipf-bounded sides, no window, no collect.  Surprisals are
    quantized to milli-nats and summed as BIGINT per the module's
    cross-engine contract; KL is computed from the SAME quantized
    terms, so kl_nats ≥ 0 up to quantization (±0.001 nat/token)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    st = tok.groupBy("source", "token").agg(F.count("*").alias("tf"))
    totals = st.groupBy("source").agg(F.sum("tf").alias("n_src"))
    corpus = st.groupBy("token").agg(F.sum("tf").alias("cf"))
    n_corpus = corpus.agg(F.sum("cf").alias("n_corpus"))
    q_corpus = corpus.crossJoin(F.broadcast(n_corpus)).select(
        "token",
        F.round(
            -F.log(F.col("cf") / F.col("n_corpus")) * LM_SURPRISAL_QUANT
        )
        .cast("bigint")
        .alias("corpus_mnats"),
    )
    scored = (
        st.join(totals, "source")
        .join(q_corpus, "token")
        .select(
            "source",
            "tf",
            "corpus_mnats",
            F.round(
                -F.log(F.col("tf") / F.col("n_src")) * LM_SURPRISAL_QUANT
            )
            .cast("bigint")
            .alias("src_mnats"),
        )
    )
    quant = F.lit(float(LM_SURPRISAL_QUANT))
    return (
        scored.groupBy("source")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            (F.sum(F.col("tf") * F.col("corpus_mnats")) / (F.sum("tf") * quant)).alias(
                "cross_entropy_nats"
            ),
            (F.sum(F.col("tf") * F.col("src_mnats")) / (F.sum("tf") * quant)).alias(
                "self_entropy_nats"
            ),
            (
                F.sum(F.col("tf") * (F.col("corpus_mnats") - F.col("src_mnats")))
                / (F.sum("tf") * quant)
            ).alias("kl_nats"),
        )
        .orderBy(F.desc("kl_nats"))
    )


_SOURCE_DIVERGENCE_SQL = rf"""
WITH tok AS (
    SELECT source,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
    FROM documents
),
st AS (SELECT source, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
totals AS (SELECT source, SUM(tf) AS n_src FROM st GROUP BY 1),
corpus AS (SELECT token, SUM(tf) AS cf FROM st GROUP BY 1),
nc AS (SELECT SUM(cf) AS n_corpus FROM corpus),
qc AS (
    SELECT token,
           CAST(ROUND(-LN(CAST(cf AS DOUBLE) / n_corpus)
                      * {LM_SURPRISAL_QUANT}) AS BIGINT) AS corpus_mnats
    FROM corpus CROSS JOIN nc
),
scored AS (
    SELECT st.source, st.tf, qc.corpus_mnats,
           CAST(ROUND(-LN(CAST(st.tf AS DOUBLE) / totals.n_src)
                      * {LM_SURPRISAL_QUANT}) AS BIGINT) AS src_mnats
    FROM st
    JOIN totals USING (source)
    JOIN qc USING (token)
)
SELECT source,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf * corpus_mnats) AS DOUBLE)
           / (SUM(tf) * {LM_SURPRISAL_QUANT}.0) AS cross_entropy_nats,
       CAST(SUM(tf * src_mnats) AS DOUBLE)
           / (SUM(tf) * {LM_SURPRISAL_QUANT}.0) AS self_entropy_nats,
       CAST(SUM(tf * (corpus_mnats - src_mnats)) AS DOUBLE)
           / (SUM(tf) * {LM_SURPRISAL_QUANT}.0) AS kl_nats
FROM scored
GROUP BY source
ORDER BY kl_nats DESC
"""


#: GPT-2-style pretokenizer split, minus the `\s+(?!\S)` lookahead term
#: (RE2 — the DuckDB oracle engine — has no lookahead; dropping it only
#: merges trailing-space runs, and BOTH engines run this same pattern).
BPE_SPLIT_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE-ish token count: the GPT-2 pretokenizer regex
    (contraction suffixes / letter runs / digit runs / punctuation
    runs, each with its optional leading space) counted per doc — the
    budget-accurate token estimate an LLM-data pipeline sizes corpora
    with, vs the whitespace count (`token_stats.tokens`) it filters
    with.  One `regexp_count` projection over the scan: map-only, no
    shuffle, pure codegen; verified bit-identical between Spark (Java
    regex) and DuckDB (RE2) on the shared pattern."""
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.regexp_count(F.col("text"), F.lit(BPE_SPLIT_RE))
    return docs.select(
        "doc_id",
        "lang",
        n_bpe.alias("bpe_tokens"),
        _n_tokens(F.col("text")).alias("ws_tokens"),
        (n_bpe / _n_tokens(F.col("text"))).alias("bpe_per_word"),
    )


_BPE_COUNT_SQL = rf"""
SELECT
    doc_id,
    lang,
    len(regexp_extract_all(text, '{BPE_SPLIT_RE.replace("'", "''")}'))
        AS bpe_tokens,
    len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
    len(regexp_extract_all(text, '{BPE_SPLIT_RE.replace("'", "''")}'))
        / len(regexp_split_to_array(trim(text), '\s+')) AS bpe_per_word
FROM documents
"""


NGRAM_TOPK_N = 2
NGRAM_TOPK_K = 50


def ngram_topk(
    spark: SparkSession,
    sf_dir: str,
    n: int = NGRAM_TOPK_N,
    k: int = NGRAM_TOPK_K,
) -> DataFrame:
    """Corpus-level top-k word n-grams with counts — the basic corpus
    statistic behind stopword lists, boilerplate detection, and n-gram
    LM vocabularies.

    Plan shape: n-grams are built IN-ROW (transform over the token
    array — no join, no per-token explode-then-self-join), the count is
    one hash aggregate with map-side partials, and the top-k is
    `TakeOrderedAndProject` (per-partition k-row heaps, never a global
    sort) — at 100 TB the only full-width exchange is the n-gram
    aggregate itself.  Ties break on the n-gram string so the top-k SET
    is deterministic across engines."""
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("a"))
    grams = F.when(
        F.size("a") >= n,
        F.expr(
            f"transform(sequence(1, size(a) - {n - 1}),"
            f" i -> concat_ws(' ', slice(a, i, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        arr.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("ngram"))
        .limit(k)
    )


_NGRAM_TOPK_SQL = rf"""
WITH arrs AS (
    SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS a FROM documents
),
idx AS (
    SELECT a, unnest(generate_series(1, len(a) - {NGRAM_TOPK_N - 1})) AS i
    FROM arrs
),
g AS (
    SELECT concat_ws(' ', {", ".join(f"a[i + {j}]" for j in range(NGRAM_TOPK_N))}) AS ngram
    FROM idx
)
SELECT ngram, COUNT(*) AS occurrences
FROM g
GROUP BY ngram
ORDER BY occurrences DESC, ngram ASC
LIMIT {NGRAM_TOPK_K}
"""


# --------------------------------------------------------------------------
# Topic clustering — hashed TF-IDF → seeded KMeans → labeled profile
# --------------------------------------------------------------------------


def topic_clusters(
    spark: SparkSession,
    sf_dir: str,
    k: int = 8,
    n_features: int = 1024,
    top_terms: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Corpus topic map: cluster documents on hashed TF-IDF vectors
    (seeded Spark ML KMeans) and label each cluster with its most
    frequent terms — the standard first look at an unlabeled corpus
    before mixture design (rows-only entry; cluster geometry has no
    SQL twin, so invariants — full coverage, ≤k clusters, label shape,
    in-session determinism — are pinned in tests/test_llm_ops.py).

    Scale shape: HashingTF keeps the feature space fixed-width (no
    vocabulary broadcast — the hashing trick), IDF is one distributed
    fit, KMeans is the same seeded quantizer the IVF family uses.
    Labels do NOT come from inverting the hashed centroids (hashing is
    lossy); cluster membership joins back to the exploded tokens and
    one count + WindowGroupLimit picks each cluster's `top_terms` most
    document-frequent terms — exact and readable at any corpus size.
    The only non-agg shuffles are the KMeans fit's own and the
    token-count exchange."""
    idf_model, km_model = _topic_fit(spark, sf_dir, k, n_features, seed)
    assigned = _topic_assign(
        _topic_docs_tf(spark, sf_dir, n_features), idf_model, km_model
    )
    return _topic_table(assigned, top_terms)


TOPIC_INDEX_VERSION = 1


def _topic_docs_tf(spark: SparkSession, sf_dir: str, n_features: int) -> DataFrame:
    """Tokenized documents with their hashed term-frequency vector, as
    both the ML vector (`tf`, for the one-time fits) and a plain array
    (`tf_arr`, for the declarative assignment math).  HashingTF is a
    stateless transformer — identical output in build and serving."""
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks")
    )
    tf = HashingTF(
        inputCol="toks", outputCol="tf", numFeatures=n_features
    ).transform(docs)
    return tf.withColumn("tf_arr", vector_to_array(F.col("tf")))


def _topic_fit(
    spark: SparkSession, sf_dir: str, k: int, n_features: int, seed: int
):
    """Fit IDF + seeded KMeans on the hashed term frequencies and
    return the two fitted models.  Both are tiny (dim + k·dim values)
    and natively persistable via Spark ML's writer — the same artifact
    path the reference's model sink uses (`ml/pipeline.py`)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import IDF

    tf = _topic_docs_tf(spark, sf_dir, n_features)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    vecs = idf_model.transform(tf).select("doc_id", "tfidf")
    km_model = KMeans(
        k=k, seed=seed, maxIter=10, featuresCol="tfidf",
        predictionCol="cluster_id",
    ).fit(vecs)
    return idf_model, km_model


def _topic_assign(docs_tf: DataFrame, idf_model, km_model) -> DataFrame:
    """Nearest-centroid assignment through the fitted transformers —
    pure model.transform projections (JVM-side BLAS with norm-pruned
    distances), no fit stage, no Python UDF, no shuffle.  Build and
    serving share this exact code path (serving reloads the persisted
    models), so their labels are identical by construction."""
    return (
        km_model.transform(idf_model.transform(docs_tf))
        .select("doc_id", "toks", "cluster_id")
    )


def _topic_table(assigned: DataFrame, top_terms: int) -> DataFrame:
    sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("n_docs"))
    term_counts = (
        assigned.select(
            "cluster_id", F.explode(F.array_distinct("toks")).alias("term")
        )
        .groupBy("cluster_id", "term")
        .agg(F.count("*").alias("df"))
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("df"), F.asc("term"))
    labels = (
        term_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_terms)
        .groupBy("cluster_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rank", "term"))
            ).alias("ranked")
        )
        .select(
            "cluster_id",
            F.transform(F.col("ranked"), lambda s: s["term"]).alias("top_terms"),
        )
    )
    return (
        sizes.join(labels, "cluster_id")
        .select("cluster_id", "n_docs", "top_terms")
        .orderBy(F.desc("n_docs"), F.asc("cluster_id"))
    )


def _default_topic_index_dir(sf_dir: str) -> str:
    from ..functions.scale import default_index_dir

    return default_index_dir("topic", TOPIC_INDEX_VERSION, sf_dir)


def topic_index_build(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    k: int = 8,
    n_features: int = 1024,
    seed: int = 7,
) -> str:
    """One-time topic-model build: fit IDF + KMeans and persist both
    fitted models via Spark ML's native writer plus a meta row under
    `index_dir` — the train/serve split (`ivf_pq_build_index`'s
    pattern applied to topic clustering).  The index is O(dim + k·dim)
    values regardless of corpus size."""
    idf_model, km_model = _topic_fit(spark, sf_dir, k, n_features, seed)
    idf_model.write().overwrite().save(f"{index_dir}/idf")
    km_model.write().overwrite().save(f"{index_dir}/kmeans")
    local_rows_df(spark, 
        [(k, n_features, seed)], "k int, n_features int, seed int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/meta")
    return index_dir


def topic_clusters_serving(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str | None = None,
    top_terms: int = 5,
) -> DataFrame:
    """Query-only topic map against FROZEN on-disk fitted models
    (built once by `topic_index_build` if absent): the amortized
    serving cost, vs `topic_clusters` which re-fits IDF + KMeans per
    call.  The plan is a parquet scan + stateless transform
    projections — no KMeans or IDF fit anywhere (pinned in
    tests/test_plans.py); assignment goes through the identical
    `_topic_assign` path as the build entry with the identical model
    parameters, so labels match `topic_clusters` exactly."""
    import os

    if index_dir is None:
        index_dir = _default_topic_index_dir(sf_dir)
    if not os.path.isdir(os.path.join(index_dir, "kmeans")):
        topic_index_build(spark, sf_dir, index_dir)
    from pyspark.ml.clustering import KMeansModel
    from pyspark.ml.feature import IDFModel

    meta = spark.read.parquet(f"{index_dir}/meta").first()
    idf_model = IDFModel.load(f"{index_dir}/idf")
    km_model = KMeansModel.load(f"{index_dir}/kmeans")
    assigned = _topic_assign(
        _topic_docs_tf(spark, sf_dir, meta["n_features"]), idf_model, km_model
    )
    return _topic_table(assigned, top_terms)


# --------------------------------------------------------------------------
# Feature-hashed document vectors — signed hashing trick, SQL-checkable
# --------------------------------------------------------------------------

HASH_EMBED_DIM = 64


def hash_embedding(
    spark: SparkSession, sf_dir: str, dim: int = HASH_EMBED_DIM
) -> DataFrame:
    """L2-normalized feature-hashed document vectors (Weinberger's
    signed hashing trick): every token lands in bucket
    `md5(token) mod dim` with sign from the next hex digit's parity,
    so collisions cancel in expectation — the classic model-free
    vectorizer for similarity / clustering when no trained embedding
    exists.  Surfaced SPARSE as (doc_id, dim, weight) rows: that is
    both the scalable layout (a 1 M-dim space stores only nonzeros)
    and what lets DuckDB replay the exact md5 bucket math — unlike
    the (JVM-hash) HashingTF vectors, every value here is
    engine-portable.

    Exactness: bucket counts are integers, the L2 norm is one
    sqrt(sum of int squares) per doc (window, exact), and the single
    division per row is correctly rounded — bit-identical cross-engine.
    One explode + one (doc, bucket) aggregate; the norm window reuses
    the aggregate's partitioning.  md5-mod keeps signs/buckets stable
    across engines, partitionings, and corpus growth."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t"),
    )
    bucket = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("bigint") % dim
    sign = F.when(
        F.conv(F.substring(F.md5("t"), 9, 1), 16, 10).cast("int") % 2 == 0, 1
    ).otherwise(-1)
    per_bucket = (
        tok.select("doc_id", bucket.alias("dim"), sign.alias("s"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )
    w = Window.partitionBy("doc_id")
    norm = F.sqrt(F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("double"))
    return per_bucket.select(
        "doc_id", "dim", (F.col("cnt") / norm).alias("weight")
    )


_HASH_EMBED_SQL = rf"""
WITH tok AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
    FROM documents
),
per_bucket AS (
    SELECT doc_id,
           ('0x' || substr(md5(t), 1, 8))::BIGINT % {HASH_EMBED_DIM} AS dim,
           SUM(CASE WHEN ('0x' || substr(md5(t), 9, 1))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END) AS cnt
    FROM tok
    GROUP BY doc_id, dim
)
SELECT doc_id, dim,
       cnt / sqrt(SUM(cnt * cnt) OVER (PARTITION BY doc_id)) AS weight
FROM per_bucket
WHERE cnt <> 0
"""


# --------------------------------------------------------------------------
# Distributed BPE vocabulary learning (Sennrich-style merges)
# --------------------------------------------------------------------------

BPE_MERGES = 20
EOW = "</w>"  # end-of-word marker, per the original BPE formulation


def bpe_learn(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Learn a BPE merge table from the corpus — the tokenizer-
    induction step (Sennrich et al. 2016) that precedes every
    `text_bpe_token_count`-style tokenization, distributed the way a
    100-TB corpus requires.

    The algorithm splits into a parallel part and an inherently
    sequential part, and the implementation keeps them on the right
    side of the driver boundary:

    - PARALLEL (the 100-TB scan): corpus → word-frequency table via
      one hash aggregation.  Everything after operates on the word
      TABLE (|distinct words| rows — millions at web scale, never the
      corpus), which stays a distributed DataFrame throughout.
    - SEQUENTIAL (the algorithm itself): each merge step explodes
      adjacent symbol pairs weighted by word count, aggregates, and
      takes the arg-max pair with a (count DESC, left, right) total
      order (deterministic under ties — same corpus ⇒ same merge table
      on any engine/partitioning).  Only that single winning ROW is
      collected per step; the merge is applied table-side as a
      left-to-right greedy fold (`aggregate`) over each word's symbol
      array.  `localCheckpoint` truncates the per-iteration lineage so
      step N doesn't replay steps 1..N-1 (same loop discipline as the
      pointer-doubled connected components).

    Returns the merge table: (step, left, right, merged, pair_count).
    Rows-only entry: the merge loop is not SQL-expressible; parity is
    pinned against a pure-Python reference BPE in tests/test_llm_ops.py.
    """
    merges, _ = _bpe_loop(_bpe_words(spark, sf_dir), n_merges)
    return local_rows_df(spark, 
        merges, "step int, left string, right string, merged string, pair_count bigint"
    )


def _bpe_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency table with initial char+EOW symbol arrays — the
    one corpus-scale scan of the BPE algorithm."""
    docs = load_table(spark, sf_dir, "documents")
    return checkpoint_df(
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "s",
            F.concat(
                F.split(F.col("w"), ""),  # single-char symbols
                F.array(F.lit(EOW)),
            ),
        )
    )


def _merge_fold(a: str, b: str) -> F.Column:
    """Left-to-right greedy application of ONE merge (a,b)→a+b over a
    symbol array column `s`."""

    def esc(t: str) -> str:
        return t.replace("\\", "\\\\").replace("'", "\\'")

    return F.expr(
        f"aggregate(s, cast(array() as array<string>), (acc, x) -> "
        f"if(size(acc) > 0 AND element_at(acc, -1) = '{esc(a)}' "
        f"AND x = '{esc(b)}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{esc(a + b)}')), "
        f"concat(acc, array(x))))"
    )


def _bpe_loop(words: DataFrame, n_merges: int) -> tuple[list, DataFrame]:
    """The sequential merge loop over the word table; returns the merge
    list and the words table with final symbol arrays (the trained
    tokenizer's word → subwords mapping)."""
    merges = []
    for step in range(1, n_merges + 1):
        pairs = (
            # fully-merged words (single symbol) have no pairs left;
            # without the filter sequence(1, 0) DESCENDS and element_at
            # goes out of bounds
            words.filter(F.size("s") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " j -> struct(element_at(s, j) AS left,"
                        "             element_at(s, j + 1) AS right))"
                    )
                ).alias("p"),
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("n").alias("pair_count"))
        )
        top = pairs.orderBy(
            F.col("pair_count").desc(), F.col("left"), F.col("right")
        ).limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0].left, top[0].right, top[0].pair_count
        merges.append((step, a, b, a + b, cnt))
        words = checkpoint_df(words.withColumn("s", _merge_fold(a, b)))
    return merges, words


def bpe_tokenize(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Apply the learned BPE tokenizer to the corpus — the serving half
    of `bpe_learn`: the merge loop yields the word → subword-sequence
    mapping ON THE WORD TABLE (never the corpus), and the corpus is
    then tokenized by a join from exploded doc words to that mapping.
    At web scale the word table is millions of rows, so the join is a
    plain shuffle join (or broadcast once the vocabulary is capped) —
    the corpus-side pass stays a single explode + join + re-agg.

    Returns per doc: (doc_id, n_words, n_subwords, max_word_subwords).
    Rows-only entry; exact parity with serial reference tokenization
    is pinned in tests/test_llm_ops.py."""
    _, words = _bpe_loop(_bpe_words(spark, sf_dir), n_merges)
    word_map = words.select(
        "w", F.size("s").alias("word_subwords")
    )
    docs = load_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    return (
        doc_words.join(word_map, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("word_subwords").alias("n_subwords"),
            F.max("word_subwords").alias("max_word_subwords"),
        )
    )


def bpe_merges_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_learn(spark, sf_dir)


def bpe_tokenize_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_tokenize(spark, sf_dir)


QUERIES = {
    "text_bpe_merges": bpe_merges_entry,
    "text_bpe_tokenize": bpe_tokenize_entry,
    "text_winnowed_fingerprints": winnowed_fingerprints,
    "text_topic_clusters": topic_clusters,
    "text_topic_serving": topic_clusters_serving,
    "text_hash_embedding": hash_embedding,
    "text_ngram_topk": ngram_topk,
    "text_bpe_token_count": bpe_token_count,
    "text_pack_sequences": pack_sequences,
    "text_repetition_metrics": repetition_metrics,
    "text_contamination": contamination_overlap,
    "text_token_stats": token_stats,
    "text_quality_score": quality_score,
    "text_quality_curriculum": quality_curriculum,
    "text_lang_id_confusion": lang_id_confusion,
    "text_fingerprint": fingerprint,
    "text_source_lang_rollup": source_lang_rollup,
    "text_unigram_logprob": unigram_logprob,
    "text_bigram_logprob": bigram_logprob,
    "text_source_divergence": source_divergence,
}

ORACLES = {
    "text_ngram_topk": _NGRAM_TOPK_SQL,
    "text_hash_embedding": _HASH_EMBED_SQL,
    "text_bpe_token_count": _BPE_COUNT_SQL,
    "text_pack_sequences": _PACK_SQL,
    "text_repetition_metrics": _REPETITION_SQL,
    "text_contamination": _CONTAMINATION_SQL,
    "text_token_stats": _TOKEN_STATS_SQL,
    "text_quality_score": _QUALITY_SQL,
    "text_quality_curriculum": _CURRICULUM_SQL,
    "text_lang_id_confusion": _LANG_ID_SQL,
    "text_fingerprint": _FINGERPRINT_SQL,
    "text_source_lang_rollup": _SOURCE_LANG_SQL,
    "text_unigram_logprob": _UNIGRAM_LM_SQL,
    "text_bigram_logprob": _BIGRAM_LM_SQL,
    "text_source_divergence": _SOURCE_DIVERGENCE_SQL,
}
