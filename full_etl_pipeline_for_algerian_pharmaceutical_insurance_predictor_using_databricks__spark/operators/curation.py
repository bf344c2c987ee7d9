"""Corpus-curation operators — the data-engineering surface around a
training corpus that SURVEY.md §2's reference queries don't cover but a
100-TB pipeline needs: pattern scrubbing (PII redaction), context-window
chunking, deterministic dataset splits, temperature-scaled mixture
weights, key-skew diagnostics, and equi-depth histograms.

Everything is built-in `pyspark.sql.functions` — JVM-side regex/array
expressions and small aggregates; no Python in any hot path.  Scale
notes per operator:

- Redaction and chunking are embarrassingly parallel narrow maps.
- The split is decided by a salted key hash (like sampling.py's tier-1
  sampler): membership is engine-, partitioning- and corpus-growth-
  independent, so the same doc never migrates between train and test
  across snapshots — the property that matters for honest evals.
- Mixture weights aggregate to one row per (source, lang) stratum
  (tiny), so the normalizing total is a broadcast 1-row cross join.
- Heavy hitters aggregate per key first (map-side partials take the
  skew), then rank the small aggregated frame; the ordered window runs
  over per-key ROWS (≤ distinct keys), never the raw table.
- The equi-depth histogram derives its bucket edges from ONE exact
  `percentile` aggregate (single pass, mergeable sketch-free exact
  percentile), broadcasts the k-row edge list, and buckets with a
  range condition — no global sort, no unpartitioned `ntile` (the
  SURVEY §4.3.1 trap an ntile-based equi-depth would hit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..sources import load_table

# --------------------------------------------------------------------------
# 1. PII / pattern redaction
# --------------------------------------------------------------------------

#: (name, pattern, replacement) — applied in order.  The regex subset
#: used (classes, \b, {m,n}) behaves identically in Java regex (Spark)
#: and RE2 (DuckDB).  EMAIL/IP/PHONE are the standard scrub set; TERM
#: is a configurable denylist (here the fixture-visible word "key") —
#: the same mechanism scrubs credentials, usernames, or blocked terms.
REDACTION_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9().-]{6,}[0-9]", "<PHONE>"),
    ("term", r"\b(key|secret|token)\b", "<TERM>"),
]


def with_redaction(docs: DataFrame) -> DataFrame:
    """Append per-rule hit counts (counted on the ORIGINAL text, so
    counts are independent of rule order), the total, and the scrubbed
    text to any documents-shaped frame (batch OR streaming —
    stateless expressions only)."""
    clean: Column = F.col("text")
    cols: dict[str, Column] = {}
    total: Column | None = None
    for name, pattern, repl in REDACTION_RULES:
        c = F.regexp_count(F.col("text"), F.lit(pattern))
        cols[f"n_{name}"] = c
        total = c if total is None else total + c
        clean = F.regexp_replace(clean, pattern, repl)
    cols["n_redactions"] = total
    cols["clean_text"] = clean
    return docs.withColumns(cols)


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub every rule's matches from `text`; report per-rule hit
    counts and the scrubbed text.  One narrow projection — a map-only
    pass at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return with_redaction(docs).select(
        "doc_id",
        *[f"n_{name}" for name, _, _ in REDACTION_RULES],
        "n_redactions",
        "clean_text",
    )


def _pii_sql() -> str:
    count_cols = ",\n    ".join(
        f"len(regexp_extract_all(text, '{p}')) AS n_{n}"
        for n, p, _ in REDACTION_RULES
    )
    total = " + ".join(
        f"len(regexp_extract_all(text, '{p}'))" for n, p, _ in REDACTION_RULES
    )
    clean = "text"
    for _, p, r in REDACTION_RULES:
        clean = f"regexp_replace({clean}, '{p}', '{r}', 'g')"
    return f"""
SELECT
    doc_id,
    {count_cols},
    {total} AS n_redactions,
    {clean} AS clean_text
FROM documents
"""


_PII_SQL = _pii_sql()

# --------------------------------------------------------------------------
# 2. Context-window chunking with overlap
# --------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_windows(
    spark: SparkSession,
    sf_dir: str,
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split each document into overlapping token windows (the
    context-window prep step before tokenization/packing): chunk i
    covers tokens [i·stride + 1, i·stride + window]; the last chunk may
    be short; docs with ≤ `window` tokens yield one chunk.  Built as
    split → sequence → transform → posexplode: pure expression codegen,
    no shuffle, chunk text re-assembled with `slice` + `concat_ws`
    (never re-tokenized per chunk)."""
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("a")
    ).withColumn("n_tok", F.size("a"))
    n_chunks = F.when(
        F.col("n_tok") <= window, F.lit(1)
    ).otherwise(
        F.floor((F.col("n_tok") - window + stride - 1) / stride).cast("int") + 1
    )
    chunk = F.expr(
        f"transform(sequence(0, n_chunks - 1), i -> struct("
        f" i AS chunk_idx,"
        f" i * {stride} + 1 AS start_tok,"
        f" least({window}, n_tok - i * {stride}) AS chunk_tokens,"
        f" concat_ws(' ', slice(a, i * {stride} + 1, {window})) AS chunk_text))"
    )
    return (
        arr.withColumn("n_chunks", n_chunks)
        .select("doc_id", "n_tok", F.explode(chunk).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.start_tok").cast("long").alias("start_tok"),
            F.col("c.chunk_tokens").cast("long").alias("chunk_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


_CHUNK_SQL = rf"""
WITH arrs AS (
    SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS a,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
    FROM documents
),
n AS (
    SELECT doc_id, a, n_tok,
           CASE WHEN n_tok <= {CHUNK_TOKENS} THEN 1
                ELSE CAST(FLOOR((n_tok - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                                / {CHUNK_STRIDE}) AS INT) + 1
           END AS n_chunks
    FROM arrs
),
idx AS (
    SELECT doc_id, a, n_tok, unnest(generate_series(0, n_chunks - 1)) AS i
    FROM n
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT) AS start_tok,
       CAST(LEAST({CHUNK_TOKENS}, n_tok - i * {CHUNK_STRIDE}) AS BIGINT)
           AS chunk_tokens,
       array_to_string(
           a[(i * {CHUNK_STRIDE} + 1):(i * {CHUNK_STRIDE} + {CHUNK_TOKENS})],
           ' ') AS chunk_text
FROM idx
"""

# --------------------------------------------------------------------------
# 3. Deterministic train/val/test split
# --------------------------------------------------------------------------

SPLIT_SALT = "split:"
TRAIN_PCT, VAL_PCT = 96, 2  # test gets the remaining 2%


def with_split(docs: DataFrame) -> DataFrame:
    """Append the salted-hash bucket and split assignment to any
    documents-shaped frame (batch OR streaming)."""
    h = F.substring(F.md5(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))), 1, 8)
    bucket = F.conv(h, 16, 10).cast("bigint") % 100
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return docs.withColumns({"bucket": bucket, "split": split})


def train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way dataset split by salted key hash: bucket =
    int(md5('split:' || doc_id)[:8]) % 100 → train < 96 ≤ val < 98 ≤
    test.  Same guarantees as sampling.sample_hash_mod (reproducible on
    any engine/partitioning; membership stable under corpus growth);
    the salt decorrelates the split from any other hash-derived slice
    of the same key space."""
    docs = load_table(spark, sf_dir, "documents")
    return with_split(docs).select("doc_id", "lang", "bucket", "split")


_SPLIT_SQL = f"""
SELECT doc_id,
       lang,
       ('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 100 AS bucket,
       CASE WHEN ('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % 100 < {TRAIN_PCT} THEN 'train'
            WHEN ('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test'
       END AS split
FROM documents
"""

# --------------------------------------------------------------------------
# 4. Temperature-scaled mixture weights
# --------------------------------------------------------------------------

MIXTURE_ALPHA = 0.7
TOKEN_BUDGET = 10_000_000  # tokens drawn per training epoch of the mixture


def mixture_weights(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = MIXTURE_ALPHA,
    budget: int = TOKEN_BUDGET,
) -> DataFrame:
    """Sampling weights per (source, lang) stratum with temperature
    `alpha` (the multilingual-pretraining rule: weight ∝ size^α, α < 1
    upweights small strata): w = chars^α / Σ chars^α, plus the epochs
    each stratum is traversed when `budget` chars are drawn per epoch
    of the mixture (epochs > 1 ⇒ that stratum repeats).  One small
    aggregate; the normalizer is a broadcast 1-row cross join."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count("*").alias("docs"),
        F.sum("n_chars").alias("chars"),
    )
    raw = F.pow(F.col("chars").cast("double"), F.lit(alpha))
    w = per.withColumn("_raw", raw)
    total = w.agg(F.sum("_raw").alias("_tot"))
    weight = F.col("_raw") / F.col("_tot")
    return (
        w.crossJoin(F.broadcast(total))
        .select(
            "source",
            "lang",
            "docs",
            "chars",
            weight.alias("mix_weight"),
            (weight * budget / F.col("chars")).alias("epochs"),
        )
    )


_MIXTURE_SQL = f"""
WITH per AS (
    SELECT source, lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY source, lang
),
t AS (SELECT SUM(POWER(CAST(chars AS DOUBLE), {MIXTURE_ALPHA})) AS _tot FROM per)
SELECT source,
       lang,
       docs,
       chars,
       POWER(CAST(chars AS DOUBLE), {MIXTURE_ALPHA}) / _tot AS mix_weight,
       POWER(CAST(chars AS DOUBLE), {MIXTURE_ALPHA}) / _tot * {TOKEN_BUDGET} / chars
           AS epochs
FROM per CROSS JOIN t
"""

# --------------------------------------------------------------------------
# 5. Heavy-hitter / key-skew profile
# --------------------------------------------------------------------------

HH_TOP_K = 15


def heavy_hitters(
    spark: SparkSession, sf_dir: str, k: int = HH_TOP_K
) -> DataFrame:
    """Key-distribution diagnostic over `events.user_id` — the skew
    report that decides salting / AQE skew-join knobs before a big run:
    top-k keys by row count with per-key share and cumulative share.
    Aggregates per key FIRST (map-side partials absorb the skew), then
    ranks the ≤|keys| aggregated rows; the ordered window never sees
    the raw table."""
    ev = load_table(spark, sf_dir, "events")
    total = ev.groupBy().agg(F.count("*").alias("_tot"))
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("events"))
    w = Window.orderBy(F.desc("events"), "user_id")
    ranked = (
        per_key.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_events",
            F.sum("events").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("rank") <= k)
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "user_id",
        "events",
        (F.col("events") / F.col("_tot")).alias("share"),
        (F.col("cum_events") / F.col("_tot")).alias("cum_share"),
    )


_HH_SQL = f"""
WITH per_key AS (
    SELECT user_id, COUNT(*) AS events FROM events GROUP BY user_id
),
ranked AS (
    SELECT user_id, events,
           ROW_NUMBER() OVER (ORDER BY events DESC, user_id) AS rank,
           SUM(events) OVER (ORDER BY events DESC, user_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_events
    FROM per_key
),
t AS (SELECT COUNT(*) AS _tot FROM events)
SELECT rank, user_id, events,
       CAST(events AS DOUBLE) / _tot AS share,
       CAST(cum_events AS DOUBLE) / _tot AS cum_share
FROM ranked CROSS JOIN t
WHERE rank <= {HH_TOP_K}
"""

# --------------------------------------------------------------------------
# 6. Equi-depth histogram (exact percentile edges, no global sort)
# --------------------------------------------------------------------------

EQUIDEPTH_BUCKETS = 8


def equidepth_histogram(
    spark: SparkSession, sf_dir: str, k: int = EQUIDEPTH_BUCKETS
) -> DataFrame:
    """Equi-depth histogram of `orders.o_totalprice`: bucket edges are
    the exact i/k percentiles (ONE `percentile` aggregate — single
    pass), each row lands in the first bucket whose upper edge covers
    it (value ≤ edge_i; the top edge is the max so every row lands),
    then per-bucket count/min/max/avg.  No global sort and no
    unpartitioned `ntile` — the scale-safe formulation of equi-depth
    (edges broadcast from a 1-row aggregate; ties share a bucket, so
    counts are only approximately n/k under heavy ties, as in every
    edge-based equi-depth)."""
    orders = load_table(spark, sf_dir, "orders")
    edges = orders.agg(
        F.percentile(
            F.col("o_totalprice"), F.array(*[F.lit(i / k) for i in range(1, k + 1)])
        ).alias("edges")
    )
    with_edges = orders.crossJoin(F.broadcast(edges))
    bucket = None
    for i in range(k - 1, 0, -1):
        cond = F.col("o_totalprice") <= F.col("edges")[i - 1]
        bucket = F.when(cond, i) if bucket is None else F.when(cond, i).otherwise(bucket)
    # rows above edge k-1 (the (k-1)/k percentile) fall in bucket k
    bucket = F.coalesce(bucket, F.lit(k)) if bucket is not None else F.lit(1)
    return (
        with_edges.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


def _equidepth_sql() -> str:
    k = EQUIDEPTH_BUCKETS
    edges = ", ".join(
        f"quantile_cont(o_totalprice, {i}.0/{k}) AS e{i}" for i in range(1, k)
    )
    cases = " ".join(
        f"WHEN o_totalprice <= e{i} THEN {i}" for i in range(1, k)
    )
    return f"""
WITH e AS (SELECT {edges} FROM orders)
SELECT CASE {cases} ELSE {k} END AS bucket,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders CROSS JOIN e
GROUP BY 1
"""


_EQUIDEPTH_SQL = _equidepth_sql()


# --------------------------------------------------------------------------
# 7. Per-source document cap (domain rebalancing)
# --------------------------------------------------------------------------

CAP_PER_SOURCE = 15
CAP_SALT = "cap:"


def cap_per_source(
    spark: SparkSession, sf_dir: str, k: int = CAP_PER_SOURCE
) -> DataFrame:
    """Cap every source (domain) at k documents — the standard guard
    against one crawled domain dominating the mixture.  Which k survive
    is decided by a salted doc_id hash, NOT an RNG: the pick is
    engine-, partitioning- and re-run-independent, and adding new
    sources never changes another source's survivors.

    Scale: `row_number <= k` over `partitionBy(source)` compiles to
    WindowGroupLimit — each task keeps a k-row heap per source and
    discards the rest BEFORE the exchange, so a billion-doc domain
    ships ~k rows per input partition, never a full per-source sort
    (plan asserted in tests/test_curation.py)."""
    docs = load_table(spark, sf_dir, "documents")
    rank_key = F.conv(
        F.substring(F.md5(F.concat(F.lit(CAP_SALT), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("source").orderBy(rank_key, "doc_id")
    return (
        docs.withColumn("cap_rank", F.row_number().over(w))
        .filter(F.col("cap_rank") <= k)
        .select("source", "cap_rank", "doc_id", "lang", "n_chars")
    )


_CAP_SQL = f"""
WITH ranked AS (
    SELECT source, doc_id, lang, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5('{CAP_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                        doc_id
           ) AS cap_rank
    FROM documents
)
SELECT source, cap_rank, doc_id, lang, n_chars
FROM ranked WHERE cap_rank <= {CAP_PER_SOURCE}
"""


# --------------------------------------------------------------------------
# 8. One-pass column profiler (data-quality diagnostics)
# --------------------------------------------------------------------------

#: (column, kind) — kind decides which min/max slot the column fills:
#: numerics and timestamps profile numerically (timestamps as epoch
#: seconds), strings lexically.
PROFILE_COLS: list[tuple[str, str]] = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
]


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the orders table — row count,
    null count, exact distinct count, numeric min/max (timestamps as
    epoch seconds), lexical min/max — the scan you run before trusting
    a new 100-TB drop.

    ONE aggregation computes every stat (map-side partials absorb the
    whole table; the multi-DISTINCT expands to Catalyst's Expand, never
    a per-column rescan), yielding a single row that `stack` unpivots
    into one output row per column — the shuffle carries partial-agg
    rows only, never a row-multiplied explode of the input."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for name, kind in PROFILE_COLS:
        c = F.col(name)
        num = (
            F.unix_timestamp(c).cast("double")
            if kind == "date"
            else c.cast("double") if kind == "num" else F.lit(None).cast("double")
        )
        s = c.cast("string") if kind == "str" else F.lit(None).cast("string")
        aggs += [
            F.count(c).alias(f"{name}__nn"),
            F.count_distinct(c).alias(f"{name}__nd"),
            F.min(num).alias(f"{name}__mnn"),
            F.max(num).alias(f"{name}__mxn"),
            F.min(s).alias(f"{name}__mns"),
            F.max(s).alias(f"{name}__mxs"),
        ]
    one = orders.agg(F.count("*").alias("__rows"), *aggs)
    stack_args = ", ".join(
        f"'{name}', {name}__nn, {name}__nd, {name}__mnn, {name}__mxn, "
        f"{name}__mns, {name}__mxs"
        for name, _ in PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_non_null, n_distinct, min_num, max_num, min_str, max_str)",
        "__rows AS n_rows",
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_non_null")).alias("n_nulls"),
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


def _profile_sql() -> str:
    parts = []
    for name, kind in PROFILE_COLS:
        if kind == "date":
            mn = f"CAST(FLOOR(EXTRACT(epoch FROM MIN({name}))) AS DOUBLE)"
            mx = f"CAST(FLOOR(EXTRACT(epoch FROM MAX({name}))) AS DOUBLE)"
            mns = mxs = "CAST(NULL AS VARCHAR)"
        elif kind == "num":
            mn, mx = f"CAST(MIN({name}) AS DOUBLE)", f"CAST(MAX({name}) AS DOUBLE)"
            mns = mxs = "CAST(NULL AS VARCHAR)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            mns, mxs = f"MIN({name})", f"MAX({name})"
        parts.append(
            f"SELECT '{name}' AS col_name, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({name}) AS n_nulls, "
            f"COUNT(DISTINCT {name}) AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num, "
            f"{mns} AS min_str, {mxs} AS max_str FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


_PROFILE_SQL = _profile_sql()


# --------------------------------------------------------------------------
# 8. End-to-end curation ledger
# --------------------------------------------------------------------------

CAP_SALT_LEDGER = "cap:"  # same salt family as cap_per_source


def curate_corpus(
    spark: SparkSession, sf_dir: str, cap_k: int = CAP_PER_SOURCE
) -> DataFrame:
    """The whole curation pipeline as ONE auditable ledger: every input
    document lands in exactly one row with its final status and, if
    dropped, the FIRST stage that dropped it — the provenance artifact
    a 100-TB corpus build ships next to the training set, because
    "how many docs did near-dup remove after quality filtering"
    is unanswerable from the kept set alone.

    Stage order (each applies to the previous stages' survivors):
      1. quality     — Gopher/C4-style verdict 'drop'
      2. exact_duplicate — non-min doc_id within a fingerprint group
      3. near_duplicate  — non-min SURVIVOR within a Jaccard CC cluster
      4. source_cap  — salted-hash rank > cap_k within a source

    Spark shape: the stage predicates are CONDITIONAL WINDOW MINIMA on
    one wide frame (`min(when(survivor, doc_id)) over (partition by
    group)`), so sequential semantics cost no sequential passes — one
    fingerprint window, one cluster join + window, one capped-rank
    join.  The near-dup clusters come from the pointer-doubled CC
    (`dedup.dedup_clusters`); keeper choice among survivors (not among
    all members) is what makes stage order observable: a cluster whose
    min doc_id was quality-dropped elects its next-smallest SURVIVOR.
    A keeper elected at stage 2/3 can still fall to the source cap —
    the ledger records that honestly (`keeper_doc_id` points at it
    either way; duplicates are not resurrected).

    Rows-only entry: the CC stage has no SQL twin; the partition /
    precedence / per-group-uniqueness invariants are pinned in
    tests/test_curation.py."""
    from .dedup import dedup_clusters
    from .text import with_quality

    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " ")
    )
    base = with_quality(docs).select(
        "doc_id",
        "source",
        "lang",
        F.md5(normalized).alias("fingerprint"),
        (F.col("verdict") != "drop").alias("q_ok"),
    )
    w_fp = Window.partitionBy("fingerprint")
    base = base.withColumn(
        "fp_keeper", F.min(F.when(F.col("q_ok"), F.col("doc_id"))).over(w_fp)
    ).withColumn("s2", F.col("q_ok") & (F.col("doc_id") == F.col("fp_keeper")))
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    w_cl = Window.partitionBy("cluster_id")
    base = (
        base.join(clusters, "doc_id")
        .withColumn(
            "cl_keeper", F.min(F.when(F.col("s2"), F.col("doc_id"))).over(w_cl)
        )
        .withColumn("s3", F.col("s2") & (F.col("doc_id") == F.col("cl_keeper")))
    )
    rank_key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(CAP_SALT_LEDGER), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    w_cap = Window.partitionBy("source").orderBy(rank_key, "doc_id")
    capped = (
        base.filter(F.col("s3"))
        .withColumn("cap_rank", F.row_number().over(w_cap))
        .select("doc_id", "cap_rank")
    )
    ledger = base.join(capped, "doc_id", "left").withColumn(
        "reason",
        F.when(~F.col("q_ok"), "quality")
        .when(~F.col("s2"), "exact_duplicate")
        .when(~F.col("s3"), "near_duplicate")
        .when(F.col("cap_rank") > cap_k, "source_cap"),
    )
    kept_split = with_split(ledger.filter(F.col("reason").isNull())).select(
        "doc_id", "split"
    )
    return (
        ledger.join(kept_split, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "lang",
            F.when(F.col("reason").isNull(), "kept")
            .otherwise("dropped")
            .alias("status"),
            "reason",
            F.when(F.col("reason") == "exact_duplicate", F.col("fp_keeper"))
            .when(F.col("reason") == "near_duplicate", F.col("cl_keeper"))
            .alias("keeper_doc_id"),
            "split",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# 9. Boilerplate-segment scrubbing (CCNet-style sub-document dedup)
# --------------------------------------------------------------------------

SEG_TOKENS = 2  # segment = non-overlapping token window (corpus has no \n)
BOILER_TOP_K = 64  # heavy-hitter segments scrubbed corpus-wide


def with_segments(docs: DataFrame, seg_tokens: int = SEG_TOKENS) -> DataFrame:
    """(doc_id, seg_idx, seg_text) segmentation of any documents-shaped
    frame — batch OR streaming (narrow map, no state): fixed
    non-overlapping token windows, last segment may be short."""
    arr = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("a")
    ).withColumn("n_segs", F.ceil(F.size("a") / F.lit(seg_tokens)).cast("int"))
    seg = F.expr(
        f"transform(sequence(0, n_segs - 1), i -> struct("
        f" i AS seg_idx,"
        f" concat_ws(' ', slice(a, i * {seg_tokens} + 1, {seg_tokens})) AS seg_text))"
    )
    return arr.select("doc_id", F.explode(seg).alias("s")).select(
        "doc_id",
        F.col("s.seg_idx").cast("int").alias("seg_idx"),
        F.col("s.seg_text").alias("seg_text"),
    )


def boilerplate_scrub(
    spark: SparkSession,
    sf_dir: str,
    seg_tokens: int = SEG_TOKENS,
    top_k: int = BOILER_TOP_K,
) -> DataFrame:
    """Sub-document boilerplate removal, the CCNet/RefinedWeb curation
    step the whole-doc dedup family can't express: segment every
    document (fixed token windows standing in for lines — the fixture
    corpus has no newlines), rank segments by corpus-wide document
    frequency, and scrub the top-k heavy hitters from every document,
    reassembling the surviving text in original order.  A rank
    threshold (not a df fraction) keeps the operator non-degenerate at
    any corpus size: "the 64 most widespread segments" is meaningful
    at sf0.001 and at 100 TB alike.

    Spark shape (guide §2.4 — remove shuffles outright): the df
    ranking explodes each doc's DISTINCT segments (per-row dedup, so
    plain count(*) ≡ the per-doc countDistinct while partial map-side
    aggregation ships (seg_text, partial_count) instead of every
    (seg_text, doc_id) pair) into one aggregate whose top-k is a
    TakeOrderedAndProject with a (df DESC, seg_text) total order —
    deterministic under ties and TINY.  The ≤`top_k` boilerplate
    segments then come back as a LITERAL ARRAY (a k-bounded, O(1)-row
    driver fetch — never O(corpus)), so the scrub itself is a pure
    per-row `filter(segments, ...)` projection: no anti-join, and —
    the 100-TB win — no corpus-wide groupBy(doc_id) reassembly
    shuffle; surviving segments are already in original order on their
    row.  Docs whose every segment is boilerplate keep their ledger
    row with segs_kept=0 and empty clean_text, exactly as before."""
    docs = load_table(spark, sf_dir, "documents")
    segs_arr = F.expr(
        f"transform(sequence(0, n_segs - 1), i ->"
        f" concat_ws(' ', slice(a, i * {seg_tokens} + 1, {seg_tokens})))"
    )
    arr = (
        docs.select(
            "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("a")
        )
        .withColumn(
            "n_segs", F.ceil(F.size("a") / F.lit(seg_tokens)).cast("int")
        )
        .withColumn("segs", segs_arr)
    )
    boiler_rows = (
        arr.select(F.explode(F.array_distinct("segs")).alias("seg_text"))
        .groupBy("seg_text")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "seg_text")
        .limit(top_k)
        .select("seg_text")
        .collect()
    )
    boiler_lit = F.array(*[F.lit(r["seg_text"]) for r in boiler_rows])
    kept = F.filter("segs", lambda s: ~F.array_contains(boiler_lit, s))
    return arr.select(
        "doc_id",
        F.col("n_segs").alias("segs_total"),
        F.coalesce(F.size(kept), F.lit(0)).cast("bigint").alias("segs_kept"),
        (
            F.col("n_segs").cast("bigint")
            - F.coalesce(F.size(kept), F.lit(0)).cast("bigint")
        ).alias("segs_dropped"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


_BOILER_SQL = rf"""
WITH arrs AS (
    SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS a,
           CAST(CEIL(len(regexp_split_to_array(trim(text), '\s+'))
                     / {SEG_TOKENS}.0) AS INT) AS n_segs
    FROM documents
),
segs AS (
    SELECT doc_id,
           CAST(i AS INT) AS seg_idx,
           array_to_string(
               a[(i * {SEG_TOKENS} + 1):(i * {SEG_TOKENS} + {SEG_TOKENS})],
               ' ') AS seg_text
    FROM arrs, unnest(generate_series(0, n_segs - 1)) AS t(i)
),
boiler AS (
    SELECT seg_text
    FROM (SELECT seg_text, count(DISTINCT doc_id) AS df
          FROM segs GROUP BY seg_text)
    ORDER BY df DESC, seg_text
    LIMIT {BOILER_TOP_K}
),
kept AS (
    SELECT s.* FROM segs s
    WHERE s.seg_text NOT IN (SELECT seg_text FROM boiler)
),
agg AS (
    SELECT doc_id,
           count(*) AS segs_kept,
           string_agg(seg_text, ' ' ORDER BY seg_idx) AS clean_text
    FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       b.n_segs AS segs_total,
       COALESCE(a.segs_kept, 0) AS segs_kept,
       CAST(b.n_segs AS BIGINT) - COALESCE(a.segs_kept, 0) AS segs_dropped,
       COALESCE(a.clean_text, '') AS clean_text
FROM arrs b LEFT JOIN agg a USING (doc_id)
"""

def substring_dedup(
    spark: SparkSession, sf_dir: str, seg_tokens: int = SEG_TOKENS
) -> DataFrame:
    """Exact substring deduplication (RefinedWeb/SlimPajama stage):
    every segment keeps only its globally FIRST occurrence — ordered by
    (doc_id, seg_idx) — and later repeats are cut out of their
    documents, complementing `boilerplate_scrub` (which drops by
    corpus-frequency rank, not occurrence order).

    Spark shape: the first-occurrence election is `row_number() = 1`
    over (seg_text) ordered by (doc_id, seg_idx) — one shuffle of the
    segment table by segment key, which is the honest cost of a GLOBAL
    first-occurrence semantics (no broadcast shortcut exists: the
    winner set is corpus-sized).  At 100 TB the segment key is hashed
    (fixed width) and the shuffle is the same dedup-by-key exchange as
    `dedup_exact`, just at sub-document granularity; reassembly is the
    one groupBy(doc_id).  Docs whose every segment appeared earlier
    survive as empty rows."""
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("a")
    ).withColumn("segs_total", F.ceil(F.size("a") / F.lit(seg_tokens)).cast("int"))
    segs = with_segments(docs, seg_tokens)
    w = Window.partitionBy("seg_text").orderBy("doc_id", "seg_idx")
    kept = segs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("segs_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg_text"))),
                lambda s: s["seg_text"],
            ),
        ).alias("clean_text"),
    )
    return (
        arr.select("doc_id", "segs_total")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "segs_total",
            F.coalesce(F.col("segs_kept"), F.lit(0).cast("bigint")).alias(
                "segs_kept"
            ),
            (
                F.col("segs_total").cast("bigint")
                - F.coalesce(F.col("segs_kept"), F.lit(0).cast("bigint"))
            ).alias("segs_dropped"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


_SUBSTRING_SQL = rf"""
WITH arrs AS (
    SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS a,
           CAST(CEIL(len(regexp_split_to_array(trim(text), '\s+'))
                     / {SEG_TOKENS}.0) AS INT) AS segs_total
    FROM documents
),
segs AS (
    SELECT doc_id,
           CAST(i AS INT) AS seg_idx,
           array_to_string(
               a[(i * {SEG_TOKENS} + 1):(i * {SEG_TOKENS} + {SEG_TOKENS})],
               ' ') AS seg_text
    FROM arrs, unnest(generate_series(0, segs_total - 1)) AS t(i)
),
kept AS (
    SELECT doc_id, seg_idx, seg_text
    FROM segs
    QUALIFY row_number() OVER (
        PARTITION BY seg_text ORDER BY doc_id, seg_idx) = 1
),
agg AS (
    SELECT doc_id,
           count(*) AS segs_kept,
           string_agg(seg_text, ' ' ORDER BY seg_idx) AS clean_text
    FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       b.segs_total,
       COALESCE(a.segs_kept, 0) AS segs_kept,
       CAST(b.segs_total AS BIGINT) - COALESCE(a.segs_kept, 0) AS segs_dropped,
       COALESCE(a.clean_text, '') AS clean_text
FROM arrs b LEFT JOIN agg a USING (doc_id)
"""

# --------------------------------------------------------------------------
# 10. Leakage-proof (group-aware) dataset split
# --------------------------------------------------------------------------

GSPLIT_SALT = "gsplit:"


def split_leakproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split decided by the hash of the document's
    CONTENT fingerprint, not its id: every exact near-duplicate group
    (same canonical-form md5, the dedup.exact_dedup key) lands in the
    same split by construction, so a test document can never have a
    training-set twin — the eval-contamination failure mode the plain
    id-hash split (`train_split`) cannot rule out.  Same engine/
    partitioning/corpus-growth independence as the id split; the salt
    decorrelates the assignment from the fingerprint's other uses.
    At 100 TB this is a narrow map — no join against a group table,
    because the group KEY is itself derivable per row."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "))
    )
    h = F.substring(F.md5(F.concat(F.lit(GSPLIT_SALT), fp)), 1, 8)
    bucket = F.conv(h, 16, 10).cast("bigint") % 100
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        bucket.alias("bucket"),
        split.alias("split"),
    )


_GSPLIT_SQL = f"""
WITH fp AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS fingerprint
    FROM documents
),
b AS (
    SELECT doc_id, fingerprint,
           ('0x' || substr(md5('{GSPLIT_SALT}' || fingerprint), 1, 8))::BIGINT
               % 100 AS bucket
    FROM fp
)
SELECT doc_id, fingerprint, bucket,
       CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test'
       END AS split
FROM b
"""


QUERIES = {
    "text_pii_redaction": pii_redaction,
    "text_chunk_windows": chunk_windows,
    "sample_train_split": train_split,
    "sample_mixture_weights": mixture_weights,
    "agg_heavy_hitters": heavy_hitters,
    "agg_equidepth_histogram": equidepth_histogram,
    "sample_cap_per_source": cap_per_source,
    "agg_column_profile": column_profile,
    "corpus_curation_ledger": curate_corpus,
    "text_boilerplate_scrub": boilerplate_scrub,
    "text_substring_dedup": substring_dedup,
    "sample_split_leakproof": split_leakproof,
}

ORACLES = {
    "text_pii_redaction": _PII_SQL,
    "text_chunk_windows": _CHUNK_SQL,
    "sample_train_split": _SPLIT_SQL,
    "sample_mixture_weights": _MIXTURE_SQL,
    "agg_heavy_hitters": _HH_SQL,
    "agg_equidepth_histogram": _EQUIDEPTH_SQL,
    "sample_cap_per_source": _CAP_SQL,
    "agg_column_profile": _PROFILE_SQL,
    "text_boilerplate_scrub": _BOILER_SQL,
    "text_substring_dedup": _SUBSTRING_SQL,
    "sample_split_leakproof": _GSPLIT_SQL,
}
