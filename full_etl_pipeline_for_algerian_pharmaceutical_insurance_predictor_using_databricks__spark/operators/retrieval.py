"""Text-retrieval operators over `documents` — TF-IDF term profiles and
BM25 keyword search (north-star extension; the ranking layer a corpus
pipeline uses for inspection tooling and query-based filtering).

Scale design: both operators are one tokenize pass → per-(doc, term)
count aggregate → a join against the term-level document-frequency
table.  The df table has |vocabulary| rows (tiny relative to the
corpus) and is broadcast; for BM25 the query-term df is a handful of
rows.  No UDFs, no driver loops — `ln` / arithmetic stay in codegen.
Top-k per document uses a window PARTITIONED by doc_id (never the
unpartitioned trap); the global BM25 top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources import load_table

TFIDF_TOP_TERMS = 3

#: BM25 free parameters (the standard Robertson defaults) and the demo
#: query — `dup` is the fixture's one discriminative term.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ["dup", "spark", "merge"]
BM25_TOP_K = 20


def _doc_term_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — whitespace tokens, lowercased."""
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    return tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def tfidf_top_terms(
    spark: SparkSession, sf_dir: str, top: int = TFIDF_TOP_TERMS
) -> DataFrame:
    """Top `top` terms per document by tf·idf (idf = ln(N/df), the
    plain Salton form — N from a 1-row broadcast aggregate, df from the
    |vocab|-row broadcast term table).  Deterministic tie-break on the
    term string."""
    docs = load_table(spark, sf_dir, "documents")
    tfs = _doc_term_counts(docs)
    df_tab = tfs.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.groupBy().agg(F.count("*").alias("n_docs"))
    scored = (
        tfs.join(F.broadcast(df_tab), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top)
        .select("doc_id", "term_rank", "term", "tf", "tfidf")
    )


_TFIDF_SQL = rf"""
WITH tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents
    )
    GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, term, tf,
           tf * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term_rank, term, tf, tfidf
FROM (
    SELECT doc_id, term, tf, tfidf,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term)
               AS term_rank
    FROM scored
)
WHERE term_rank <= {TFIDF_TOP_TERMS}
"""


def bm25_search(
    spark: SparkSession,
    sf_dir: str,
    query: list[str] | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top: int = BM25_TOP_K,
) -> DataFrame:
    """Global top-`top` documents for a bag-of-terms query under BM25
    (Robertson/Sparck Jones):

        score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1-b + b·|d|/avgdl))
        idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))

    The query-term filter runs BEFORE any join (only matching (doc,
    term) rows survive the tokenize pass), query-term dfs and the
    (N, avgdl) scalars are broadcast, and the final ordering is a
    top-k (TakeOrderedAndProject), so the corpus is never globally
    sorted.  Ties break on doc_id."""
    if query is None:
        query = BM25_QUERY
    docs = load_table(spark, sf_dir, "documents")
    terms = [t.lower() for t in query]
    tfs = _doc_term_counts(docs).filter(F.col("term").isin(terms))
    dl = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("dl")
    )
    stats = docs.groupBy().agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("avgdl"),
    )
    df_tab = tfs.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1) / norm
    scored = (
        tfs.join(F.broadcast(df_tab), "term")
        .join(dl.hint("shuffle_hash"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
    )
    w = Window.orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("rank", "doc_id", "score")
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return rf"""
WITH tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents
    )
    GROUP BY doc_id, term
),
qtf AS (SELECT * FROM tf WHERE term IN ({terms})),
df AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY term),
dl AS (
    SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS dl
    FROM documents
),
stats AS (
    SELECT COUNT(*) AS n_docs,
           AVG(len(regexp_split_to_array(trim(text), '\s+'))) AS avgdl
    FROM documents
),
scored AS (
    SELECT doc_id,
           SUM(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * ({BM25_K1} + 1)
               / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))
           ) AS score
    FROM qtf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY doc_id
)
SELECT rank, doc_id, score
FROM (
    SELECT doc_id, score,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
    FROM scored
)
WHERE rank <= {BM25_TOP_K}
"""


_BM25_SQL = _bm25_sql()


QUERIES = {
    "text_tfidf_top_terms": tfidf_top_terms,
    "text_bm25_search": bm25_search,
}

ORACLES = {
    "text_tfidf_top_terms": _TFIDF_SQL,
    "text_bm25_search": _BM25_SQL,
}
