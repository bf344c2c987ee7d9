"""Sampling operators for training-data pipelines.

Three tiers, by reproducibility guarantee:

1. **Key-hash sampling** (`sample_hash_mod`) — membership decided by a
   hash of the row's key, not an RNG: the same row lands in the sample
   on every engine, every run, any partitioning, and the sample grows
   consistently when the corpus grows (a doc's membership never
   flips). This is how large corpus pipelines take resumable slices;
   it's also exactly SQL-expressible, so it is value-checked against
   DuckDB.
2. **Seeded Bernoulli** (`sample_bernoulli`) — `df.sample`:
   deterministic for a fixed seed + partitioning, cheap, but the
   partition-dependent RNG means no cross-engine oracle (rows-only).
3. **Stratified** (`sample_stratified_by_lang`) — `df.sampleBy` with
   per-stratum fractions: balances skewed strata (e.g. downsample the
   dominant language); rows-only + tolerance-tested.
4. **Weighted without replacement** (`sample_weighted_topk`) —
   Efraimidis–Spirakis A-ES: per-row key ln(u)/w with u a HASH-derived
   uniform (tier-1 determinism, so cross-engine oracle-checkable) and
   w the row's weight; the global top-k by key is an exact weighted
   sample without replacement.  The distributed shape is a top-k
   (TakeOrderedAndProject), never a sort — the standard way to draw a
   quality-weighted training subset from a 100-TB corpus in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources import load_table

HASH_SAMPLE_PCT = 10  # keep doc if hash(doc_id) % 100 < 10
BERNOULLI_FRACTION = 0.1
SEED = 42
STRATA_FRACTIONS = {"en": 0.05, "fr": 0.2, "ar": 0.2, "es": 0.2, "de": 0.2}


def _hash_bucket(key) -> F.Column:
    """First 8 md5 hex digits of the key as an integer in [0, 100) —
    identical math in Spark and DuckDB."""
    h = F.substring(F.md5(key.cast("string")), 1, 8)
    return F.conv(h, 16, 10).cast("bigint") % 100


def sample_hash_mod(
    spark: SparkSession, sf_dir: str, pct: int = HASH_SAMPLE_PCT
) -> DataFrame:
    """Reproducible ~pct% corpus slice by doc_id hash (tier 1)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(_hash_bucket(F.col("doc_id")) < pct).select(
        "doc_id", "lang", "source", "n_chars"
    )


_HASH_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
      < {HASH_SAMPLE_PCT}
"""


def sample_bernoulli(
    spark: SparkSession,
    sf_dir: str,
    fraction: float = BERNOULLI_FRACTION,
    seed: int = SEED,
) -> DataFrame:
    """Seeded per-row Bernoulli sample (tier 2; rows-only check)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.sample(fraction=fraction, seed=seed).select("doc_id", "lang")


def sample_stratified_by_lang(
    spark: SparkSession,
    sf_dir: str,
    fractions: dict[str, float] | None = None,
    seed: int = SEED,
) -> DataFrame:
    """Per-language fractions via sampleBy (tier 3; rows-only check).
    Unlisted strata default to 0 (dropped) — the corpus-rebalancing
    shape: keep 5% of the dominant language, 20% of the rest."""
    docs = load_table(spark, sf_dir, "documents")
    if fractions is None:
        fractions = STRATA_FRACTIONS
    return docs.sampleBy("lang", fractions, seed=seed).select("doc_id", "lang")


WEIGHTED_K = 50


def sample_weighted_topk(
    spark: SparkSession, sf_dir: str, k: int = WEIGHTED_K
) -> DataFrame:
    """Exact weighted sample WITHOUT replacement (A-ES, tier 4 above):
    weight = n_chars (longer docs proportionally likelier), uniform u
    from the first 15 md5 hex digits of doc_id (deterministic, dense in
    (0,1)), key = ln(u)/w, keep the k LARGEST keys.  Selection
    probabilities follow the Efraimidis–Spirakis guarantee; the hash-u
    makes the draw reproducible on any engine/partitioning, which is
    what lets DuckDB value-check it."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )
    key = F.log(u) / F.col("n_chars")
    w = Window.orderBy(F.desc("es_key"), F.asc("doc_id"))
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "n_chars", key.alias("es_key"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "lang", "n_chars")
    )


_WEIGHTED_SQL = f"""
SELECT rank, doc_id, lang, n_chars
FROM (
    SELECT doc_id, lang, n_chars,
           ROW_NUMBER() OVER (
               ORDER BY ln(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                           / CAST({1 << 60} AS DOUBLE)) / n_chars DESC,
                        doc_id ASC
           ) AS rank
    FROM documents
    WHERE n_chars > 0
)
WHERE rank <= {WEIGHTED_K}
"""


QUERIES = {
    "sample_hash_mod": sample_hash_mod,
    "sample_bernoulli": sample_bernoulli,
    "sample_stratified_by_lang": sample_stratified_by_lang,
    "sample_weighted_topk": sample_weighted_topk,
}

ORACLES = {
    "sample_hash_mod": _HASH_SAMPLE_SQL,
    "sample_weighted_topk": _WEIGHTED_SQL,
}
