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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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


QUERIES = {
    "sample_hash_mod": sample_hash_mod,
    "sample_bernoulli": sample_bernoulli,
    "sample_stratified_by_lang": sample_stratified_by_lang,
}

ORACLES = {
    "sample_hash_mod": _HASH_SAMPLE_SQL,
}
