"""Deduplication operators over `documents` / `embeddings` — exact,
token-set Jaccard, MinHash-LSH, SimHash, embedding-cosine near-dup
(north-star extension, SURVEY.md §7b).

Scale design:
- Exact dedup is a hash-groupBy on a fingerprint — one shuffle on the
  hash, arbitrary scale.
- Jaccard near-dup uses the inverted-index self-join formulation
  (token → posting list → pair counts). At 100 TB you bound posting
  lists by dropping ultra-high-df tokens (`max_df`) — the classic
  prefix-filter; the parameter is first-class here.
- MinHash-LSH banding turns all-pairs into per-band hash joins:
  candidates = pairs agreeing on ≥1 band, then exact-verify. Only
  built-in expressions (xxhash64, aggregate, transform) — no UDFs.
- SimHash packs token hashes into a 64-bit signature per doc; near-dup
  = small Hamming distance, found via band-exact match on signature
  quarters (each ≤k-bit-different pair must agree on ≥1 quarter when
  k ≤ 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources import load_table

# --------------------------------------------------------------------------
# shared tokenization
# --------------------------------------------------------------------------


def _token_sets(docs: DataFrame, shingle_n: int | None = None) -> DataFrame:
    """doc_id → exploded distinct tokens (normalized).

    ``shingle_n=None`` tokenizes on whitespace (word sets); an integer
    emits character n-gram shingles of that width instead — the classic
    near-dup unit (robust to word-boundary edits), built with
    sequence+transform+substring so the whole expansion stays in
    expression codegen.

    The fixture parquet is a single row group, so without help every
    operator downstream of the scan (tokenize, hash, even the probe
    side of a broadcast self-join) runs in ONE task.  If the input has
    fewer partitions than the cluster has slots, spread the *document*
    rows (cheap — pre-explode) first; on a real multi-file 100 TB input
    partitions >> slots and this is a no-op, costing nothing.
    """
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < parallelism:
        docs = docs.repartition(parallelism)
    if shingle_n is None:
        tokens = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        return docs.select(
            "doc_id", F.explode(F.array_distinct(tokens)).alias("token")
        )
    # normalize ONCE per doc in its own projection: referencing
    # trim(lower(text)) inside the transform lambda would re-run the
    # O(L) rewrite at every shingle position (O(L²) per doc).
    # greatest(..., 1): sequence(1, 0) would run DESCENDING ([1, 0]);
    # docs shorter than n emit their whole text as the one shingle
    normed = docs.select(
        "doc_id", F.trim(F.lower(F.col("text"))).alias("t")
    )
    tokens = F.expr(
        f"transform(sequence(1, greatest(length(t) - {shingle_n} + 1, 1)),"
        f" i -> substring(t, i, {shingle_n}))"
    )
    return normed.select("doc_id", F.explode(F.array_distinct(tokens)).alias("token"))


def _token_arrays(tok: DataFrame) -> DataFrame:
    """doc_id → (token-hash array<long>, set_size) for candidate-verify
    joins.  Tokens are interned to xxhash64 longs: `array_intersect`
    over fixed-width longs is several× cheaper than over strings, and
    |hashed set| = |token set| barring a 2⁻⁶⁴-scale in-document
    collision, so the Jaccard values are unchanged."""
    return tok.groupBy("doc_id").agg(
        F.collect_set(F.xxhash64("token")).alias("tokens"),
        F.count("*").alias("set_size"),
    )


def _verify_pairs_exact(
    pairs: DataFrame, tok_arrays: DataFrame, threshold: float
) -> DataFrame:
    """Exact token-set Jaccard for CANDIDATE pairs only.

    Two hash joins on doc_id bring each side's token array onto the
    candidate row; the intersection is `array_intersect` (hash-set
    semijoin per row, O(|A|+|B|), JVM-side).  Work is linear in
    |candidates| — never the all-pairs join — which is the whole point
    of banding/prefix-filter candidate generation at 100 TB.
    """
    # shuffle_hash: the candidate side has no useful stats (it arrives
    # from a checkpoint), so the planner would default to sort-merge —
    # two O(|candidates| log) sorts for nothing.  A shuffled hash join
    # builds per-partition hash maps over the doc side (O(docs/parts)
    # rows each) and streams candidates through: the right plan at any
    # scale, and 4-5× faster here (35.7s → 7.7s at sf0.1).
    a = tok_arrays.select(
        F.col("doc_id").alias("doc_a"),
        F.col("tokens").alias("tokens_a"),
        F.col("set_size").alias("size_a"),
    ).hint("shuffle_hash")
    b = tok_arrays.select(
        F.col("doc_id").alias("doc_b"),
        F.col("tokens").alias("tokens_b"),
        F.col("set_size").alias("size_b"),
    ).hint("shuffle_hash")
    shared = F.size(F.array_intersect("tokens_a", "tokens_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            shared.alias("shared"),
            (shared / (F.col("size_a") + F.col("size_b") - shared)).alias("jaccard"),
        )
        # `shared >= 1` keeps parity with the inverted-index formulation,
        # which can only emit pairs sharing ≥1 token
        .filter((F.col("jaccard") >= threshold) & (F.col("shared") >= 1))
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# 1. Exact dedup (hash groupBy on canonical fingerprint)
# --------------------------------------------------------------------------


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group by normalized-text fingerprint; keep the smallest doc_id.
    Output one row per distinct content with its duplicate count."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "))
    return (
        docs.select("doc_id", F.md5(normalized).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("copies"),
        )
    )


_EXACT_SQL = """
SELECT
    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
    MIN(doc_id) AS keeper_doc_id,
    COUNT(*) AS copies
FROM documents
GROUP BY 1
"""

# --------------------------------------------------------------------------
# 2. Token-set Jaccard near-dup (inverted-index self-join)
# --------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.9


def ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    max_df: int | None = None,
    shingle_n: int | None = None,
) -> DataFrame:
    """All doc pairs with token-set Jaccard ≥ threshold.

    inverted index join: |A∩B| from the token-equality self-join,
    |A∪B| = |A|+|B|-|A∩B|. Jaccard is an int/int division — exact
    across engines.

    ``max_df`` is the posting-list bound (classic prefix filter): tokens
    whose document frequency exceeds it are dropped from CANDIDATE
    GENERATION only — a single stopword otherwise makes the token-
    equality self-join quadratic in its df.  Candidates are then
    exact-verified against the FULL token sets, so any pair sharing at
    least one sub-cap token gets its true Jaccard.  The only pairs the
    cap can lose are those whose entire overlap is hot tokens — at
    threshold 0.9 such a pair would need ~all its tokens hotter than
    max_df, which is the pair you least want anyway.  ``None`` = exact
    (the oracle-checked default; at 100 TB you always set it).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = _token_sets(docs, shingle_n=shingle_n)
    if max_df is not None:
        # Materialize the tokenize waist: this subtree (scan → repartition
        # → tokenize/shingle) otherwise re-executes in four branches —
        # doc_freq, both self-join sides, and the verify token arrays.
        # localCheckpoint (not persist) for the CacheManager reasons
        # documented on the minhash candidate list below.
        tok = tok.localCheckpoint()
        doc_freq = tok.groupBy("token").agg(F.count("*").alias("df"))
        join_tok = (
            tok.join(doc_freq.filter(F.col("df") <= max_df), "token")
            .select("doc_id", "token")
        )
        t1 = join_tok.alias("t1")
        t2 = join_tok.alias("t2")
        candidates = (
            t1.join(t2, F.col("t1.token") == F.col("t2.token"))
            .filter(F.col("t1.doc_id") < F.col("t2.doc_id"))
            .select(
                F.col("t1.doc_id").alias("doc_a"),
                F.col("t2.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        return _verify_pairs_exact(candidates, _token_arrays(tok), threshold)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    t1 = tok.alias("t1")
    t2 = tok.alias("t2")
    shared = (
        t1.join(t2, F.col("t1.token") == F.col("t2.token"))
        .filter(F.col("t1.doc_id") < F.col("t2.doc_id"))
        .groupBy(
            F.col("t1.doc_id").alias("doc_a"), F.col("t2.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    jac = F.col("shared") / (
        F.col("s1.set_size") + F.col("s2.set_size") - F.col("shared")
    )
    return (
        shared.join(s1, F.col("doc_a") == F.col("s1.doc_id"))
        .join(s2, F.col("doc_b") == F.col("s2.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


_JACCARD_SQL = rf"""
WITH tok AS (
    SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
    FROM documents
),
sizes AS (
    SELECT doc_id, COUNT(*) AS set_size FROM tok GROUP BY doc_id
),
shared AS (
    SELECT t1.doc_id AS doc_a, t2.doc_id AS doc_b, COUNT(*) AS shared
    FROM tok t1 JOIN tok t2 ON t1.token = t2.token AND t1.doc_id < t2.doc_id
    GROUP BY 1, 2
)
SELECT
    doc_a,
    doc_b,
    shared / (s1.set_size + s2.set_size - shared) AS jaccard
FROM shared
JOIN sizes s1 ON doc_a = s1.doc_id
JOIN sizes s2 ON doc_b = s2.doc_id
WHERE shared / (s1.set_size + s2.set_size - shared) >= {JACCARD_THRESHOLD}
"""

# --------------------------------------------------------------------------
# 3. MinHash + LSH banding (no SQL oracle — verified by invariant tests)
# --------------------------------------------------------------------------

N_HASHES = 16
N_BANDS = 4  # 4 rows per band
CANDIDATE_VERIFY_THRESHOLD = 0.5


def _minhash_signature(tok: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """doc_id → array<long> MinHash signature. Hash family: xxhash64 of
    the token salted per hash index — all JVM-side."""
    hashes = [
        F.min(F.xxhash64(F.concat(F.lit(f"mh{i}:"), F.col("token")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = tok.groupBy("doc_id").agg(*hashes)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = CANDIDATE_VERIFY_THRESHOLD,
    shingle_n: int | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, exact-verified.

    sig → N_BANDS band keys (xxhash64 of the band slice) → self-join
    per band key → distinct candidate pairs → verify with exact
    token-set Jaccard ≥ threshold, computed for the CANDIDATES ONLY
    (two doc_id hash joins onto per-doc token arrays + array_intersect)
    — the all-pairs join is never materialized, which is the point of
    banding at scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = _token_sets(docs, shingle_n=shingle_n)
    sig = _minhash_signature(tok)
    rows_per_band = N_HASHES // N_BANDS
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("signature")[i].cast("string")
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ],
                        )
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    b1 = bands.alias("b1")
    b2 = bands.alias("b2")
    candidates = (
        b1.join(
            b2,
            (F.col("b1.band") == F.col("b2.band"))
            & (F.col("b1.band_key") == F.col("b2.band_key")),
        )
        .filter(F.col("b1.doc_id") < F.col("b2.doc_id"))
        .select(
            F.col("b1.doc_id").alias("doc_a"), F.col("b2.doc_id").alias("doc_b")
        )
        .distinct()
        # materialize the deduped candidate set: it is the narrow waist
        # of the pipeline (pairs, two longs each), and without this the
        # band-join/distinct subtree re-executes under the verify joins
        # (measured 54s → 14s at sf0.1).  localCheckpoint, not persist:
        # a persist() entry is plan-matched by the CacheManager across
        # CALLS (a later identical invocation silently reads the old
        # cache — poison for benchmarks) and is never unpersisted;
        # checkpoint blocks are reclaimed when the DataFrame is GC'd.
        # At cluster scale this is the same "materialize the candidate
        # list" step every LSH pipeline has.
        .localCheckpoint()
    )
    return _verify_pairs_exact(candidates, _token_arrays(tok), threshold)


# --------------------------------------------------------------------------
# 4. SimHash (64-bit) — rows-only
# --------------------------------------------------------------------------


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: per-bit majority vote over token
    hashes, assembled with shifts — pure expression algebra (the
    per-doc bit loop is an unrolled sum, not a UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = _token_sets(docs).withColumn("h", F.xxhash64("token"))
    bit_votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(64)
    ]
    votes = tok.groupBy("doc_id").agg(*bit_votes)
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs with Hamming distance ≤ k via quarter-banding: any pair
    within k ≤ 3 bit flips agrees exactly on ≥1 of the 4 16-bit
    quarters (pigeonhole), so candidates come from 4 hash joins, not
    an all-pairs scan."""
    sig = simhash_signatures(spark, sf_dir)
    quarters = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * q)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias(f"q{q}")
                    for q in range(4)
                ]
            )
        ).alias("q", "qval"),
    )
    a = quarters.alias("a")
    b = quarters.alias("b")
    popcount = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q")) & (F.col("a.qval") == F.col("b.qval")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            popcount.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# 5. Embedding-cosine near-dup (oracle via DOUBLE[] cosine — bit-exact)
# --------------------------------------------------------------------------

COSINE_DUP_THRESHOLD = 0.4


def _cosine(a: Column, b: Column) -> Column:
    """Sequential-fold cosine in double — bit-identical to DuckDB's
    list_cosine_similarity over DOUBLE[] (verified empirically)."""
    va = F.transform(a, lambda x: x.cast("double"))
    vb = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(va, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(vb, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def embedding_near_dup(
    spark: SparkSession, sf_dir: str, threshold: float = COSINE_DUP_THRESHOLD
) -> DataFrame:
    """All vector pairs with cosine ≥ threshold (brute force — the
    LSH-bucketed scale path lives in operators.similarity)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


_EMB_NEAR_DUP_SQL = f"""
SELECT
    a.vec_id AS vec_a,
    b.vec_id AS vec_b,
    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      >= {COSINE_DUP_THRESHOLD}
"""


# --------------------------------------------------------------------------
# 6. Duplicate clustering — connected components over near-dup pairs
# --------------------------------------------------------------------------


def dedup_clusters(
    spark: SparkSession, sf_dir: str, max_iter: int = 20
) -> DataFrame:
    """Group near-duplicates into clusters: connected components over
    the Jaccard-pair graph via iterative min-label propagation
    (each vertex repeatedly adopts the smallest label among itself and
    its neighbors until fixpoint). cluster_id = min doc_id in the
    component; singletons cluster with themselves.

    The iterative pattern done Spark-right: every iteration is one
    shuffle join + aggregate plus a label-table self-join for POINTER
    DOUBLING (label ← label(label) — labels decrease monotonically, so
    the shortcut only jumps further down the component), and
    `localCheckpoint()` truncates the lineage so plans don't grow
    exponentially. With doubling, iterations = O(log diameter) instead
    of O(diameter) (measured: a diameter-8 pair graph converges in 4
    rounds, not 8); `max_iter` bounds adversarial chains. The same loop
    at 100 TB is the standard large-graph CC."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # materialize the pair list BEFORE mirroring: the two union branches
    # are separate subtrees to Spark (no cross-branch CSE), so an
    # un-checkpointed union would run the whole near-dup join twice
    pairs = (
        ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    )
    edges = (
        pairs.union(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .localCheckpoint()  # pairs' lineage replays every iteration otherwise
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("cluster_id").alias("neighbor_min"))
        )
        after_min = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("cluster_id"), F.coalesce("neighbor_min", "cluster_id")
            ).alias("cluster_id"),
            (
                F.coalesce("neighbor_min", "cluster_id") < F.col("cluster_id")
            ).alias("ch_min"),
        )
        # pointer doubling: label(x) ← label(label(x)).  Every label is
        # itself a doc_id with labels[c] <= c, so the left join always
        # hits and the shortcut is monotone non-increasing.  The lookup
        # table is the PREVIOUS (checkpointed) labels — reusing
        # `after_min` for both sides would re-run the edge join twice
        # per iteration (no cross-branch CSE).  Convergence requires
        # BOTH steps quiescent — that fixpoint equals the plain
        # neighbor-min fixpoint (component min everywhere).
        lut = labels.select(
            F.col("doc_id").alias("l_doc"), F.col("cluster_id").alias("l_cluster")
        )
        # carry a changed flag through the checkpoint so convergence is a
        # cheap filter-count on the already-materialized frame, not a
        # second join of new labels against old
        stepped = (
            after_min.join(lut, after_min.cluster_id == lut.l_doc, "left")
            .select(
                "doc_id",
                F.coalesce("l_cluster", "cluster_id").alias("cluster_id"),
                (
                    F.col("ch_min")
                    | (F.coalesce("l_cluster", "cluster_id") < F.col("cluster_id"))
                ).alias("changed"),
            )
            .localCheckpoint()
        )
        changed = stepped.filter("changed").count()
        new_labels = stepped.select("doc_id", "cluster_id")
        # drop the superseded checkpoint's cached blocks — only the
        # newest labels table should stay pinned
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels


# Oracle: transitive closure by recursive CTE (fine at test scale;
# the Spark side is the one built for big graphs).
_CLUSTERS_SQL = rf"""
WITH RECURSIVE pairs AS (
    SELECT doc_a, doc_b FROM ({_JACCARD_SQL})
),
edges AS (
    SELECT doc_a, doc_b FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
),
reach(src, node) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.src, e.doc_b FROM reach r JOIN edges e ON r.node = e.doc_a
)
SELECT src AS doc_id, MIN(node) AS cluster_id
FROM reach
GROUP BY src
"""


QUERIES = {
    "dedup_exact": exact_dedup,
    "dedup_clusters": dedup_clusters,
    "dedup_jaccard_pairs": ngram_jaccard_pairs,
    "dedup_minhash_lsh": minhash_lsh_pairs,
    "dedup_simhash_pairs": simhash_near_pairs,
    "dedup_embedding_cosine": embedding_near_dup,
}

#: dedup_minhash_lsh / dedup_simhash_pairs depend on xxhash64 (no DuckDB
#: equivalent) — rows-only checks; invariants covered in tests/test_dedup.py.
ORACLES = {
    "dedup_exact": _EXACT_SQL,
    "dedup_clusters": _CLUSTERS_SQL,
    "dedup_jaccard_pairs": _JACCARD_SQL,
    "dedup_embedding_cosine": _EMB_NEAR_DUP_SQL,
}
