"""Iterative graph analytics over the near-dup pair graph (north-star
extension): PageRank by distributed power iteration, complementing the
pointer-doubled connected components in `dedup.py` — together the two
standard iterative-algorithm shapes a DataFrame engine must express
without leaving the declarative plan.

Reference parity note: the reference pipeline has no graph operators;
this family exists for the LLM-data use case — ranking documents
inside near-duplicate clusters (keep the most "central" copy) and
auditing cluster structure at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.scale import checkpoint_df
from ..sources import load_table


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Distributed PageRank power iteration.

    `nodes`: one `id` column (every vertex, including isolated ones);
    `edges`: directed (`src`, `dst`) rows — pass both directions for an
    undirected graph.

    Spark shape per iteration: contributions = edges ⋈ ranks ⋈
    out-degree (all equi-joins on the vertex id, so the exchanges line
    up and AQE reuses the partitioning), one (dst) aggregate, one
    left join back onto the node set for the teleport term.  Dangling
    mass (rank sitting on out-degree-0 vertices) is a single-row
    scalar read per iteration — O(1) rows to the driver, the standard
    formulation.  Lineage is truncated with `localCheckpoint` every
    few iterations, exactly like the CC loop (`dedup.py`), so the plan
    does not grow unboundedly with iteration count.  Invariant: ranks
    always sum to 1 (checked in tests/test_graph.py)."""
    n = nodes.count()
    if n == 0:
        return nodes.select(F.col("id"), F.lit(0.0).alias("rank"))
    # Materialize the edge frame ONCE before the loop: `edges` may carry an
    # arbitrarily expensive lineage (doc_pagerank feeds it the whole
    # ngram_jaccard_pairs mining pipeline), and every iteration references
    # it twice (dangling-mass scalar + contribution join) plus once more in
    # the final plan — without truncation the miner re-executes ~2× per
    # iteration.  `deg` is derived from the checkpointed frame so it shares
    # the materialized scan instead of re-deriving the lineage.
    edges = checkpoint_df(edges)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        dangling = (
            ranks.join(deg, ranks.id == deg.src, "left_anti")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        contribs = (
            edges.join(ranks, edges.src == ranks.id)
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = nodes.join(contribs, "id", "left").select(
            "id",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % 3 == 0:
            ranks = checkpoint_df(ranks)
    return ranks


def doc_pagerank(
    spark: SparkSession,
    sf_dir: str,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the document near-dup graph: vertices are all
    documents, undirected edges are Jaccard-≥-threshold pairs
    (`dedup.ngram_jaccard_pairs`, both directions).  High-rank docs
    are the 'central' copies of their near-dup clusters — the
    principled keeper choice when collapsing duplicates; isolated docs
    all share the floor rank.  Rows-only entry (iterative — no SQL
    oracle); invariants pinned in tests/test_graph.py."""
    from .dedup import ngram_jaccard_pairs

    nodes = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    return (
        pagerank(nodes, edges, iterations, damping)
        .select(F.col("id").alias("doc_id"), "rank")
        .orderBy(F.desc("rank"), F.asc("doc_id"))
    )


QUERIES = {
    "graph_doc_pagerank": doc_pagerank,
}

ORACLES: dict[str, str] = {}
