"""PageRank invariants: mass conservation, symmetry, centrality."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    graph,
)


def _ranks(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs], "src long, dst long"
    )
    return {r.id: r.rank for r in graph.pagerank(nodes, edges, **kw).collect()}


def test_pagerank_star_centrality_and_mass(spark):
    """Undirected star: the hub outranks every leaf, leaves tie, and
    total rank mass is 1."""
    leaves = [2, 3, 4, 5]
    edges = [(1, l) for l in leaves] + [(l, 1) for l in leaves]
    ranks = _ranks(spark, [1] + leaves, edges)
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-9)
    assert all(ranks[1] > ranks[l] for l in leaves)
    assert len({round(ranks[l], 12) for l in leaves}) == 1


def test_pagerank_symmetric_components_uniform(spark):
    """Two disjoint undirected triangles: perfect symmetry → uniform
    1/6 everywhere (power iteration preserves the uniform fixpoint)."""
    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(4, 5), (5, 6), (6, 4)]
    und = [(a, b) for a, b in tri1 + tri2] + [(b, a) for a, b in tri1 + tri2]
    ranks = _ranks(spark, [1, 2, 3, 4, 5, 6], und)
    for v in ranks.values():
        assert math.isclose(v, 1 / 6, rel_tol=1e-9)


def test_pagerank_dangling_mass_conserved(spark):
    """Isolated vertices (no out-edges) must not leak rank: total mass
    stays 1 and isolated vertices share one floor value."""
    edges = [(1, 2), (2, 1)]
    ranks = _ranks(spark, [1, 2, 3, 4], edges)
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-9)
    assert math.isclose(ranks[3], ranks[4], rel_tol=1e-12)
    assert ranks[1] > ranks[3]


def test_doc_pagerank_entry(spark, sf_correct):
    """Corpus entry: one row per document, mass 1, and near-dup cluster
    members outrank isolated documents."""
    out = graph.doc_pagerank(spark, sf_correct).collect()
    n_docs = len(out)
    assert n_docs == 500
    total = sum(r.rank for r in out)
    assert math.isclose(total, 1.0, rel_tol=1e-6)
    ranks = sorted((r.rank for r in out), reverse=True)
    assert ranks[0] > ranks[-1]
