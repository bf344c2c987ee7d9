"""General WHERE predicates for row-level DML (r15).

Covers the `predicates` analyzer (pure Python, no Spark), the
general-predicate delete/update twins on both protocol tiers, the
pruning evidence (provably-disjoint files never rewritten; scan-prune
narrows stats-blind predicates to files actually holding a match), and
the SQL dispatcher's lowering of the new shapes.

Reference scope: the reference's own WHERE surface leans on exactly
these shapes — the 5-way non-null conjunction
(pharmaceutical_dashboard_queries.sql:223-228) and IS NULL partitions
(Pharma_Ingestion_Cleaning.py:101-104); this extends them to the
write side.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    deltaproto as dp,
    iceberg as ib,
    predicates as P,
)


# --------------------------------------------------------------------------
# analyzer (pure python)
# --------------------------------------------------------------------------


def _ci(stats):
    return lambda c: stats.get(c)


STATS = {"a": (0, 100, False, False), "b": ("a", "m", True, False)}


@pytest.mark.parametrize(
    "pred,want",
    [
        ("a < 5", True),
        ("a < 0", False),
        ("a <= 0", True),
        ("a > 100", False),
        ("a >= 100", True),
        ("a = 150", False),
        ("a BETWEEN 200 AND 300", False),
        ("a IN (101, 5)", True),
        ("a IN (101, 102)", False),
        ("a IN (NULL)", False),
        ("b IS NULL", True),
        ("a IS NULL", False),
        ("a IS NOT NULL", True),
        ("a < 5 AND b = 'z'", False),
        ("a < 0 OR b = 'c'", True),
        ("a < 0 OR b = 'z'", False),
        ("NOT (a <= 100)", False),
        ("NOT (a <= 99)", True),
        ("length(t) > 3 AND a > 100", False),  # unknown leg; sibling prunes
        ("length(t) > 3", True),
        ("a = 'notanum'", True),  # incomparable literal: conservative
    ],
)
def test_analyzer_may_match(pred, want):
    ast = P.parse_predicate(pred)
    assert P.may_match(ast, _ci(STATS)) is want


def test_analyzer_soundness_on_junk():
    # untokenizable text → None (no stats pruning, never a crash)
    assert P.parse_predicate("a ~ 5") is None
    # constant column disproves != / NOT IN
    const = {"c": (7, 7, False, False)}
    assert P.may_match(P.parse_predicate("c != 7"), _ci(const)) is False
    assert (
        P.may_match(P.parse_predicate("NOT (c IN (7, 9))"), _ci(const))
        is False
    )
    # all-null column can satisfy no comparison but satisfies IS NULL
    an = {"x": (None, None, True, True)}
    assert P.may_match(P.parse_predicate("x = 1"), _ci(an)) is False
    assert P.may_match(P.parse_predicate("x IS NULL"), _ci(an)) is True
    assert P.may_match(P.parse_predicate("x IS NOT NULL"), _ci(an)) is False


# --------------------------------------------------------------------------
# shared fixture frame
# --------------------------------------------------------------------------


def _frame(spark, n=1000):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("m"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.concat(F.lit("s"), F.col("id")))
        .alias("s"),
        (F.col("id").cast("double") * 1.5).alias("price"),
    )


PRED = "k < 100 AND m = 3"


def _expected_after(df):
    return df.filter(~((F.col("k") < 100) & (F.col("m") == 3)))


def _same(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# --------------------------------------------------------------------------
# delta tier
# --------------------------------------------------------------------------


def test_delta_delete_predicate_conjunction_and_pruning(spark, tmp_path):
    """Strict `<` + two-column conjunction deletes exactly the matched
    rows AND the commit's remove set stays inside the stats
    candidates: range-partitioned files whose k-range is provably
    disjoint from k<100 keep their add actions untouched."""
    path = os.path.join(tmp_path, "t")
    df = _frame(spark)
    dp.write_delta(df.repartitionByRange(8, "k"), path)
    v = dp.delete_predicate_delta(spark, path, PRED)
    _same(dp.read_delta(spark, path), _expected_after(df))
    removes = [
        json.loads(ln)["remove"]["path"]
        for ln in open(
            os.path.join(path, "_delta_log", f"{v:020d}.json")
        )
        if "remove" in json.loads(ln)
    ]
    # 8 range files over k∈[0,1000): only the file(s) covering k<100
    # may be rewritten — stats pruning must spare the rest
    assert 1 <= len(removes) <= 2, removes


def test_delta_delete_predicate_is_null_and_or(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    df = _frame(spark)
    dp.write_delta(df.repartitionByRange(4, "k"), path)
    dp.delete_predicate_delta(spark, path, "s IS NULL OR k >= 990")
    _same(
        dp.read_delta(spark, path),
        df.filter(F.col("s").isNotNull() & (F.col("k") < 990)),
    )


def test_delta_scan_prune_narrows_stats_blind_predicate(spark, tmp_path):
    """A predicate stats cannot evaluate (LIKE → unknown leaf) still
    rewrites ONLY files that actually hold a match — the probe scan
    narrows the remove set."""
    path = os.path.join(tmp_path, "t")
    df = _frame(spark)
    dp.write_delta(df.repartitionByRange(8, "k"), path)
    # matches exactly k=5 (s='s5'): one file holds it
    v = dp.delete_predicate_delta(spark, path, "s LIKE 's5'")
    _same(dp.read_delta(spark, path), df.filter(F.col("k") != 5))
    removes = [
        json.loads(ln)["remove"]["path"]
        for ln in open(
            os.path.join(path, "_delta_log", f"{v:020d}.json")
        )
        if "remove" in json.loads(ln)
    ]
    assert len(removes) == 1, removes


def test_delta_update_predicate_rewrite_and_dv(spark, tmp_path):
    for dv in (False, True):
        path = os.path.join(tmp_path, f"t{int(dv)}")
        df = _frame(spark)
        dp.write_delta(df.repartitionByRange(4, "k"), path)
        if dv:
            dp.set_delta_properties(
                spark, path, {"delta.enableDeletionVectors": "true"}
            )
        dp.update_predicate_delta(
            spark, path, {"price": "price * 2"}, "k > 900 OR m IN (8, 9)"
        )
        exp = df.withColumn(
            "price",
            F.when(
                (F.col("k") > 900) | F.col("m").isin(8, 9),
                F.col("price") * 2,
            ).otherwise(F.col("price")),
        )
        _same(dp.read_delta(spark, path), exp)


def test_delta_predicate_null_semantics(spark, tmp_path):
    """Rows where the predicate is NULL (not FALSE) are KEPT by DELETE
    and left unmodified by UPDATE — SQL three-valued logic."""
    path = os.path.join(tmp_path, "t")
    df = _frame(spark, 100)
    dp.write_delta(df, path)
    # s IS NULL rows make `s = 'nope'` NULL — they must survive
    dp.delete_predicate_delta(spark, path, "s != 'never-matches'")
    got = dp.read_delta(spark, path)
    _same(got, df.filter(F.col("s").isNull()))


def test_delta_predicate_invalid_text_is_loud(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    dp.write_delta(_frame(spark, 50), path)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        dp.delete_predicate_delta(spark, path, "no_such_col = 1")


# --------------------------------------------------------------------------
# iceberg tier
# --------------------------------------------------------------------------


def test_iceberg_delete_predicate_cow_and_mor(spark, tmp_path):
    df = _frame(spark)
    for strat in ("cow", "merge-on-read"):
        path = os.path.join(tmp_path, strat)
        ib.write_iceberg(
            df.repartitionByRange(8, "k"), path, format_version=2
        )
        ib.delete_predicate_iceberg(spark, path, PRED, strategy=strat)
        _same(ib.read_iceberg(spark, path), _expected_after(df))


def test_iceberg_cow_scan_prune_spares_unmatched_files(spark, tmp_path):
    """COW with a stats-blind predicate: the probe scan keeps
    unmatched files as EXISTING (status 0) — only the single file
    holding k=5 is DELETED."""
    path = os.path.join(tmp_path, "t")
    df = _frame(spark)
    ib.write_iceberg(df.repartitionByRange(8, "k"), path)
    ib.delete_predicate_iceberg(spark, path, "s LIKE 's5'")
    _same(ib.read_iceberg(spark, path), df.filter(F.col("k") != 5))
    meta = ib.current_metadata(path)
    snap = ib._snapshot(meta, None)
    mfs = ib._read_manifest_list(path, snap)
    statuses = []
    for mf in mfs:
        recs, _m, _s = ib.avrotiny.read_container(
            ib._abs_path(path, mf["manifest_path"])
        )
        statuses += [r.get("status", 0) for r in recs]
    assert statuses.count(2) == 1  # exactly one DELETED file
    assert statuses.count(0) == 7  # the other seven carried EXISTING


def test_iceberg_update_predicate_and_partition_pruning(spark, tmp_path):
    """UPDATE with IS NULL over an identity-partitioned table: the
    partition tuple prunes (only m=2 files touched) and content is
    row-exact."""
    path = os.path.join(tmp_path, "t")
    df = _frame(spark)
    ib.write_iceberg(df.repartition(4), path, partition_by=["m"])
    ib.update_predicate_iceberg(
        spark, path, {"price": "-1.0"}, "s IS NULL AND m = 2"
    )
    exp = df.withColumn(
        "price",
        F.when(
            F.col("s").isNull() & (F.col("m") == 2), F.lit(-1.0)
        ).otherwise(F.col("price")),
    )
    _same(ib.read_iceberg(spark, path), exp)


def test_iceberg_date_literal_prunes_and_matches(spark, tmp_path):
    """Date-typed bounds compare against ISO string literals inside
    the analyzer (internal days → datetime.date) — correctness pinned
    by content; prunability by the analyzer unit check below."""
    path = os.path.join(tmp_path, "t")
    df = _frame(spark).withColumn(
        "dt",
        F.date_add(
            F.lit("2026-01-01").cast("date"), (F.col("k") % 30).cast("int")
        ),
    )
    ib.write_iceberg(df.repartitionByRange(4, "k"), path)
    ib.delete_predicate_iceberg(spark, path, "dt < '2026-01-05' AND m = 2")
    exp = df.filter(~((F.col("dt") < "2026-01-05") & (F.col("m") == 2)))
    _same(ib.read_iceberg(spark, path), exp)
    import datetime

    info = (
        datetime.date(2026, 1, 1),
        datetime.date(2026, 1, 30),
        False,
        False,
    )
    assert (
        P.may_match(
            P.parse_predicate("dt < '2026-01-01'"), lambda c: info
        )
        is False
    )
    assert (
        P.may_match(
            P.parse_predicate("dt < '2026-01-02'"), lambda c: info
        )
        is True
    )
