"""Incremental materialized views (sources/lakeview.py): delta
application parity vs full recompute across appends, both delete
strategies, and maintenance; zero-group drops; idempotence; the
merge fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    lakeview,
    minilake,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") * 3).cast("bigint").alias("val"),
    )


def _view_rows(spark, view):
    return sorted(
        (r["grp"], r["n_rows"], r["sum_value"])
        for r in minilake.read_snapshot(spark, view).collect()
    )


def _expected(spark, base):
    return sorted(
        (r["grp"], r["n_rows"], r["sum_value"])
        for r in minilake.read_snapshot(spark, base)
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("val").cast("bigint").alias("sum_value"),
        )
        .collect()
    )


def test_incremental_refresh_parity_and_idempotence(spark, tmp_path):
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    minilake.commit_append(
        _df(spark, 0, 80).repartitionByRange(4, "doc_id"),
        base,
        stat_cols=["doc_id"],
    )
    lakeview.refresh(spark, base, view, ["grp"], "val")  # bootstrap
    assert _view_rows(spark, view) == _expected(spark, base)

    # append + both delete strategies + compaction, one refresh
    minilake.commit_append(_df(spark, 80, 120), base)
    minilake.delete_where(spark, base, "doc_id", 10, 29)
    minilake.delete_where(spark, base, "doc_id", 50, 59, strategy="dv")
    minilake.compact(spark, base)
    assert lakeview.refresh(spark, base, view, ["grp"], "val") is not None
    assert _view_rows(spark, view) == _expected(spark, base)

    # already current: no-op; re-running stays exact (idempotent)
    assert lakeview.refresh(spark, base, view, ["grp"], "val") is None
    assert _view_rows(spark, view) == _expected(spark, base)


def test_group_drops_to_zero(spark, tmp_path):
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    minilake.commit_append(
        _df(spark, 0, 8).repartitionByRange(2, "doc_id"),
        base,
        stat_cols=["doc_id"],
    )
    lakeview.refresh(spark, base, view, ["grp"], "val")
    # delete every row of grp '3' (ids 3 and 7)
    minilake.delete_where(spark, base, "doc_id", 3, 3)
    minilake.delete_where(spark, base, "doc_id", 7, 7)
    lakeview.refresh(spark, base, view, ["grp"], "val")
    got = _view_rows(spark, view)
    assert all(g != "3" for g, _n, _s in got)  # group gone, not zero-row
    assert got == _expected(spark, base)


def test_merge_falls_back_to_full_refresh(spark, tmp_path):
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    minilake.commit_append(_df(spark, 0, 40), base, stat_cols=["doc_id"])
    lakeview.refresh(spark, base, view, ["grp"], "val")
    minilake.merge_upsert_lake(
        spark,
        _df(spark, 10, 15).withColumn("val", F.lit(999).cast("bigint")),
        base,
        "doc_id",
    )
    with pytest.raises(ValueError, match="merge"):
        lakeview.refresh(spark, base, view, ["grp"], "val")
    lakeview.full_refresh(spark, base, view, ["grp"], "val")
    assert _view_rows(spark, view) == _expected(spark, base)
    # and incremental refresh resumes from the new position
    minilake.commit_append(_df(spark, 100, 120), base)
    lakeview.refresh(spark, base, view, ["grp"], "val")
    assert _view_rows(spark, view) == _expected(spark, base)
