"""Sort- and zorder-aware compaction for the Iceberg tier
(`compact_iceberg(strategy=...)` — the three rewrite_data_files
shapes real engines run).

Before r13 compaction was binpack-only: a `repartition()` re-layout
that DESTROYS any sort clustering the table had, silently un-doing
`write_iceberg(sort_by=...)`'s disjoint per-file bounds at every
maintenance cycle.  `strategy="sort"` range-clusters on the requested
columns or the table's default sort order and stamps `sort_order_id`
on the rewritten files; `strategy="zorder"` interleaves two numeric
columns on the same Morton curve the Delta tier's OPTIMIZE ZORDER
uses (`functions/scale.py:zorder_key_2d`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    iceberg as ib,
)


def _messy_df(spark, n=4000):
    # interleaved values so every landed file spans the whole domain
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7919) % 1000).alias("k"),
        ((F.col("id") * 104729) % 1000).alias("v"),
    )


def _file_bounds(path, fid):
    meta = ib.current_metadata(path)
    snap = ib._snapshot(meta, None)
    out = []
    for mf in ib._data_manifests(ib._read_manifest_list(path, snap)):
        for e in ib._read_manifest(path, mf):
            if e.get("status", 0) not in (0, 1):
                continue
            rec = e["data_file"]
            lbs = ib._norm_id_map(rec.get("lower_bounds"))
            ubs = ib._norm_id_map(rec.get("upper_bounds"))
            out.append(
                (
                    ib.deser_value("long", lbs.get(fid)),
                    ib.deser_value("long", ubs.get(fid)),
                    rec.get("sort_order_id"),
                )
            )
    return out


def test_sort_compaction_restores_clustering(spark, tmp_path):
    p = str(tmp_path / "sorted")
    df = _messy_df(spark)
    for lo in range(0, 4000, 1000):  # four appends, all full-domain
        ib.write_iceberg(
            df.filter((F.col("id") >= lo) & (F.col("id") < lo + 1000)),
            p,
            mode="append" if lo else "overwrite",
            format_version=2,
        )
    before = sorted(r["id"] for r in ib.read_iceberg(spark, p).collect())
    # pre-compaction: every file spans ~the whole k domain
    b0 = _file_bounds(p, 2)
    assert all(hi - lo > 900 for lo, hi, _ in b0)

    ib.compact_iceberg(
        spark, p, target_mb=0.02, strategy="sort", sort_by=["k"]
    )
    after = sorted(r["id"] for r in ib.read_iceberg(spark, p).collect())
    assert after == before  # row-exact
    b1 = _file_bounds(p, 2)
    assert len(b1) > 1
    # disjoint (non-overlapping) per-file k-ranges, sort_order stamped
    spans = sorted((lo, hi) for lo, hi, _ in b1)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2
    assert all(oid is not None and oid > 0 for _l, _h, oid in b1)
    # the order registered and became the table default
    meta = ib.current_metadata(p)
    oid = b1[0][2]
    assert int(meta["default-sort-order-id"]) == oid
    order = next(
        so for so in meta["sort-orders"] if int(so["order-id"]) == oid
    )
    assert order["fields"][0]["source-id"] == 2
    # point lookups prune most files now
    _pr, fr, fs, _ms = ib.read_iceberg_pruned(spark, p, "k", 10, 20)
    assert fs > 0 and fr < len(b1)


def test_sort_compaction_uses_table_default_order(spark, tmp_path):
    p = str(tmp_path / "dflt")
    df = _messy_df(spark, 2000)
    ib.write_iceberg(
        df.repartition(4), p, mode="overwrite", sort_by=["k"],
        format_version=2,
    )
    # MOR churn destroys nothing yet, but the binpack default would
    ib.delete_where_iceberg(spark, p, "id", 0, 99, strategy="merge-on-read")
    ib.compact_iceberg(spark, p, target_mb=0.02, strategy="sort")
    got = sorted(r["id"] for r in ib.read_iceberg(spark, p).collect())
    assert got == list(range(100, 2000))  # delete applied, row-exact
    b = _file_bounds(p, 2)
    spans = sorted((lo, hi) for lo, hi, _ in b)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2
    # no delete manifests remain after the rewrite
    meta = ib.current_metadata(p)
    snap = ib._snapshot(meta, None)
    mfs = ib._read_manifest_list(p, snap)
    pos, eqs, dvs = ib._delete_files(p, mfs)
    assert not pos and not eqs and not dvs


def test_zorder_compaction_row_exact_and_boxed(spark, tmp_path):
    p = str(tmp_path / "z")
    df = _messy_df(spark)
    ib.write_iceberg(df.repartition(4), p, mode="overwrite", format_version=2)
    before = sorted(r["id"] for r in ib.read_iceberg(spark, p).collect())
    ib.compact_iceberg(
        spark, p, target_mb=0.02, strategy="zorder", zorder_by=["k", "v"]
    )
    after = sorted(r["id"] for r in ib.read_iceberg(spark, p).collect())
    assert after == before
    assert "_ib_z" not in ib.read_iceberg(spark, p).columns
    # z-layout: per-file bounding boxes shrink in BOTH dimensions vs
    # the full domain (binpack files span ~everything)
    bk = _file_bounds(p, 2)
    bv = _file_bounds(p, 3)
    assert len(bk) > 2
    assert sum(hi - lo for lo, hi, _ in bk) < len(bk) * 999
    assert sum(hi - lo for lo, hi, _ in bv) < len(bv) * 999


def test_strategy_refusals(spark, tmp_path):
    p = str(tmp_path / "r")
    ib.write_iceberg(_messy_df(spark, 100), p, mode="overwrite")
    with pytest.raises(ValueError, match="strategy"):
        ib.compact_iceberg(spark, p, strategy="cluster")
    with pytest.raises(ValueError, match="default sort order"):
        ib.compact_iceberg(spark, p, strategy="sort")
    with pytest.raises(ValueError, match="no sort column"):
        ib.compact_iceberg(spark, p, strategy="sort", sort_by=["nope"])
    with pytest.raises(ValueError, match="exactly 2"):
        ib.compact_iceberg(spark, p, strategy="zorder", zorder_by=["k"])
    with pytest.raises(ValueError, match="no zorder column"):
        ib.compact_iceberg(
            spark, p, strategy="zorder", zorder_by=["k", "nope"]
        )
