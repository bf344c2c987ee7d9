"""rewrite_position_deletes + the r13 inspection tables
(sources/iceberg.py).

`rewrite_iceberg_position_deletes` compacts the snapshot's accumulated
position-delete parquet files into one per partition and drops
DANGLING rows (positions whose data file was since rewritten away) —
O(delete rows + manifests), no data IO, eq-deletes and DVs carried at
their original sequence numbers.  The new `entries` /
`all_manifests` / `all_files` / `position_deletes` metadata tables
mirror Java Iceberg's inspection surface, all metadata-only folds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    iceberg as ib,
)


def _build_churned(spark, tmp_path):
    """1000 rows, 4 range files, then MOR/eq/COW churn that leaves
    three pos-delete files (two referencing a since-rewritten file —
    dangling) plus one eq-delete file."""
    p = str(tmp_path / "churn")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 10).alias("k")
    )
    ib.write_iceberg(
        df.repartitionByRange(4, "id"), p, format_version=2
    )
    ib.delete_where_iceberg(spark, p, "id", 100, 149, strategy="merge-on-read")
    ib.delete_where_iceberg(spark, p, "id", 200, 249, strategy="merge-on-read")
    ib.delete_eq_iceberg(p, ["id"], [5])
    # COW over the same file the MOR rows reference -> they dangle
    ib.delete_where_iceberg(spark, p, "id", 150, 199)
    ib.delete_where_iceberg(spark, p, "id", 400, 449, strategy="merge-on-read")
    return p


def _expected_ids():
    gone = (
        set(range(100, 150))
        | set(range(200, 250))
        | {5}
        | set(range(150, 200))
        | set(range(400, 450))
    )
    return sorted(set(range(1000)) - gone)


def test_rewrite_position_deletes(spark, tmp_path):
    p = _build_churned(spark, tmp_path)
    before = sorted(r["id"] for r in ib.read_iceberg(spark, p).collect())
    assert before == _expected_ids()
    dels = ib.read_iceberg_meta(spark, p, "delete_files").collect()
    n_pos = sum(1 for r in dels if r["content"] == 1)
    n_eq = sum(1 for r in dels if r["content"] == 2)
    assert n_pos >= 3 and n_eq == 1

    ib.rewrite_iceberg_position_deletes(spark, p)
    after = sorted(r["id"] for r in ib.read_iceberg(spark, p).collect())
    assert after == before  # row-exact through the rewrite
    dels = ib.read_iceberg_meta(spark, p, "delete_files").collect()
    assert sum(1 for r in dels if r["content"] == 1) == 1  # compacted
    assert sum(1 for r in dels if r["content"] == 2) == 1  # eq carried
    # dangling rows dropped: only the surviving MOR range remains
    pos = ib.read_iceberg_meta(spark, p, "position_deletes").collect()
    assert len(pos) == 50
    assert {r["source"] for r in pos} == {"position-delete-file"}
    # operation stamped "replace" (incremental consumers skip it)
    snaps = ib.iceberg_snapshots(p)
    assert snaps[-1]["operation"] == "replace"
    # a second rewrite still works (idempotent shape)
    ib.rewrite_iceberg_position_deletes(spark, p)
    assert sorted(
        r["id"] for r in ib.read_iceberg(spark, p).collect()
    ) == before


def test_rewrite_refuses_without_pos_files(spark, tmp_path):
    p = str(tmp_path / "clean")
    ib.write_iceberg(spark.range(10).select("id"), p, format_version=2)
    with pytest.raises(ValueError, match="no position-delete"):
        ib.rewrite_iceberg_position_deletes(spark, p)


def test_inspection_tables(spark, tmp_path):
    p = _build_churned(spark, tmp_path)
    # entries: raw manifest entries incl. DELETED ones, bounds as hex
    ent = ib.read_iceberg_meta(spark, p, "entries").collect()
    assert {r["status"] for r in ent} >= {0, 1, 2}
    import json as _json

    one = _json.loads(
        next(r for r in ent if r["status"] in (0, 1))["data_file"]
    )
    assert "file_path" in one and "lower_bounds" in one
    int(next(iter(one["lower_bounds"])))  # field-id keys
    bytes.fromhex(next(iter(one["lower_bounds"].values())))  # hex values

    # all_manifests spans history; manifests is current-snapshot only
    cur = ib.read_iceberg_meta(spark, p, "manifests").count()
    alm = ib.read_iceberg_meta(spark, p, "all_manifests").count()
    assert alm > cur

    # all_files includes files no longer live (the COW-dropped file),
    # deduped by path
    live = {
        r["file_path"]
        for r in ib.read_iceberg_meta(spark, p, "files").collect()
    }
    allf = [
        r["file_path"]
        for r in ib.read_iceberg_meta(spark, p, "all_files").collect()
    ]
    assert len(allf) == len(set(allf))  # deduped
    assert set(allf) > live  # strictly more than the live set

    # position_deletes: per-row view, both MOR snapshots' rows present
    # (150 live positions: 100-149 + 200-249 dangle only AFTER a
    # rewrite; here they still list because their file refs resolve
    # by tail at read time — the raw table shows what is STORED)
    pos = ib.read_iceberg_meta(spark, p, "position_deletes")
    assert pos.count() == 150


def test_append_schema_enforcement(spark, tmp_path):
    """r13 (the Delta tier's twin): unknown columns refuse with the
    evolve pointer, wrong types refuse before poisoning reads,
    lossless widenings up-cast, missing optional columns fill NULL
    (previously a cryptic crash deep in the landing)."""
    p = str(tmp_path / "enforce")
    ib.write_iceberg(
        spark.createDataFrame([(1, "a", 10)], "id long, s string, v long"),
        p,
    )
    with pytest.raises(ValueError, match="evolve_iceberg_schema"):
        ib.write_iceberg(
            spark.createDataFrame(
                [(2, "b", 20, 9.5)],
                "id long, s string, v long, extra double",
            ),
            p,
            mode="append",
        )
    with pytest.raises(ValueError, match="poison"):
        ib.write_iceberg(
            spark.createDataFrame(
                [("x", "b", 20)], "id string, s string, v long"
            ),
            p,
            mode="append",
        )
    # int -> long widens silently; missing optional column nulls
    ib.write_iceberg(
        spark.createDataFrame([(2, "b")], "id int, s string"),
        p,
        mode="append",
    )
    got = sorted(
        ib.read_iceberg(spark, p).collect(), key=lambda r: r["id"]
    )
    assert [(r["id"], r["v"]) for r in got] == [(1, 10), (2, None)]
    # overwrite keeps the table projection (unlike Delta's replace)
    with pytest.raises(ValueError, match="not in the Iceberg schema"):
        ib.write_iceberg(
            spark.createDataFrame([(9, True)], "k long, flag boolean"),
            p,
            mode="overwrite",
        )


def test_gzip_metadata_roundtrip_and_foreign(spark, tmp_path):
    """r13: `write.metadata.compression-codec=gzip` — commits after
    the property land as `v<N>.gz.metadata.json` (HadoopTables' form),
    reads decode both forms transparently, cleanup unlinks either, and
    a FOREIGN table whose every metadata version is gzip-only reads."""
    import gzip
    import json as _json
    import os as _os

    p = str(tmp_path / "gz")
    ib.write_iceberg(spark.range(5).select("id"), p)
    ib.set_iceberg_properties(
        p, {"write.metadata.compression-codec": "gzip"}
    )
    ib.write_iceberg(spark.range(5, 10).select("id"), p, mode="append")
    md = f"{p}/metadata"
    names = sorted(_os.listdir(md))
    assert any(n.endswith(".gz.metadata.json") for n in names)
    got = sorted(r["id"] for r in ib.read_iceberg(spark, p).collect())
    assert got == list(range(10))
    assert len(ib.iceberg_snapshots(p)) == 2
    # mixed-form cleanup keeps the newest only
    ib.cleanup_iceberg_metadata(p, keep_last=1)
    left = [n for n in _os.listdir(md) if "metadata.json" in n]
    assert len(left) == 1 and left[0].endswith(".gz.metadata.json")
    assert ib.read_iceberg(spark, p).count() == 10

    # foreign: gzip-only versions, no version hint
    p2 = str(tmp_path / "fgz")
    ib.write_iceberg(spark.range(3).select("id"), p2)
    md2 = f"{p2}/metadata"
    with open(f"{md2}/v1.metadata.json") as f:
        meta = _json.load(f)
    _os.unlink(f"{md2}/v1.metadata.json")
    _os.unlink(f"{md2}/version-hint.text")
    with gzip.open(f"{md2}/v1.gz.metadata.json", "wt") as f:
        _json.dump(meta, f)
    assert sorted(
        r["id"] for r in ib.read_iceberg(spark, p2).collect()
    ) == [0, 1, 2]
    # and the next commit continues the chain in gzip-less form
    # (codec property unset on this table)
    ib.write_iceberg(spark.range(3, 6).select("id"), p2, mode="append")
    assert ib.read_iceberg(spark, p2).count() == 6
    with pytest.raises(ValueError, match="unsupported"):
        ib.set_iceberg_properties(
            p2, {"write.metadata.compression-codec": "zstd"}
        )
        ib.write_iceberg(spark.range(1).select("id"), p2, mode="append")


def test_metadata_delete_after_commit(spark, tmp_path):
    """r13: write.metadata.delete-after-commit.enabled + 
    previous-versions-max — every commit trims old metadata versions
    automatically (the spec's maintenance pair; the manual
    cleanup_iceberg_metadata stays for tables without it)."""
    import os as _os

    p = str(tmp_path / "dac")
    ib.write_iceberg(spark.range(3).select("id"), p)
    ib.set_iceberg_properties(
        p,
        {
            "write.metadata.delete-after-commit.enabled": "true",
            "write.metadata.previous-versions-max": "1",
        },
    )
    for lo in range(3, 9, 3):
        ib.write_iceberg(
            spark.range(lo, lo + 3).select("id"), p, mode="append"
        )
    md = f"{p}/metadata"
    vs = [n for n in _os.listdir(md) if "metadata.json" in n]
    assert len(vs) == 2  # current + 1 previous, older trimmed per commit
    assert ib.read_iceberg(spark, p).count() == 9
    assert len(ib.iceberg_snapshots(p)) == 3  # snapshots untouched


def test_incremental_ndv_steps_over_metadata_replaces(spark, tmp_path):
    """r14: `update_iceberg_table_stats` tolerates row-preserving
    `replace` hops (manifest rewrite — the stream sink's
    auto-compaction shape): appended files are matched by their
    entry's snapshot_id, which survives the rewrite folding them to
    EXISTING.  A data-rewriting replace (compaction applies live
    deletes) still refuses with the rebuild named."""
    p = str(tmp_path / "ndvhops")
    df = spark.range(200).select(F.col("id"), (F.col("id") % 10).alias("k"))
    ib.write_iceberg(df.repartitionByRange(2, "id"), p)
    ib.write_iceberg_table_stats(spark, p)
    ib.write_iceberg(
        spark.range(200, 300).select(
            F.col("id"), (F.col("id") % 10).alias("k")
        ),
        p,
        mode="append",
    )
    ib.rewrite_iceberg_manifests(p)  # replace hop, no data files added
    ib.write_iceberg(
        spark.range(300, 400).select(
            F.col("id"), (F.col("id") % 10).alias("k")
        ),
        p,
        mode="append",
    )
    ib.update_iceberg_table_stats(spark, p)  # r13 refused this chain
    assert ib.read_iceberg_ndv(p)["id"] == 400  # exact below sketch k
    # a data-rewriting replace still refuses
    ib.compact_iceberg(spark, p)
    ib.write_iceberg(
        spark.range(400, 410).select(
            F.col("id"), (F.col("id") % 10).alias("k")
        ),
        p,
        mode="append",
    )
    with pytest.raises(ValueError, match="data-rewriting"):
        ib.update_iceberg_table_stats(spark, p)
    ib.write_iceberg_table_stats(spark, p)  # the named rebuild works
    assert ib.read_iceberg_ndv(p)["id"] == 410
