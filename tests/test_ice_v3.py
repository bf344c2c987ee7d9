"""Iceberg FORMAT-VERSION 3: Puffin deletion vectors + row lineage
(sources/puffin.py + the v3 tier of sources/iceberg.py).

What v3 changes, per the public table spec: position-delete parquet
files are forbidden — merge-on-read deletes land as per-data-file
roaring bitmaps (``deletion-vector-v1`` blobs) inside Puffin files,
with at most ONE live DV per data file (a replacement must contain
its predecessor); manifests inherit `first_row_id` anchors so every
row carries a durable `_row_id`.  These tests pin the write path, the
merge/replace invariant, the v2→v3 upgrade conversion, lineage
assignment, the changelog's new-positions-only rule, and the loud
refusals (cow rewrites would re-number lineage)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    iceberg as ib,
    puffin,
)


def _df(spark, lo, hi, tag=0):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") * 10 + tag).cast("bigint").alias("v"),
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def _live_deletes(path):
    meta = ib.current_metadata(path)
    snap = ib._snapshot(meta, None)
    return ib._delete_files(path, ib._read_manifest_list(path, snap))


# --------------------------------------------------------------------------
# puffin codec
# --------------------------------------------------------------------------


def test_puffin_dv_blob_roundtrip(tmp_path):
    p = os.path.join(tmp_path, "dv.puffin")
    positions = [0, 1, 7, 100_000, 2**33 + 5]
    metas = puffin.write_puffin(
        p,
        [
            {
                "type": "deletion-vector-v1",
                "data": puffin.dv_payload(positions),
                "snapshot-id": 42,
                "sequence-number": 3,
                "properties": {
                    "referenced-data-file": "data/a.parquet",
                    "cardinality": "5",
                },
            }
        ],
    )
    assert metas[0]["offset"] == 4  # right after the header magic
    footer = puffin.read_puffin_footer(p)
    assert footer["blobs"] == metas
    got = puffin.read_dv(p, metas[0]["offset"], metas[0]["length"])
    assert got == positions


def test_puffin_dv_crc_and_magic_refusals():
    blob = bytearray(puffin.dv_payload([1, 2, 3]))
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        puffin.parse_dv_payload(bytes(blob))
    blob2 = bytearray(puffin.dv_payload([1]))
    blob2[4] = 0x00  # clobber the DV magic
    with pytest.raises(ValueError, match="magic"):
        puffin.parse_dv_payload(bytes(blob2))


def test_puffin_unknown_flag_bits_refuse(tmp_path):
    p = os.path.join(tmp_path, "f.puffin")
    puffin.write_puffin(
        p, [{"type": "deletion-vector-v1", "data": puffin.dv_payload([1])}]
    )
    raw = bytearray(open(p, "rb").read())
    raw[-8] |= 0x02  # an undefined flag bit in byte 0
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="flag"):
        puffin.read_puffin_footer(p)


# --------------------------------------------------------------------------
# v3 merge-on-read deletes = deletion vectors
# --------------------------------------------------------------------------


def test_v3_mor_delete_lands_dv_not_parquet(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 60).repartition(3), path,
                     format_version=3)
    ib.delete_where_iceberg(
        spark, path, "doc_id", 10, 19, strategy="merge-on-read"
    )
    pos, eq, dvs = _live_deletes(path)
    assert pos == [] and eq == []
    assert dvs and all(d["path"].endswith(".puffin") for d in dvs)
    assert sum(d["cardinality"] for d in dvs) == 10
    assert _ids(ib.read_iceberg(spark, path)) == [
        i for i in range(60) if not 10 <= i <= 19
    ]


def test_v3_replacement_dv_contains_predecessor(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 60).repartition(2), path,
                     format_version=3)
    ib.delete_where_iceberg(
        spark, path, "doc_id", 10, 19, strategy="merge-on-read"
    )
    ib.delete_where_iceberg(
        spark, path, "doc_id", 15, 29, strategy="merge-on-read"
    )
    _pos, _eq, dvs = _live_deletes(path)
    # the v3 invariant: at most one LIVE DV per referenced data file
    refs = [d["referenced"] for d in dvs]
    assert len(refs) == len(set(refs))
    # replacement vectors carry the union: 10..29 all deleted
    assert sum(d["cardinality"] for d in dvs) == 20
    for d in dvs:
        assert len(puffin.read_dv(d["path"], d["offset"], d["length"])) == (
            d["cardinality"]
        )
    assert _ids(ib.read_iceberg(spark, path)) == [
        i for i in range(60) if not 10 <= i <= 29
    ]


def test_v3_time_travel_predates_dv(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 30), path, format_version=3)
    snap0 = ib.current_metadata(path)["current-snapshot-id"]
    ib.delete_where_iceberg(
        spark, path, "doc_id", 0, 9, strategy="merge-on-read"
    )
    assert len(_ids(ib.read_iceberg(spark, path))) == 20
    assert len(_ids(ib.read_iceberg(spark, path, snapshot_id=snap0))) == 30


def test_v3_eq_deletes_still_work(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 20), path, format_version=3)
    ib.delete_eq_iceberg(path, ["doc_id"], [3, 7])
    ib.delete_where_iceberg(
        spark, path, "doc_id", 10, 12, strategy="merge-on-read"
    )
    assert _ids(ib.read_iceberg(spark, path)) == [
        i for i in range(20) if i not in (3, 7, 10, 11, 12)
    ]


def _lineage_map(spark, path):
    return {
        r["doc_id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in ib.read_iceberg(spark, path, with_row_lineage=True)
        .select("doc_id", "_row_id", "_last_updated_sequence_number")
        .collect()
    }


def test_v3_compaction_materializes_row_lineage(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 40).repartition(4), path,
                     format_version=3)
    ib.delete_where_iceberg(
        spark, path, "doc_id", 10, 14, strategy="merge-on-read"
    )
    before = _lineage_map(spark, path)
    ib.compact_iceberg(spark, path)
    # the rewrite folded the DVs away and re-laid the files, but every
    # surviving row keeps its _row_id AND its original update sequence
    # (materialized columns win over inheritance on read)
    assert _lineage_map(spark, path) == before
    _pos, _eq, dvs = _live_deletes(path)
    assert dvs == []
    # a fresh DV delete over the MATERIALIZED files still works, and
    # survivors still keep their ids
    ib.delete_where_iceberg(
        spark, path, "doc_id", 20, 24, strategy="merge-on-read"
    )
    after = _lineage_map(spark, path)
    assert set(after) == set(before) - set(range(20, 25))
    assert all(after[k] == before[k] for k in after)


def test_v3_cow_delete_materializes_row_lineage(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 30).repartition(2), path,
                     format_version=3)
    before = _lineage_map(spark, path)
    ib.delete_where_iceberg(spark, path, "doc_id", 5, 9, strategy="cow")
    after = _lineage_map(spark, path)
    assert set(after) == set(before) - set(range(5, 10))
    assert all(after[k] == before[k] for k in after)
    assert _ids(ib.read_iceberg(spark, path)) == [
        i for i in range(30) if not 5 <= i <= 9
    ]


# --------------------------------------------------------------------------
# v2 → v3 upgrade
# --------------------------------------------------------------------------


def test_upgrade_folds_position_deletes_into_dvs(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 50).repartition(2), path)
    ib.delete_where_iceberg(
        spark, path, "doc_id", 5, 14, strategy="merge-on-read"
    )
    ib.delete_eq_iceberg(path, ["doc_id"], [40])
    before = _ids(ib.read_iceberg(spark, path))
    pos0, eq0, dvs0 = _live_deletes(path)
    assert pos0 and not dvs0
    ib.upgrade_iceberg_format(spark, path, 3)
    meta = ib.current_metadata(path)
    assert int(meta["format-version"]) == 3
    pos1, eq1, dvs1 = _live_deletes(path)
    assert pos1 == []  # v3 bans position-delete parquet
    assert len(eq1) == len(eq0)  # equality deletes carry through
    assert sum(d["cardinality"] for d in dvs1) == 10
    assert _ids(ib.read_iceberg(spark, path)) == before


def test_upgrade_without_deletes_is_metadata_only(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 10), path)
    ib.upgrade_iceberg_format(spark, path, 3)
    meta = ib.current_metadata(path)
    assert int(meta["format-version"]) == 3
    assert meta["next-row-id"] == 10
    assert _ids(ib.read_iceberg(spark, path)) == list(range(10))
    with pytest.raises(ValueError, match="format-version"):
        ib.upgrade_iceberg_format(spark, path, 4)


# --------------------------------------------------------------------------
# row lineage
# --------------------------------------------------------------------------


def test_row_lineage_dense_and_monotone_per_append(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 40).repartition(3), path,
                     format_version=3)
    ib.write_iceberg(_df(spark, 40, 65), path)
    lin = ib.read_iceberg(spark, path, with_row_lineage=True)
    rows = lin.select("doc_id", "_row_id").collect()
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == list(range(65))  # dense, no gaps, no dupes
    # the second append's ids all land ABOVE the first's
    batch2 = {r["_row_id"] for r in rows if r["doc_id"] >= 40}
    assert batch2 == set(range(40, 65))
    assert ib.current_metadata(path)["next-row-id"] == 65


def test_row_lineage_survives_dv_delete(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 30).repartition(2), path,
                     format_version=3)
    before = {
        r["doc_id"]: r["_row_id"]
        for r in ib.read_iceberg(spark, path, with_row_lineage=True)
        .select("doc_id", "_row_id")
        .collect()
    }
    ib.delete_where_iceberg(
        spark, path, "doc_id", 10, 14, strategy="merge-on-read"
    )
    after = {
        r["doc_id"]: r["_row_id"]
        for r in ib.read_iceberg(spark, path, with_row_lineage=True)
        .select("doc_id", "_row_id")
        .collect()
    }
    assert set(after) == set(before) - set(range(10, 15))
    assert all(after[k] == before[k] for k in after)  # ids immutable
    lin = ib.read_iceberg(spark, path, with_row_lineage=True)
    seqs = {
        r["_last_updated_sequence_number"] for r in lin.collect()
    }
    assert seqs == {1}  # surviving rows keep their append's sequence


def test_row_lineage_refuses_below_v3(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 5), path)
    with pytest.raises(ValueError, match="format-version 3"):
        ib.read_iceberg(spark, path, with_row_lineage=True)


# --------------------------------------------------------------------------
# changelog + DataSource over DV tables
# --------------------------------------------------------------------------


def test_changelog_reports_only_new_dv_positions(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 30), path, format_version=3)
    ib.delete_where_iceberg(
        spark, path, "doc_id", 0, 9, strategy="merge-on-read"
    )
    ib.delete_where_iceberg(  # overlaps: only 10..14 are NEW deletes
        spark, path, "doc_id", 5, 14, strategy="merge-on-read"
    )
    ch = ib.read_changes_iceberg(spark, path)
    by_ord = {
        (r["_snapshot_ordinal"], r["_change_type"]): r["count"]
        for r in ch.groupBy("_snapshot_ordinal", "_change_type")
        .count()
        .collect()
    }
    assert by_ord == {
        (1, "insert"): 30,
        (2, "delete"): 10,
        (3, "delete"): 5,
    }
    third = ch.filter(F.col("_snapshot_ordinal") == 3)
    assert _ids(third) == list(range(10, 15))


def test_datasource_reads_v3_dv_table(spark, tmp_path):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        icestream,
    )

    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 25).repartition(2), path,
                     format_version=3)
    ib.delete_where_iceberg(
        spark, path, "doc_id", 3, 8, strategy="merge-on-read"
    )
    icestream.register(spark)
    got = spark.read.format("iceberg").load(path)
    assert _ids(got) == [i for i in range(25) if not 3 <= i <= 8]


def test_reads_foreign_crafted_v3_table(spark, tmp_path):
    """A v3 tree laid out the way ANOTHER engine would write it:
    RELATIVE paths everywhere (our writer emits file: URIs), a
    hand-assembled puffin DV, a manifest-list first_row_id anchor with
    one entry inheriting and one carrying an EXPLICIT first_row_id —
    must read with the DV applied and lineage resolved (explicit wins,
    inherited consumes record_count in entry order)."""
    import struct as _struct

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        avrotiny as av,
    )

    path = str(tmp_path / "foreign3")
    data_dir = os.path.join(path, "data")
    md = os.path.join(path, "metadata")
    os.makedirs(data_dir)
    os.makedirs(md)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": [0, 1, 2], "v": [10, 11, 12]}),
        os.path.join(data_dir, "f1.parquet"),
    )
    pq.write_table(
        pa.table({"doc_id": [3, 4], "v": [13, 14]}),
        os.path.join(data_dir, "f2.parquet"),
    )
    # DV hiding position 1 of f1 (doc_id=1), in a relative-path puffin
    dv = puffin.dv_payload([1])
    metas = puffin.write_puffin(
        os.path.join(data_dir, "dv.puffin"),
        [
            {
                "type": "deletion-vector-v1",
                "data": dv,
                "snapshot-id": 7,
                "sequence-number": 2,
                "properties": {
                    "referenced-data-file": "data/f1.parquet",
                    "cardinality": "1",
                },
            }
        ],
    )
    entry_schema = ib._manifest_entry_schema(
        {"type": "record", "name": "r102", "fields": []}, fv=3
    )

    def data_entry(fp, n, first_row_id):
        return {
            "status": 1,
            "snapshot_id": 7,
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": 0,
                "file_path": fp,  # RELATIVE
                "file_format": "PARQUET",
                "partition": {},
                "record_count": n,
                "file_size_in_bytes": 1,
                "value_counts": None,
                "null_value_counts": None,
                "lower_bounds": None,
                "upper_bounds": None,
                "split_offsets": None,
                "equality_ids": None,
                "first_row_id": first_row_id,
                "referenced_data_file": None,
                "content_offset": None,
                "content_size_in_bytes": None,
            },
        }

    av.write_container(
        os.path.join(md, "dm.avro"),
        entry_schema,
        [
            data_entry("data/f1.parquet", 3, None),  # inherits 100..102
            data_entry("data/f2.parquet", 2, 500),  # explicit
        ],
        codec="null",
    )
    dv_entry = data_entry("data/dv.puffin", 1, None)
    dv_entry["data_file"].update(
        {
            "content": 1,
            "file_format": "PUFFIN",
            "referenced_data_file": "data/f1.parquet",
            "content_offset": int(metas[0]["offset"]),
            "content_size_in_bytes": int(metas[0]["length"]),
        }
    )
    av.write_container(
        os.path.join(md, "del.avro"), entry_schema, [dv_entry], codec="null"
    )
    ml_schema = ib._manifest_file_schema(fv=3)
    av.write_container(
        os.path.join(md, "ml.avro"),
        ml_schema,
        [
            {
                "manifest_path": "metadata/dm.avro",  # RELATIVE
                "manifest_length": 1,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 2,
                "min_sequence_number": 2,
                "added_snapshot_id": 7,
                "added_data_files_count": 2,
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "partitions": None,
                "added_rows_count": 5,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "first_row_id": 100,
            },
            {
                "manifest_path": "metadata/del.avro",
                "manifest_length": 1,
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": 2,
                "min_sequence_number": 2,
                "added_snapshot_id": 7,
                "added_data_files_count": 1,
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "partitions": None,
                "added_rows_count": 1,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "first_row_id": None,
            },
        ],
        codec="deflate",
    )
    meta = {
        "format-version": 3,
        "table-uuid": "00000000-0000-0000-0000-00000000v300",
        "location": path,
        "last-sequence-number": 2,
        "last-updated-ms": 1,
        "last-column-id": 2,
        "next-row-id": 502,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "doc_id", "required": False,
                     "type": "long"},
                    {"id": 2, "name": "v", "required": False,
                     "type": "long"},
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "snapshots": [
            {
                "snapshot-id": 7,
                "timestamp-ms": 1,
                "sequence-number": 2,
                "first-row-id": 100,
                "summary": {"operation": "append"},
                "manifest-list": "metadata/ml.avro",  # RELATIVE
                "schema-id": 0,
            }
        ],
        "current-snapshot-id": 7,
        "snapshot-log": [],
        "metadata-log": [],
        "properties": {},
    }
    with open(os.path.join(md, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("1")
    got = ib.read_iceberg(spark, path)
    assert sorted((r["doc_id"], r["v"]) for r in got.collect()) == [
        (0, 10), (2, 12), (3, 13), (4, 14)  # doc_id=1 hidden by the DV
    ]
    lin = {
        r["doc_id"]: r["_row_id"]
        for r in ib.read_iceberg(spark, path, with_row_lineage=True)
        .select("doc_id", "_row_id")
        .collect()
    }
    # f1 inherits from the manifest anchor (100 + pos); f2 explicit 500
    assert lin == {0: 100, 2: 102, 3: 500, 4: 501}


def test_foreign_corrupt_dv_refuses(spark, tmp_path):
    """A v3 table whose DV blob fails its CRC must refuse loudly at
    read time, never silently resurrect (or over-delete) rows."""
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 10), path, format_version=3)
    ib.delete_where_iceberg(
        spark, path, "doc_id", 2, 4, strategy="merge-on-read"
    )
    _pos, _eq, dvs = _live_deletes(path)
    raw = bytearray(open(dvs[0]["path"], "rb").read())
    raw[dvs[0]["offset"] + dvs[0]["length"] - 1] ^= 0xFF  # clobber CRC
    open(dvs[0]["path"], "wb").write(bytes(raw))
    with pytest.raises(Exception, match="CRC"):
        ib.read_iceberg(spark, path).collect()


def test_cow_delete_keeps_untouched_file_lineage(spark, tmp_path):
    """Multi-manifest cow rewrite: UNTOUCHED files are carried as
    EXISTING entries and must keep their inherited `_row_id` anchors
    — the carried entry dicts propagate `_first_row_id` so the new
    manifest stamps them explicitly instead of letting the new
    manifest's inheritance anchor re-number them (r11 fix: ids of
    rows in the untouched append used to shift after any cow
    delete)."""
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 6).repartition(2), path,
                     format_version=3)
    ib.write_iceberg(_df(spark, 6, 12).repartition(2), path,
                     mode="append", format_version=3)
    before = _lineage_map(spark, path)
    ib.delete_where_iceberg(spark, path, "doc_id", 0, 2, strategy="cow")
    after = _lineage_map(spark, path)
    assert set(after) == set(range(3, 12))
    # survivors in touched files keep ids (materialized); rows in the
    # UNTOUCHED second append keep ids (explicit stamp on carry)
    assert all(after[k][0] == before[k][0] for k in after)
    ids = [v[0] for v in after.values()]
    assert len(ids) == len(set(ids))


def test_deleted_entries_consume_no_lineage_cursor(spark, tmp_path):
    """A mixed-status manifest lazily assigned at v2→v3 upgrade:
    DELETED entries budget no lineage rows (the allocator counts
    added+existing only), so live entries AFTER a deleted one must not
    be shifted into the next manifest's id range (r11 fix: duplicate
    durable row ids)."""
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_df(spark, 0, 10).repartition(2), path,
                     format_version=2)
    ib.write_iceberg(_df(spark, 10, 20).repartition(2), path,
                     mode="append", format_version=2)
    # cow delete writes ONE manifest with EXISTING + DELETED + ADDED
    # entries (all null first_row_id on a v2 table)
    ib.delete_where_iceberg(spark, path, "doc_id", 0, 3, strategy="cow")
    ib.upgrade_iceberg_format(spark, path, 3)
    after = _lineage_map(spark, path)
    assert set(after) == set(range(4, 20))
    ids = sorted(v[0] for v in after.values())
    assert len(ids) == len(set(ids)), "duplicate durable row ids"
    # dense assignment: exactly as many ids as live rows were budgeted
    assert ids == list(range(len(ids)))


def test_entry_has_field_with_truncated_stats(spark, tmp_path):
    """Per-column-truncated metrics (stats present for SOME columns
    but not the probed one) must fall back to the parquet footer —
    absence from the stats maps does not prove absence from the file
    (r11 fix: a present column was silently overwritten by the
    initial-default literal)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = os.path.join(tmp_path, "data.parquet")
    pq.write_table(pa.table({"a": [1, 2], "c": [7, 8]}), f)
    df_rec = {
        "file_path": f,
        # stats mention ONLY field id 1 ("a") — truncated metrics
        "value_counts": [{"key": 1, "value": 2}],
        "null_value_counts": None,
        "lower_bounds": None,
        "upper_bounds": None,
    }
    assert ib._entry_has_field(str(tmp_path), df_rec, 3, "c") is True
    assert ib._entry_has_field(str(tmp_path), df_rec, 4, "zzz") is False
    # the id the stats DO mention short-circuits without any IO
    assert ib._entry_has_field(str(tmp_path), df_rec, 1, "a") is True


# --------------------------------------------------------------------------
# v3 VARIANT type (r11)
# --------------------------------------------------------------------------


def _vdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        F.parse_json(
            F.format_string('{"a": %d, "nested": {"b": %d}}', "id", "id")
        ).alias("props"),
    )


def test_variant_v3_roundtrip_and_v2_refusal(spark, tmp_path):
    """VARIANT is a v3 type: schema json carries "variant", files land
    UNSHREDDED annotated parquet, values come back exact, and sibling
    columns keep their manifest bounds (the JVM footer fallback);
    writing variant into a v1/v2 table refuses."""
    path = os.path.join(tmp_path, "t")
    with pytest.raises(ValueError, match="format_version=3"):
        ib.write_iceberg(_vdf(spark, 0, 4), path, format_version=2)
    ib.write_iceberg(_vdf(spark, 0, 8).repartition(2), path,
                     format_version=3)
    ib.write_iceberg(_vdf(spark, 8, 16).repartition(2), path,
                     mode="append", format_version=3)
    meta = ib.current_metadata(path)
    assert [
        f["type"] for f in ib._schema_of(meta) if f["name"] == "props"
    ] == ["variant"]
    back = ib.read_iceberg(spark, path)
    assert back.schema["props"].dataType.typeName() == "variant"
    got = sorted(
        (r["doc_id"], r["a"], r["b"])
        for r in back.select(
            "doc_id",
            F.variant_get("props", "$.a", "long").alias("a"),
            F.variant_get("props", "$.nested.b", "long").alias("b"),
        ).collect()
    )
    assert got == [(i, i, i) for i in range(16)]
    # manifest bounds for doc_id survived (JVM footer fallback)
    prev = ib._snapshot(meta, None)
    entries = [
        e
        for mf in ib._data_manifests(ib._read_manifest_list(path, prev))
        for e in ib._read_manifest(path, mf)
    ]
    assert entries
    doc_fid = next(
        f["id"] for f in ib._schema_of(meta) if f["name"] == "doc_id"
    )
    for e in entries:
        lbs = ib._norm_id_map(e["data_file"].get("lower_bounds"))
        if int(e["data_file"].get("record_count") or 0) > 0:
            assert doc_fid in lbs
    # variant field itself carries no bounds (non-primitive)
    props_fid = next(
        f["id"] for f in ib._schema_of(meta) if f["name"] == "props"
    )
    for e in entries:
        lbs = ib._norm_id_map(e["data_file"].get("lower_bounds"))
        assert props_fid not in lbs


def test_variant_v3_dv_delete_and_lineage(spark, tmp_path):
    """DV deletes, durable row lineage, and compaction all compose
    with a variant column (the full v3 feature set on one table)."""
    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_vdf(spark, 0, 10).repartition(2), path,
                     format_version=3)
    ib.write_iceberg(_vdf(spark, 10, 20).repartition(2), path,
                     mode="append", format_version=3)
    before = {
        r["doc_id"]: r["_row_id"]
        for r in ib.read_iceberg(spark, path, with_row_lineage=True)
        .select("doc_id", "_row_id").collect()
    }
    ib.delete_where_iceberg(
        spark, path, "doc_id", 3, 5, strategy="merge-on-read"
    )
    _pos, _eq, dvs = _live_deletes(path)
    assert dvs and sum(d["cardinality"] for d in dvs) == 3
    got = sorted(
        r["a"]
        for r in ib.read_iceberg(spark, path)
        .select(F.variant_get("props", "$.a", "long").alias("a"))
        .collect()
    )
    assert got == [i for i in range(20) if not 3 <= i <= 5]
    ib.compact_iceberg(spark, path)
    after = {
        r["doc_id"]: r["_row_id"]
        for r in ib.read_iceberg(spark, path, with_row_lineage=True)
        .select("doc_id", "_row_id").collect()
    }
    assert set(after) == set(before) - {3, 4, 5}
    assert all(after[k] == before[k] for k in after)
    # the variant VALUES survived the lineage-materializing rewrite
    got2 = sorted(
        r["b"]
        for r in ib.read_iceberg(spark, path)
        .select(F.variant_get("props", "$.nested.b", "long").alias("b"))
        .collect()
    )
    assert got2 == got


def test_variant_stream_reader_refuses(spark, tmp_path):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        icestream,
    )

    path = os.path.join(tmp_path, "t")
    ib.write_iceberg(_vdf(spark, 0, 4), path, format_version=3)
    with pytest.raises(Exception, match="variant.*STREAM|STREAM.*variant"):
        icestream._schema(path)
