"""Delta Lake PROTOCOL interop (sources/deltaproto.py): tables written
here follow the public spec (newline-JSON `_delta_log` actions, hive
partition layout with partition columns absent from data files,
parquet checkpoints + `_last_checkpoint`), and the reader folds logs —
including FOREIGN-crafted ones with layouts other engines emit — or
refuses loudly when a table needs reader features we don't implement."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    deltaproto as dp,
)


def _df(spark, lo, hi, tag=0):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") * 10 + tag).cast("bigint").alias("v"),
    )


def _rows(df):
    return sorted((r["doc_id"], r["lang"], r["v"]) for r in df.collect())


def test_write_read_roundtrip_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 40), path)
    v1 = dp.write_delta(_df(spark, 40, 60), path)
    assert _rows(dp.read_delta(spark, path)) == _rows(_df(spark, 0, 60))
    assert _rows(dp.read_delta(spark, path, version=0)) == _rows(
        _df(spark, 0, 40)
    )
    dp.write_delta(_df(spark, 100, 110, tag=1), path, mode="overwrite")
    assert _rows(dp.read_delta(spark, path)) == _rows(
        _df(spark, 100, 110, tag=1)
    )
    # pre-overwrite snapshot still time-travels
    assert _rows(dp.read_delta(spark, path, version=v1)) == _rows(
        _df(spark, 0, 60)
    )
    hist = dp.delta_history(path)
    assert [h["operation"] for h in hist] == ["WRITE"] * 3
    assert hist[2]["n_removed"] > 0


def test_partitioned_layout_matches_spec(spark, tmp_path):
    """Partition columns live in hive DIRECTORY names and the log's
    partitionValues — NOT in the data files (the spec layout real
    engines expect) — and the reader reconstructs them typed."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 30), path, partition_by=["lang"])
    # hive dirs exist; data files carry only the non-partition columns
    langs = {d for d in os.listdir(path) if d.startswith("lang=")}
    assert langs == {"lang=0", "lang=1", "lang=2"}
    one = next(
        os.path.join(path, d, f)
        for d in sorted(langs)
        for f in os.listdir(os.path.join(path, d))
        if f.endswith(".parquet")
    )
    assert "lang" not in pq.ParquetFile(one).schema_arrow.names
    got = dp.read_delta(spark, path)
    assert dict(got.dtypes)["lang"] == "string"
    assert _rows(got) == _rows(_df(spark, 0, 30))
    # appends inherit the spec; contradictions are rejected
    dp.write_delta(_df(spark, 30, 40), path)
    assert _rows(dp.read_delta(spark, path)) == _rows(_df(spark, 0, 40))
    with pytest.raises(ValueError, match="contradicts"):
        dp.write_delta(_df(spark, 40, 50), path, partition_by=["v"])


def test_checkpoint_fold_and_tail(spark, tmp_path):
    """The reader starts from the parquet checkpoint `_last_checkpoint`
    names and folds only the JSON tail after it."""
    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 20), path, partition_by=["lang"])
    dp.write_delta(_df(spark, 20, 40), path)
    ck_v = dp.write_delta_checkpoint(spark, path)
    dp.write_delta(_df(spark, 40, 50), path)  # the tail
    assert os.path.exists(
        os.path.join(path, "_delta_log", dp._CKPT_FMT.format(ck_v))
    )
    assert _rows(dp.read_delta(spark, path)) == _rows(_df(spark, 0, 50))
    # checkpoint really is used: delete the pre-checkpoint JSON commits
    for v in range(ck_v + 1):
        os.unlink(
            os.path.join(path, "_delta_log", dp._LOG_FMT.format(v))
        )
    assert _rows(dp.read_delta(spark, path)) == _rows(_df(spark, 0, 50))


def test_foreign_crafted_log_reads(spark, tmp_path):
    """A `_delta_log` hand-written the way OTHER engines emit it —
    separate metaData ordering, checkpoint-less, extra commitInfo-only
    commit, absolute-style nested data paths — folds correctly."""
    path = str(tmp_path / "foreign")
    datadir = os.path.join(path, "sub")
    os.makedirs(datadir)
    spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("s")
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
    part = next(
        f
        for f in os.listdir(tmp_path / "stage")
        if f.endswith(".parquet")
    )
    os.rename(tmp_path / "stage" / part, os.path.join(datadir, "f1.parquet"))
    schema_str = (
        '{"type":"struct","fields":['
        '{"name":"doc_id","type":"long","nullable":true,"metadata":{}},'
        '{"name":"s","type":"string","nullable":true,"metadata":{}}]}'
    )
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    with open(os.path.join(log, dp._LOG_FMT.format(0)), "w") as f:
        f.write(
            json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "abc",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_str,
                        "partitionColumns": [],
                        "configuration": {},
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "sub/f1.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    # a commitInfo-only commit (OPTIMIZE no-op etc.) must fold cleanly
    with open(os.path.join(log, dp._LOG_FMT.format(1)), "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "OPTIMIZE"}}) + "\n")
    got = dp.read_delta(spark, path)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(10))


def test_unsupported_reader_features_raise(spark, tmp_path):
    """collations is an unimplemented reader feature and must refuse;
    deletionVectors (r8), columnMapping (r9), v2Checkpoint and
    typeWidening (r10), variantType and variantShredding (r11) no
    longer appear here — all implemented."""
    path = str(tmp_path / "cmdelta")
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    with open(os.path.join(log, dp._LOG_FMT.format(0)), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["collations-preview"],
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "x",
                        "format": {"provider": "parquet"},
                        "schemaString": '{"type":"struct","fields":[]}',
                        "partitionColumns": [],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="unsupported reader"):
        dp.read_delta(spark, path)


def test_column_mapping_name_mode_reads(spark, tmp_path):
    """A FOREIGN table with columnMapping (name mode, the delta-spark
    default when enabled): parquet files carry PHYSICAL uuid-ish
    column names, the schemaString maps them to logical names, and
    partitionValues keys are physical.  The reader reconstructs the
    logical schema exactly; `id` mode and WRITES to mapped tables
    refuse loudly."""
    path = str(tmp_path / "mapped")
    os.makedirs(os.path.join(path, "_delta_log"))
    # physical-named parquet data file
    spark.createDataFrame(
        [(1, 10), (2, 20)], "`col-phys1` bigint, `col-phys2` bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
    import glob
    import shutil as sh

    src = glob.glob(str(tmp_path / "stage" / "*.parquet"))[0]
    os.makedirs(os.path.join(path, "pdir=7"), exist_ok=True)
    sh.copy(src, os.path.join(path, "pdir=7", "part-0.parquet"))
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "doc_id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-phys1",
                    },
                },
                {
                    "name": "v",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-phys2",
                    },
                },
                {
                    "name": "grp",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 3,
                        "delta.columnMapping.physicalName": "pdir",
                    },
                },
            ],
        }
    )
    with open(os.path.join(path, "_delta_log", dp._LOG_FMT.format(0)), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["columnMapping"],
                        "writerFeatures": ["columnMapping"],
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "m",
                        "format": {"provider": "parquet"},
                        "schemaString": schema_string,
                        "partitionColumns": ["grp"],
                        "configuration": {
                            "delta.columnMapping.mode": "name",
                            "delta.columnMapping.maxColumnId": "3",
                        },
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "pdir=7/part-0.parquet",
                        "partitionValues": {"pdir": "7"},
                        "size": os.path.getsize(src),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    got = dp.read_delta(spark, path)
    assert sorted(got.columns) == ["doc_id", "grp", "v"]
    assert sorted(tuple(r) for r in got.collect()) == [(1, 10, 7), (2, 20, 7)]
    # pruned read resolves the predicate through the mapping
    pr, nread, nskip = dp.read_delta_pruned(spark, path, "grp", 0, 5)
    assert (nread, nskip) == (0, 1) and pr.count() == 0
    # writes to a mapped table now WORK: logical frames land under
    # PHYSICAL names (r9 batch 8); a wrong logical schema refuses
    more = spark.createDataFrame([(3, 30, 7)], "doc_id long, v long, grp long")
    dp.write_delta(more, path)
    got2 = dp.read_delta(spark, path)
    assert sorted(tuple(r) for r in got2.collect()) == [
        (1, 10, 7), (2, 20, 7), (3, 30, 7),
    ]
    with pytest.raises(ValueError, match="schema mismatch"):
        dp.write_delta(_df(spark, 0, 5), path)
    # row-level DELETE works on mapped tables now — BOTH strategies:
    # rewrite lands physical; merge-on-read scans physical and lands
    # the DV sidecar
    dp.delete_where_delta(spark, path, "doc_id", 1, 1)
    assert sorted(tuple(r) for r in dp.read_delta(spark, path).collect()) == [
        (2, 20, 7), (3, 30, 7),
    ]
    dp.delete_where_delta(spark, path, "doc_id", 2, 2, strategy="dv")
    assert sorted(tuple(r) for r in dp.read_delta(spark, path).collect()) == [
        (3, 30, 7),
    ]
    # id mode resolves too (r12): the map carries the field ids the
    # landing path must stamp
    meta = json.loads(
        open(os.path.join(path, "_delta_log", dp._LOG_FMT.format(0))).readlines()[1]
    )["metaData"]
    meta["configuration"]["delta.columnMapping.mode"] = "id"
    m = dp._column_mapping(meta)
    assert m == {"doc_id": "col-phys1", "v": "col-phys2", "grp": "pdir"}
    assert m.ids == {"doc_id": 1, "v": 2, "grp": 3}


def test_column_mapping_id_mode_reads(spark, tmp_path):
    """A FOREIGN id-mode table (`delta.columnMapping.mode=id`, the
    modern delta-spark layout): data-file columns resolve by PARQUET
    FIELD ID, so two files whose physical column NAMES disagree (the
    second written after a rename — id mode's reason to exist) both
    read back under the logical schema; partitionValues keys stay in
    the physicalName namespace.  Writes land id-stamped physical-named
    files and row-level ops rewrite through the same path (r12 — both
    previously refused)."""
    import glob
    import shutil as sh

    from pyspark.sql.types import LongType, StructField, StructType

    path = str(tmp_path / "idmapped")
    os.makedirs(os.path.join(path, "_delta_log"))

    def land(stage_name, names, rows, dest):
        df = spark.createDataFrame(
            rows,
            StructType(
                [
                    StructField(names[0], LongType(), True, {"parquet.field.id": 1}),
                    StructField(names[1], LongType(), True, {"parquet.field.id": 2}),
                ]
            ),
        )
        stage = str(tmp_path / stage_name)
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        src = glob.glob(os.path.join(stage, "*.parquet"))[0]
        os.makedirs(os.path.join(path, os.path.dirname(dest)), exist_ok=True)
        sh.copy(src, os.path.join(path, dest))
        return os.path.getsize(src)

    # file 1: physical names as first written; file 2: SAME field ids,
    # different parquet names (post-rename writer) — id resolution must
    # not care
    sz1 = land("s1", ["col-abc", "col-def"], [(1, 10), (2, 20)], "p=7/f1.parquet")
    sz2 = land("s2", ["renamed_a", "renamed_b"], [(3, 30)], "p=9/f2.parquet")

    def fld(name, fid, phys):
        return {
            "name": name,
            "type": "long",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": phys,
            },
        }

    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                fld("doc_id", 1, "col-abc"),
                fld("v", 2, "col-def"),
                fld("grp", 3, "p"),
            ],
        }
    )
    with open(os.path.join(path, "_delta_log", dp._LOG_FMT.format(0)), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["columnMapping"],
                        "writerFeatures": ["columnMapping"],
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "m",
                        "format": {"provider": "parquet"},
                        "schemaString": schema_string,
                        "partitionColumns": ["p"],
                        "configuration": {
                            "delta.columnMapping.mode": "id",
                            "delta.columnMapping.maxColumnId": "3",
                        },
                    }
                }
            )
            + "\n"
        )
        for dest, sz, pv in [
            ("p=7/f1.parquet", sz1, "7"),
            ("p=9/f2.parquet", sz2, "9"),
        ]:
            f.write(
                json.dumps(
                    {
                        "add": {
                            "path": dest,
                            "partitionValues": {"p": pv},
                            "size": sz,
                            "modificationTime": 0,
                            "dataChange": True,
                        }
                    }
                )
                + "\n"
            )
    got = dp.read_delta(spark, path)
    assert sorted(got.columns) == ["doc_id", "grp", "v"]
    assert sorted(tuple(r) for r in got.collect()) == [
        (1, 10, 7),
        (2, 20, 7),
        (3, 30, 9),
    ]
    # metadata tables fold fine (no data IO)
    assert dp.read_delta_meta(spark, path, "files").count() == 2
    # pruned read resolves partition pruning through the physicalName
    # namespace on an id-mode table (metadata only — no field ids
    # needed until the surviving files are scanned)
    pr, nread, nskip = dp.read_delta_pruned(spark, path, "grp", 8, 10)
    assert (nread, nskip) == (1, 1)
    assert sorted(tuple(r) for r in pr.collect()) == [(3, 30, 9)]
    # the format("deltaproto") DataSource resolves by field id too
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        deltastream as ds,
    )

    ds.register(spark)
    got_ds = sorted(
        tuple(r)
        for r in spark.read.format("deltaproto").load(path).collect()
    )
    assert got_ds == [(1, 10, 7), (2, 20, 7), (3, 30, 9)]
    # writes WORK (r12): the landed file carries physical names AND
    # parquet field ids, so id-resolution keeps working
    import pyarrow.parquet as pq

    more = spark.createDataFrame([(4, 40, 7)], "doc_id long, v long, grp long")
    dp.write_delta(more, path)
    got3 = sorted(
        tuple(r) for r in dp.read_delta(spark, path).collect()
    )
    assert got3 == [(1, 10, 7), (2, 20, 7), (3, 30, 9), (4, 40, 7)]
    new_files = [
        f
        for f in glob.glob(os.path.join(path, "p=7", "*.parquet"))
        if "part-" in os.path.basename(f)
    ]
    assert new_files
    for f in new_files:
        sch = pq.ParquetFile(f).schema_arrow
        assert [fl.name for fl in sch] == ["col-abc", "col-def"]
        assert [
            fl.metadata[b"PARQUET:field_id"] for fl in sch
        ] == [b"1", b"2"]
    # the DataSource reads the mixed foreign+engine tree identically
    got_ds2 = sorted(
        tuple(r)
        for r in spark.read.format("deltaproto").load(path).collect()
    )
    assert got_ds2 == got3
    # row-level ops: rewrite delete (cow) and DV delete both work
    dp.delete_where_delta(spark, path, "doc_id", 1, 1)
    dp.delete_where_delta(spark, path, "doc_id", 3, 3, strategy="dv")
    got4 = sorted(
        tuple(r) for r in dp.read_delta(spark, path).collect()
    )
    assert got4 == [(2, 20, 7), (4, 40, 7)]
    assert sorted(
        tuple(r)
        for r in spark.read.format("deltaproto").load(path).collect()
    ) == got4


def test_unknown_future_reader_feature_raises(spark, tmp_path):
    """The spec's v3 rule is an ALLOWLIST: any listed readerFeature
    this module does not implement — including ones invented AFTER it
    — must refuse, not silently mis-read."""
    path = str(tmp_path / "futuredelta")
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    with open(os.path.join(log, dp._LOG_FMT.format(0)), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": [
                            "deletionVectors",
                            "someFeatureFromTheFuture",
                        ],
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "x",
                        "format": {"provider": "parquet"},
                        "schemaString": '{"type":"struct","fields":[]}',
                        "partitionColumns": [],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="someFeatureFromTheFuture"):
        dp.read_delta(spark, path)


def test_delta_to_minilake_migration(spark, tmp_path):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    src = str(tmp_path / "delta")
    dst = str(tmp_path / "mlk")
    dp.write_delta(_df(spark, 0, 30), src, partition_by=["lang"])
    dp.write_delta(_df(spark, 30, 45), src)
    dp.delta_to_minilake(spark, src, dst)
    assert minilake.partition_spec(dst) == ["lang"]
    got = sorted(
        (r["doc_id"], r["lang"], r["v"])
        for r in minilake.read_snapshot(spark, dst).collect()
    )
    assert got == _rows(_df(spark, 0, 45))


def test_stats_recorded_pruned_read_and_delete(spark, tmp_path):
    """Add actions carry the spec's stats JSON (numRecords/minValues/
    maxValues/nullCount); read_delta_pruned skips files from the log
    alone; delete_where_delta rewrites only possibly-affected files as
    a remove+add commit; stats survive checkpointing."""
    import json as json_mod
    import os

    path = str(tmp_path / "delta")
    dp.write_delta(
        _df(spark, 0, 100).repartitionByRange(5, "doc_id"), path
    )
    _meta, live, _v = dp._fold_delta_state(spark, path, None)
    stats = [json_mod.loads(a["stats"]) for a in live.values()]
    assert all("minValues" in s and s["numRecords"] == 20 for s in stats)
    assert sum(s["numRecords"] for s in stats) == 100

    got, n_read, n_skipped = dp.read_delta_pruned(spark, path, "doc_id", 0, 19)
    assert n_read == 1 and n_skipped == 4
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(20))

    # delete a narrow range: only its file is rewritten
    before = set(live)
    dp.delete_where_delta(spark, path, "doc_id", 40, 49)
    _meta, after, _v = dp._fold_delta_state(spark, path, None)
    assert len(before & set(after)) == 4  # four files untouched by name
    assert _rows(dp.read_delta(spark, path)) == _rows(
        _df(spark, 0, 100).filter(~F.col("doc_id").between(40, 49))
    )
    assert dp.delta_history(path)[-1]["operation"] == "DELETE"
    # no-op delete: provably-empty range commits nothing
    n = len(dp.delta_versions(path))
    dp.delete_where_delta(spark, path, "doc_id", 5000, 6000)
    assert len(dp.delta_versions(path)) == n

    # stats survive a checkpoint: prune again after folding from it
    ck_v = dp.write_delta_checkpoint(spark, path)
    for v in range(ck_v + 1):
        os.unlink(os.path.join(path, "_delta_log", dp._LOG_FMT.format(v)))
    got2, n_read2, n_skipped2 = dp.read_delta_pruned(
        spark, path, "doc_id", 0, 19
    )
    assert n_skipped2 >= 3
    assert sorted(r["doc_id"] for r in got2.collect()) == list(range(20))


def test_partition_tier_pruning_on_delta(spark, tmp_path):
    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 60), path, partition_by=["lang"])
    got, n_read, n_skipped = dp.read_delta_pruned(spark, path, "lang", "1", "1")
    assert n_skipped >= 2  # lang=0 and lang=2 partitions skipped
    assert sorted(set(r["lang"] for r in got.collect())) == ["1"]
    # partition-pruned delete touches only that partition's files
    _m, live0, _ = dp._fold_delta_state(spark, path, None)
    other = {f for f, a in live0.items() if a["partitionValues"]["lang"] != "1"}
    dp.delete_where_delta(spark, path, "lang", "1", "1")
    _m, live1, _ = dp._fold_delta_state(spark, path, None)
    assert other <= set(live1)
    assert dp.read_delta(spark, path).filter(F.col("lang") == "1").count() == 0


def test_compact_delta_datachange_false(spark, tmp_path):
    """OPTIMIZE commits remove+add with dataChange:false; content and
    time travel are preserved; the resulting adds carry fresh stats so
    pruning keeps working post-compaction."""
    import json as json_mod

    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 50).repartitionByRange(5, "doc_id"), path)
    dp.write_delta(_df(spark, 50, 70), path)
    v_pre = dp.delta_versions(path)[-1]
    dp.compact_delta(spark, path)
    assert _rows(dp.read_delta(spark, path)) == _rows(_df(spark, 0, 70))
    assert _rows(dp.read_delta(spark, path, version=v_pre)) == _rows(
        _df(spark, 0, 70)
    )
    hist = dp.delta_history(path)
    assert hist[-1]["operation"] == "OPTIMIZE"
    acts = dp._read_actions(path, hist[-1]["version"])
    changes = [
        a["add"]["dataChange"] for a in acts if "add" in a
    ] + [a["remove"]["dataChange"] for a in acts if "remove" in a]
    assert changes and not any(changes)
    _got, n_read, n_skipped = dp.read_delta_pruned(spark, path, "doc_id", 0, 5)
    assert n_read >= 1  # stats present on the compacted files


def test_change_data_feed_spec_rules(spark, tmp_path):
    """CDF per the spec: cdc actions win when present (DELETE writes
    `_change_data` pre-images), insert-only commits derive inserts,
    OVERWRITE derives full-snapshot delete+insert, dataChange:false
    commits (OPTIMIZE) contribute nothing."""
    path = str(tmp_path / "delta")
    dp.write_delta(
        _df(spark, 0, 40).repartitionByRange(4, "doc_id"),
        path,
        partition_by=["lang"],
    )
    dp.write_delta(_df(spark, 40, 50), path)
    dp.delete_where_delta(spark, path, "doc_id", 10, 19)
    dp.compact_delta(spark, path)
    dp.write_delta(_df(spark, 100, 105), path, mode="overwrite")
    ch = dp.read_changes_delta(spark, path)
    agg = sorted(
        tuple(r)
        for r in ch.groupBy("_commit_version", "_change_type")
        .count()
        .collect()
    )
    assert agg == [
        (0, "insert", 40),
        (1, "insert", 10),
        (2, "delete", 10),
        (4, "delete", 40),
        (4, "insert", 5),
    ]
    dels = dp.read_changes_delta(spark, path, 2, 2)
    assert sorted(r["doc_id"] for r in dels.collect()) == list(range(10, 20))
    # the cdc landing is real: _change_data files + cdc actions on disk
    assert any(
        f.startswith("cdc-")
        for f in os.listdir(os.path.join(path, "_change_data"))
    )
    acts = dp._read_actions(path, 2)
    assert any("cdc" in a for a in acts)


def test_derived_delete_partition_and_dv_fidelity(spark, tmp_path):
    """Delete derivation from remove actions must reconstruct the
    pre-image faithfully: partition columns come back typed and
    non-null (from the removed file's add action, not a stub), and
    rows a PRIOR commit's deletion vector already hid are NOT
    re-emitted as deletes when the file is later removed."""
    path = str(tmp_path / "delta")
    dp.write_delta(
        _df(spark, 0, 30).repartitionByRange(3, "doc_id"),
        path,
        partition_by=["lang"],
    )
    # v1: DV delete hides doc_id 0-9 (cdc actions carry these changes)
    dp.delete_where_delta(spark, path, "doc_id", 0, 9, strategy="dv")
    # v2: overwrite — removes every file; the delete leg is DERIVED
    dp.write_delta(_df(spark, 100, 102), path, mode="overwrite")
    dels = dp.read_changes_delta(spark, path, 2, 2).filter(
        "_change_type = 'delete'"
    )
    got = sorted((r["doc_id"], r["lang"]) for r in dels.collect())
    # DV-hidden rows (0-9) must not reappear; partition col is non-null
    assert got == [(i, str(i % 3)) for i in range(10, 30)]


def test_wide_dv_delete_builds_bitmaps_on_executors(spark, tmp_path):
    """A wide DV delete (≥10⁵ matched positions) works end-to-end —
    the roaring blobs are serialized per-file on executors and only
    KB-scale blobs reach the driver (VERDICT r8 task 3)."""
    n, lo, hi = 150_000, 10_000, 130_000 - 1
    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, n).repartition(4), path)
    dp.delete_where_delta(spark, path, "doc_id", lo, hi, strategy="dv")
    got = dp.read_delta(spark, path)
    assert got.count() == n - (hi - lo + 1)
    assert got.filter(F.col("doc_id").between(lo, hi)).count() == 0
    # descriptors on the re-added files account for every position
    acts = dp._read_actions(path, dp.delta_versions(path)[-1])
    cards = [
        a["add"]["deletionVector"]["cardinality"] for a in acts if "add" in a
    ]
    assert sum(cards) == hi - lo + 1
    # and the sidecar DV file itself stays KB-scale (roaring, not rows)
    dv_files = [f for f in os.listdir(path) if f.startswith("deletion_vector_")]
    assert dv_files and all(
        os.path.getsize(os.path.join(path, f)) < 1 << 20 for f in dv_files
    )


def test_change_feed_refuses_underivable_foreign_rewrite(spark, tmp_path):
    """A foreign mixed add+remove commit WITHOUT cdc actions (e.g. an
    engine that rewrote files with CDF disabled) must raise — a
    file-level diff would double-count the rewritten rows."""
    import pytest as _pytest

    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 20), path)
    meta, live, _v = dp._fold_delta_state(spark, path, None)
    fname = sorted(live)[0]
    # craft a rewrite commit: remove one file, re-add it, no cdc
    lines = [
        json.dumps({"commitInfo": {"operation": "MERGE", "timestamp": 1}}),
        json.dumps(
            {
                "remove": {
                    "path": fname,
                    "deletionTimestamp": 1,
                    "dataChange": True,
                }
            }
        ),
        json.dumps(
            {
                "add": {
                    "path": fname,
                    "partitionValues": {},
                    "size": live[fname]["size"],
                    "modificationTime": 1,
                    "dataChange": True,
                }
            }
        ),
    ]
    dp._claim_delta_version(path, lines)
    with _pytest.raises(ValueError, match="not derivable"):
        dp.read_changes_delta(spark, path).count()
    # but a window that excludes the bad commit still reads
    assert dp.read_changes_delta(spark, path, 0, 0).count() == 20


def test_roaring_z85_codecs():
    """Spec vectors: the ZeroMQ Z85 'HelloWorld' example; roaring
    roundtrips across array/bitmap containers and 2^32 buckets; a
    hand-crafted run-container bitmap (cookie 12347) decodes."""
    import struct

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        roaring as rb,
    )

    hello = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert rb.z85_encode(hello) == "HelloWorld"
    assert rb.z85_decode("HelloWorld") == hello
    for vals in ([], [0], [1, 5, 7], list(range(70000)), [2**32 + 5, 3]):
        assert rb.deserialize_rbm64(rb.serialize_rbm64(vals)) == sorted(
            set(vals)
        )
    run = bytearray()
    run += struct.pack("<HH", 12347, 0)  # run cookie, 1 container
    run += bytes([0b1])  # container 0 is a run container
    run += struct.pack("<HH", 0, 10)  # key 0, cardinality-1
    run += struct.pack("<H", 1)  # 1 run
    run += struct.pack("<HH", 10, 10)  # start 10, length-1 = 10
    full = struct.pack("<q", 1) + struct.pack("<I", 0) + bytes(run)
    assert rb.deserialize_rbm64(full) == list(range(10, 21))


def test_rbm64_portable_golden_bytes():
    """Byte-exact golden fixture hand-assembled from the
    RoaringFormatSpec 64-bit extension (RoaringTreemap / delta-spark
    RoaringBitmapArray portable): int64 LE count of NON-EMPTY buckets,
    then per bucket a uint32 LE high-32 key + the 32-bit portable
    bitmap.  Buckets 0 and 5 — the key gap is unrepresentable in the
    pre-r9 dense encoding, so this pins real-engine interop."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        roaring as rb,
    )

    golden = bytes.fromhex(
        "0200000000000000"  # 2 non-empty buckets
        "00000000"  # bucket key 0
        "3a300000"  # no-run cookie 12346
        "01000000"  # 1 container
        "00000200"  # container key 0, cardinality-1 = 2
        "10000000"  # offset header: container data at byte 16
        "010002006400"  # array values 1, 2, 100
        "05000000"  # bucket key 5
        "3a300000"
        "01000000"
        "00000000"  # container key 0, cardinality-1 = 0
        "10000000"
        "0700"  # array value 7
    )
    positions = [1, 2, 100, (5 << 32) + 7]
    assert rb.serialize_rbm64(positions) == golden
    assert rb.deserialize_rbm64(golden) == sorted(positions)


def test_deletion_vector_delete_and_read(spark, tmp_path):
    """strategy='dv': no data file rewritten — the commit re-adds the
    same paths with DeletionVectorDescriptors (real roaring+Z85 `.bin`
    sidecar), upgrades the protocol to readerVersion 3, unions on
    repeat deletes, survives checkpoints, and compaction materializes
    the DVs away."""
    path = str(tmp_path / "delta")
    dp.write_delta(
        _df(spark, 0, 60).repartitionByRange(6, "doc_id"),
        path,
        partition_by=["lang"],
    )
    v_dv = dp.delete_where_delta(spark, path, "doc_id", 10, 19, strategy="dv")
    acts = dp._read_actions(path, v_dv)
    addpaths = sorted(a["add"]["path"] for a in acts if "add" in a)
    rmpaths = sorted(a["remove"]["path"] for a in acts if "remove" in a)
    assert addpaths == rmpaths  # merge-on-read: same files re-added
    assert all(a["add"]["deletionVector"] for a in acts if "add" in a)
    assert any(
        a["protocol"]["minReaderVersion"] == 3
        and "deletionVectors" in a["protocol"]["readerFeatures"]
        for a in acts
        if "protocol" in a
    )
    assert any(f.startswith("deletion_vector_") for f in os.listdir(path))
    got = dp.read_delta(spark, path)
    assert got.count() == 50
    assert got.filter("doc_id between 10 and 19").count() == 0
    # overlapping second DV delete: unions, CDF reports only NEW rows
    dp.delete_where_delta(spark, path, "doc_id", 15, 24, strategy="dv")
    got2 = dp.read_delta(spark, path)
    assert _rows(got2) == _rows(
        _df(spark, 0, 60).filter(~F.col("doc_id").between(10, 24))
    )
    ch = dp.read_changes_delta(spark, path, 2, 2)
    assert sorted(r["doc_id"] for r in ch.collect()) == list(range(20, 25))
    # checkpoint carries descriptors + the feature-flagged protocol
    dp.write_delta_checkpoint(spark, path)
    assert dp.read_delta(spark, path).count() == 45
    assert dp.read_delta(spark, path, version=0).count() == 60
    dp.compact_delta(spark, path)
    meta, live, _v = dp._fold_delta_state(spark, path, None)
    assert not any(a.get("deletionVector") for a in live.values())
    assert dp.read_delta(spark, path).count() == 45


def test_inline_dv_and_foreign_descriptor(spark, tmp_path):
    """storageType 'i' (inline Z85 payload) decodes; a descriptor
    whose uuid encoding contains '/' (a Z85 alphabet char) must not be
    mis-split; corrupted checksums raise."""
    import binascii
    import struct
    import uuid as uuid_mod

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        roaring as rb,
    )

    path = str(tmp_path / "delta")
    os.makedirs(path)
    data = int(dp._DV_MAGIC).to_bytes(4, "little", signed=True) + (
        rb.serialize_rbm64([1, 3, 5])
    )
    if len(data) % 4 == 0:
        desc = {"storageType": "i", "pathOrInlineDv": rb.z85_encode(data)}
        assert dp._dv_positions(path, desc) == [1, 3, 5]
    # craft a 'u' file whose z85 uuid contains '/'
    dv_uuid = None
    for _ in range(20000):
        cand = uuid_mod.uuid4()
        if "/" in rb.z85_encode(cand.bytes):
            dv_uuid = cand
            break
    assert dv_uuid is not None
    buf = bytearray(b"\x01")
    offset = len(buf)
    buf += len(data).to_bytes(4, "big", signed=True)
    buf += data
    buf += (binascii.crc32(data) & 0xFFFFFFFF).to_bytes(4, "big")
    with open(os.path.join(path, f"deletion_vector_{dv_uuid}.bin"), "wb") as f:
        f.write(bytes(buf))
    desc = {
        "storageType": "u",
        "pathOrInlineDv": rb.z85_encode(dv_uuid.bytes),
        "offset": offset,
        "sizeInBytes": len(data),
    }
    assert dp._dv_positions(path, desc) == [1, 3, 5]
    # flip a data byte: checksum must catch it
    corrupt = bytearray(buf)
    corrupt[6] ^= 0xFF
    with open(os.path.join(path, f"deletion_vector_{dv_uuid}.bin"), "wb") as f:
        f.write(bytes(corrupt))
    with pytest.raises(ValueError, match="checksum"):
        dp._dv_positions(path, desc)


def test_merge_upsert_stats_pruned_with_cdf(spark, tmp_path):
    """merge_upsert_delta: stats-pruned rewrite (untouched files keep
    their add actions byte-identical), matched keys update, new keys
    insert, DV-hidden rows never resurrect, and the commit's cdc
    actions carry the spec's MERGE feed (update_preimage /
    update_postimage / insert)."""
    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 60).repartitionByRange(6, "doc_id"), path)
    dp.delete_where_delta(spark, path, "doc_id", 50, 51, strategy="dv")
    _meta, live_before, _v = dp._fold_delta_state(spark, path, None)
    # update keys 45-54 + brand-new keys 100-104: the files holding
    # only 0-44 are provably outside [45, 104] and must survive
    updates = _df(spark, 45, 55, tag=7).unionByName(
        _df(spark, 100, 105, tag=7)
    )
    dp.merge_upsert_delta(spark, updates, path, "doc_id")
    got = dp.read_delta(spark, path)
    rows = {r["doc_id"]: r["v"] for r in got.collect()}
    # matched keys updated (tag 7); 50-51 were DV-hidden -> re-INSERTED
    # as new rows (MERGE semantics: not matched -> insert)
    assert all(rows[i] == i * 10 + 7 for i in range(45, 55))
    assert all(rows[i] == i * 10 + 7 for i in range(100, 105))
    assert all(rows[i] == i * 10 for i in list(range(45)) + list(range(55, 60)))
    assert len(rows) == 65
    # untouched files carried byte-identical through the merge commit
    _meta2, live_after, _v2 = dp._fold_delta_state(spark, path, None)
    untouched_kept = set(live_before) & set(live_after)
    assert untouched_kept  # pruning really spared files
    # the MERGE cdc feed: preimage/postimage for the 8 visible matched
    # keys, insert for the 5 new + 2 previously-hidden keys
    ch = dp.read_changes_delta(
        spark, path, dp.delta_versions(path)[-1]
    )
    by_type = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert by_type == {
        "update_preimage": 8,
        "update_postimage": 8,
        "insert": 7,
    }


def test_check_constraints_and_writer_gating(spark, tmp_path):
    """add_delta_constraint validates existing rows, raises writer
    version, and later appends/merges enforce CHECK semantics (only
    FALSE violates — NULL passes); appendOnly tables refuse deletes;
    unknown v7 writer features refuse writes."""
    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 20), path)
    dp.add_delta_constraint(spark, path, "v_nonneg", "v >= 0")
    acts = dp._read_actions(path, dp.delta_versions(path)[-1])
    conf = next(a["metaData"] for a in acts if "metaData" in a)[
        "configuration"
    ]
    assert conf["delta.constraints.v_nonneg"] == "v >= 0"
    assert dp._current_protocol(path)["minWriterVersion"] >= 3
    # violating append refuses; clean append lands; NULL passes
    bad = spark.createDataFrame(
        [(999, "0", -5)], "doc_id bigint, lang string, v bigint"
    )
    with pytest.raises(ValueError, match="v_nonneg"):
        dp.write_delta(bad, path)
    nullv = spark.createDataFrame(
        [(998, "0", None)], "doc_id bigint, lang string, v bigint"
    )
    dp.write_delta(nullv, path)
    assert dp.read_delta(spark, path).count() == 21
    with pytest.raises(ValueError, match="v_nonneg"):
        dp.merge_upsert_delta(spark, bad, path, "doc_id")
    # a constraint existing rows violate cannot be added
    with pytest.raises(ValueError, match="existing"):
        dp.add_delta_constraint(spark, path, "small", "doc_id < 10")
    # appendOnly: deletes refuse, appends still land
    import json as _json

    meta, _live, _v = dp._fold_delta_state(spark, path, None)
    new_meta = _json.loads(_json.dumps(meta))
    new_meta["configuration"]["delta.appendOnly"] = "true"
    dp._claim_delta_version(path, [_json.dumps({"metaData": new_meta})])
    with pytest.raises(ValueError, match="appendOnly"):
        dp.delete_where_delta(spark, path, "doc_id", 0, 5)
    dp.write_delta(_df(spark, 50, 52), path)
    # unknown v7 writer feature: writes refuse
    dp._claim_delta_version(
        path,
        [
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": ["somethingNew"],
                    }
                }
            )
        ],
    )
    with pytest.raises(ValueError, match="writer capabilities"):
        dp.write_delta(_df(spark, 60, 61), path)


def test_restore_to_version(spark, tmp_path):
    """restore_delta: the new commit's snapshot equals the target
    version's — including undoing a DV delete (the target's
    descriptorless add re-lands) — and history stays navigable."""
    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 30), path)
    v_target = dp.delta_versions(path)[-1]
    dp.write_delta(_df(spark, 30, 40), path)
    dp.delete_where_delta(spark, path, "doc_id", 5, 9, strategy="dv")
    assert dp.read_delta(spark, path).count() == 35
    dp.restore_delta(spark, path, v_target)
    assert _rows(dp.read_delta(spark, path)) == _rows(_df(spark, 0, 30))
    # the restore is itself a commit: pre-restore state time-travels
    pre = dp.delta_versions(path)[-2]
    assert dp.read_delta(spark, path, version=pre).count() == 35
    # appends continue normally after the restore
    dp.write_delta(_df(spark, 100, 103), path)
    assert dp.read_delta(spark, path).count() == 33


def test_update_where_with_cdf(spark, tmp_path):
    """update_where_delta: pruned rewrite, NULL predicate rows kept
    (three-valued), post-image constraint enforcement, and the cdc
    feed carries exact update_preimage/update_postimage rows."""
    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 60).repartitionByRange(6, "doc_id"), path)
    _meta, live_before, _v = dp._fold_delta_state(spark, path, None)
    dp.update_where_delta(spark, path, {"v": "v + 1"}, "doc_id", 45, 54)
    rows = {r["doc_id"]: r["v"] for r in dp.read_delta(spark, path).collect()}
    assert all(rows[i] == i * 10 + 1 for i in range(45, 55))
    assert all(rows[i] == i * 10 for i in list(range(45)) + list(range(55, 60)))
    # pruning spared the low files
    _m2, live_after, _v2 = dp._fold_delta_state(spark, path, None)
    assert set(live_before) & set(live_after)
    # the cdc feed: 10 preimage + 10 postimage rows, values exact
    ch = dp.read_changes_delta(spark, path, dp.delta_versions(path)[-1])
    pre = sorted(
        r["v"]
        for r in ch.filter("_change_type = 'update_preimage'").collect()
    )
    post = sorted(
        r["v"]
        for r in ch.filter("_change_type = 'update_postimage'").collect()
    )
    assert pre == [i * 10 for i in range(45, 55)]
    assert post == [i * 10 + 1 for i in range(45, 55)]
    # constraint violated by the POST-image refuses
    dp.add_delta_constraint(spark, path, "v_cap", "v < 100000")
    with pytest.raises(ValueError, match="v_cap"):
        dp.update_where_delta(spark, path, {"v": "v + 200000"}, "doc_id", 0, 1)
    # partition columns cannot be set
    with pytest.raises(ValueError, match="partition column"):
        path2 = str(tmp_path / "p")
        dp.write_delta(_df(spark, 0, 9), path2, partition_by=["lang"])
        dp.update_where_delta(spark, path2, {"lang": "'9'"}, "doc_id", 0, 5)


def test_optimize_zorder_delta_improves_box_pruning(spark, tmp_path):
    """ZORDER BY (doc_id, v): the rewrite lands dataChange:false (CDF
    silent) and stats-pruned reads on the SECOND dimension skip files
    — the clustering dividend a linear sort cannot give both axes."""
    import random

    rnd = random.Random(7)
    rows = [(i, str(i % 3), rnd.randrange(0, 1000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, v bigint")
    path = str(tmp_path / "delta")
    # land sorted by doc_id only: v is scattered through every file
    dp.write_delta(df.repartitionByRange(8, "doc_id"), path)
    _g, read_before, skip_before = dp.read_delta_pruned(spark, path, "v", 0, 49)
    dp.optimize_zorder_delta(spark, path, "doc_id", "v", n_files=16)
    # CDF: the optimize contributed nothing
    ch = dp.read_changes_delta(spark, path, dp.delta_versions(path)[-1])
    assert ch.count() == 0
    got, read_after, skip_after = dp.read_delta_pruned(spark, path, "v", 0, 49)
    assert skip_after > skip_before  # v-axis pruning now works
    expect = sorted((r[0], r[2]) for r in rows if 0 <= r[2] <= 49)
    assert sorted((r["doc_id"], r["v"]) for r in got.collect()) == expect


def test_generated_columns_partition_filter(spark, tmp_path):
    """GENERATED columns: the expression is computed at write time,
    recorded as `delta.generationExpression` field metadata under
    minWriterVersion 4, ENFORCED on later writes (supplied values must
    match; appends recompute), and a range predicate on the SOURCE
    column prunes via the generated partition value (Delta's
    generated-column partition filter) for every monotone shape."""
    import datetime

    t = str(tmp_path / "gen")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.lit(760_000_000) + F.col("id") * 86_400)
        .cast("timestamp_ntz")
        .alias("ts"),
    )
    dp.write_delta(
        df,
        t,
        partition_by=["p_month"],
        generated={"p_month": "date_format(ts, 'yyyy-MM')"},
    )
    meta, _live, _v = dp._fold_delta_state(spark, t, None)
    assert dp._generation_exprs(meta) == {
        "p_month": "date_format(ts, 'yyyy-MM')"
    }
    assert dp._current_protocol(t)["minWriterVersion"] == 4
    back = dp.read_delta(spark, t)
    assert back.count() == 400 and "p_month" in back.columns

    lo = datetime.datetime(1994, 4, 1)
    hi = datetime.datetime(1994, 4, 30, 23, 59, 59)
    pr, fr, fs = dp.read_delta_pruned(spark, t, "ts", lo, hi)
    assert pr.count() == df.filter(F.col("ts").between(lo, hi)).count()
    assert fs > fr  # generated partition values skipped most files

    # append recomputes; supplied-but-wrong values refuse; a
    # contradicting generated spec refuses
    df2 = spark.range(400, 450).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.lit(760_000_000) + F.col("id") * 86_400)
        .cast("timestamp_ntz")
        .alias("ts"),
    )
    dp.write_delta(df2, t)
    assert dp.read_delta(spark, t).count() == 450
    with pytest.raises(ValueError, match="violates its generation"):
        dp.write_delta(df2.withColumn("p_month", F.lit("2099-01")), t)
    with pytest.raises(ValueError, match="contradicts the table's"):
        dp.write_delta(df2, t, generated={"p_month": "year(ts)"})

    # bound-mapping twins across the monotone shapes
    d = datetime.datetime(1995, 3, 7, 22, 31)
    assert dp._gen_partition_value("year(ts)", d) == ("1995", True)
    assert dp._gen_partition_value("date_format(ts, 'yyyy-MM')", d) == (
        "1995-03",
        False,
    )
    assert dp._gen_partition_value("CAST(ts AS DATE)", d) == (
        "1995-03-07",
        False,
    )
    assert dp._gen_partition_value("to_date(ts)", d) == ("1995-03-07", False)
    # month() alone is not monotone: the shape is refused for mapping
    assert dp._gen_partition_value("month(ts)", d) == (None, False)
    assert dp._gen_source_col("date_format(ts, 'yyyy-MM')") == "ts"
    assert dp._gen_source_col("month(ts)") is None


def test_delta_metadata_tables(spark, tmp_path):
    """read_delta_meta: detail/files/partitions/history agree with the
    table's actual state across write → append → delete."""
    t = str(tmp_path / "mt")
    dp.write_delta(_df(spark, 0, 60), t, partition_by=["lang"])
    dp.write_delta(_df(spark, 60, 90), t)
    dp.delete_where_delta(spark, t, "doc_id", 0, 29)

    detail = dp.read_delta_meta(spark, t, "detail").first()
    assert detail["format"] == "delta"
    assert json.loads(detail["partitionColumns"]) == ["lang"]
    files = dp.read_delta_meta(spark, t, "files")
    assert files.count() == detail["numFiles"]
    assert files.filter(~F.col("has_stats")).count() == 0
    parts = dp.read_delta_meta(spark, t, "partitions").collect()
    assert {json.loads(r["partitionValues"])["lang"] for r in parts} == {
        "0", "1", "2",
    }
    assert sum(r["file_count"] for r in parts) == detail["numFiles"]
    hist = dp.read_delta_meta(spark, t, "history").collect()
    assert [r["operation"] for r in hist] == ["WRITE", "WRITE", "DELETE"]
    assert hist[2]["n_removed"] > 0
    with pytest.raises(ValueError, match="unknown metadata table"):
        dp.read_delta_meta(spark, t, "nope")


def test_shallow_clone_zero_copy_writable_fork(spark, tmp_path):
    """Shallow CLONE: reads equal the source snapshot with zero bytes
    copied (absolute-URI adds), the clone is independently writable
    and deletable without touching the source, and source evolution
    after the clone is invisible to it."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    dp.write_delta(_df(spark, 0, 60), src, partition_by=["lang"])
    v = dp.clone_delta(spark, src, dst)
    assert v == 0
    assert _rows(dp.read_delta(spark, dst)) == _rows(_df(spark, 0, 60))
    # zero copy: no parquet landed under dst
    import glob as _glob

    assert not _glob.glob(os.path.join(dst, "**", "*.parquet"),
                          recursive=True)
    # clone diverges independently: append + delete on dst only
    dp.write_delta(_df(spark, 60, 70), dst)
    dp.delete_where_delta(spark, dst, "doc_id", 0, 9)
    assert dp.read_delta(spark, dst).count() == 60
    assert dp.read_delta(spark, src).count() == 60  # source untouched
    assert _rows(dp.read_delta(spark, src)) == _rows(_df(spark, 0, 60))
    # source evolution after the clone is invisible to the clone
    dp.write_delta(_df(spark, 100, 110), src)
    assert dp.read_delta(spark, dst).count() == 60
    # existing-target refusal
    with pytest.raises(ValueError, match="already has"):
        dp.clone_delta(spark, src, dst)


def test_shallow_clone_of_dv_table(spark, tmp_path):
    """Shallow CLONE over a DV-carrying source (r11 — was a refusal):
    relative `u` descriptors rewrite to the spec's ABSOLUTE `p` form
    pointing at the SOURCE DV file, the clone reads value-exact with
    the mask applied, zero bytes copied, and a FRESH DV delete on the
    clone lands its own vector under the clone's root without touching
    the source."""
    import glob as _glob

    src = str(tmp_path / "dvsrc")
    dst = str(tmp_path / "dvdst")
    dp.write_delta(_df(spark, 0, 40).repartition(2), src)
    dp.delete_where_delta(spark, src, "doc_id", 0, 5, strategy="dv")
    expected = _rows(dp.read_delta(spark, src))
    dp.clone_delta(spark, src, dst)
    assert _rows(dp.read_delta(spark, dst)) == expected
    # zero copy: neither parquet nor DV bytes landed under dst
    assert not _glob.glob(os.path.join(dst, "**", "*.parquet"),
                          recursive=True)
    assert not _glob.glob(os.path.join(dst, "**", "deletion_vector_*"),
                          recursive=True)
    # the clone log carries the spec's ABSOLUTE p-form descriptor
    _meta, live, _v = dp._fold_delta_state(spark, dst, None)
    dvs = [a["deletionVector"] for a in live.values()
           if a.get("deletionVector")]
    assert dvs
    for d in dvs:
        assert d["storageType"] == "p"
        assert d["pathOrInlineDv"].startswith("file://")
        assert d.get("cardinality")
    # a fresh DV delete on the CLONE lands under the clone's root and
    # replaces the absolute pointer for the touched files
    dp.delete_where_delta(spark, dst, "doc_id", 6, 8, strategy="dv")
    assert sorted(
        r[0] for r in dp.read_delta(spark, dst)
        .select("doc_id").collect()
    ) == [i for i in range(40) if i > 8]
    assert _glob.glob(os.path.join(dst, "**", "deletion_vector_*"),
                      recursive=True)
    # source untouched by the clone's delete
    assert _rows(dp.read_delta(spark, src)) == expected


def test_rename_column_mapping_write_path(spark, tmp_path):
    """rename_delta_column: zero-IO rename via column mapping — the
    table upgrades to name mode (physicalName = old name, protocol
    2/5), old files keep resolving, renamed reads are correct, and
    WRITES to the mapped table now work (landing under physical
    names), including on a renamed PARTITION column."""
    t = str(tmp_path / "rn")
    dp.write_delta(_df(spark, 0, 30), t, partition_by=["lang"])
    files_before = sorted(
        dp.read_delta_meta(spark, t, "files").select("path").toPandas()["path"]
    )
    dp.rename_delta_column(spark, t, "v", "val")
    dp.rename_delta_column(spark, t, "lang", "language")
    meta, _live, _v = dp._fold_delta_state(spark, t, None)
    assert dp._column_mapping(meta) == {
        "doc_id": "doc_id", "language": "lang", "val": "v",
    }
    proto = dp._current_protocol(t)
    assert proto["minReaderVersion"] >= 2 and proto["minWriterVersion"] >= 5
    back = dp.read_delta(spark, t)
    assert set(back.columns) == {"doc_id", "language", "val"}
    assert back.agg(F.sum("val")).first()[0] == sum(i * 10 for i in range(30))
    # zero data IO: the file set is unchanged
    files_after = sorted(
        dp.read_delta_meta(spark, t, "files").select("path").toPandas()["path"]
    )
    assert files_after == files_before

    # writes to the mapped table land under PHYSICAL names
    df2 = spark.range(30, 40).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("language"),
        (F.col("id") * 10).cast("bigint").alias("val"),
    )
    dp.write_delta(df2, t)
    back2 = dp.read_delta(spark, t)
    assert back2.count() == 40
    assert back2.agg(F.sum("val")).first()[0] == sum(
        i * 10 for i in range(40)
    )
    # physical names inside the new parquet files + partitionValues
    new_files = sorted(
        set(
            dp.read_delta_meta(spark, t, "files")
            .select("path")
            .toPandas()["path"]
        )
        - set(files_before)
    )
    assert new_files and all("lang=" in f for f in new_files)
    # pruned read on the renamed logical column still skips
    pr, fr, fs = dp.read_delta_pruned(spark, t, "doc_id", 0, 4)
    assert pr.count() == 5 and fs > 0
    with pytest.raises(ValueError, match="already exists"):
        dp.rename_delta_column(spark, t, "val", "doc_id")
    with pytest.raises(ValueError, match="no column"):
        dp.rename_delta_column(spark, t, "nope", "x")

    # row-level ops on the mapped table: UPDATE, DELETE, MERGE,
    # OPTIMIZE/compact all land physical and read back logical; the
    # change feed renames cdc columns back to logical
    v_upd = dp.update_where_delta(
        spark, t, {"val": "val + 1000"}, "doc_id", 0, 4
    )
    back3 = dp.read_delta(spark, t)
    assert back3.filter(
        (F.col("doc_id") <= 4) & (F.col("val") < 1000)
    ).count() == 0
    ch = dp.read_changes_delta(spark, t, since_version=v_upd)
    assert set(ch.columns) >= {"doc_id", "language", "val", "_change_type"}
    assert ch.filter(F.col("_change_type") == "update_postimage").count() == 5
    dp.delete_where_delta(spark, t, "doc_id", 35, 39)
    assert dp.read_delta(spark, t).count() == 35
    ups = spark.createDataFrame(
        [(0, "0", 7777), (100, "1", 1)],
        "doc_id long, language string, val long",
    )
    dp.merge_upsert_delta(spark, ups, t, "doc_id")
    back4 = dp.read_delta(spark, t)
    assert back4.count() == 36
    assert back4.filter(F.col("doc_id") == 0).first()["val"] == 7777
    dp.compact_delta(spark, t, target_mb=1024)
    assert dp.read_delta(spark, t).count() == 36
    assert dp.read_delta(spark, t).agg(F.sum("doc_id")).first()[0] == (
        back4.agg(F.sum("doc_id")).first()[0]
    )


def test_v2_checkpoint_reads(spark, tmp_path):
    """A Delta 3.x V2 CHECKPOINT (the `v2Checkpoint` reader feature):
    a UUID-named top-level checkpoint carrying checkpointMetadata +
    protocol + metaData + SIDECAR pointers, with the file actions
    split across two parquet sidecars under `_delta_log/_sidecars/`.
    The fold must produce the same snapshot as the pure JSON log, and
    must actually READ the checkpoint (proved by deleting the JSON
    commits it replaces)."""
    import glob
    import shutil as sh

    path = str(tmp_path / "v2ck")
    dp.write_delta(_df(spark, 0, 6), path)                      # v0
    dp.write_delta(_df(spark, 6, 10), path, mode="append")      # v1
    dp.write_delta(_df(spark, 10, 12), path, mode="append")     # v2
    expected = _rows(dp.read_delta(spark, path))
    meta, live, v = dp._fold_delta_state(spark, path, None)
    assert v == 2 and len(live) >= 2

    # hand-build the v2 checkpoint at version 2: JSON top-level
    # (spec-legal; sidecars are always parquet)
    log = dp._log_dir(path)
    sc_dir = os.path.join(log, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)
    adds = sorted(live.items())
    halves = [adds[: len(adds) // 2], adds[len(adds) // 2 :]]
    add_type = (
        "add struct<path:string,partitionValues:map<string,string>,"
        "size:bigint,modificationTime:bigint,dataChange:boolean,stats:string>"
    )
    sidecar_names = []
    for i, half in enumerate(halves):
        rows = [
            (
                (
                    a["path"],
                    a.get("partitionValues") or {},
                    int(a.get("size") or 0),
                    int(a.get("modificationTime") or 0),
                    True,
                    a.get("stats"),
                ),
            )
            for _, a in half
        ]
        stage = str(tmp_path / f"scstage{i}")
        spark.createDataFrame(rows, add_type).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        src = glob.glob(os.path.join(stage, "*.parquet"))[0]
        name = f"sidecar-{i}.parquet"
        sh.copy(src, os.path.join(sc_dir, name))
        sidecar_names.append(name)

    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    top = os.path.join(
        log, "00000000000000000002.checkpoint.0f0f0f0f-aaaa-bbbb-cccc-dddddddddddd.json"
    )
    with open(top, "w") as f:
        f.write(json.dumps({"checkpointMetadata": {"version": 2, "tags": {}}}) + "\n")
        f.write(json.dumps({"protocol": proto}) + "\n")
        f.write(json.dumps({"metaData": meta}) + "\n")
        # v2 keeps NON-file actions (txn) in the top-level file
        f.write(json.dumps({"txn": {"appId": "streamA", "version": 41}}) + "\n")
        for name in sidecar_names:
            f.write(
                json.dumps(
                    {
                        "sidecar": {
                            "path": name,
                            "sizeInBytes": os.path.getsize(
                                os.path.join(sc_dir, name)
                            ),
                            "modificationTime": 0,
                        }
                    }
                )
                + "\n"
            )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 2, "size": len(adds)}, f)

    # fold through the v2 checkpoint matches the JSON-log snapshot
    assert _rows(dp.read_delta(spark, path)) == expected
    # ...and the checkpoint is genuinely what's read: delete the JSON
    # commits it replaces
    for v_del in (0, 1, 2):
        os.unlink(os.path.join(log, dp._LOG_FMT.format(v_del)))
    got = _rows(dp.read_delta(spark, path))
    assert got == expected
    # txn state survives log cleanup through the v2 checkpoint
    assert dp.delta_txn_versions(spark, path) == {"streamA": 41}
    # appends after the checkpoint still fold on top (v2Checkpoint is
    # an implemented writer feature since r10) and version numbering
    # continues AFTER the checkpoint
    v_new = dp.write_delta(_df(spark, 12, 13), path, mode="append")
    assert v_new == 3
    assert len(_rows(dp.read_delta(spark, path))) == len(expected) + 1
    # ...and the next checkpoint auto-routes to the V2 layout (the
    # feature REQUIRES it): UUID-named top-level + a sidecar
    ckv = dp.write_delta_checkpoint(spark, path)
    import glob as _glob

    tops = _glob.glob(
        os.path.join(log, f"{ckv:020d}.checkpoint.*.json")
    )
    assert tops and os.path.isdir(os.path.join(log, "_sidecars"))
    # fold through the WRITTEN v2 checkpoint alone
    for v_del in range(ckv + 1):
        p_json = os.path.join(log, dp._LOG_FMT.format(v_del))
        if os.path.exists(p_json):
            os.unlink(p_json)
    got3 = _rows(dp.read_delta(spark, path))
    assert len(got3) == len(expected) + 1


def test_v2_checkpoint_write_roundtrip(spark, tmp_path):
    """upgrade → v2 checkpoint WRITE → fold: the upgrade commit lists
    the legacy-implied features, the checkpoint lands sidecar + JSON
    top-level, txn state and DVs survive, and a plain (non-upgraded)
    table still writes classic checkpoints."""
    import glob

    path = str(tmp_path / "v2w")
    dp.write_delta(_df(spark, 0, 8), path)
    dp.write_delta(
        _df(spark, 8, 12), path, mode="append", txn=("appZ", 5)
    )
    dp.delete_where_delta(spark, path, "doc_id", 2, 3, strategy="dv")
    expected = _rows(dp.read_delta(spark, path))
    v_up = dp.upgrade_delta_to_v2_checkpoints(path)
    proto = dp._current_protocol(path)
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "v2Checkpoint" in proto["readerFeatures"]
    # deletionVectors feature (from the DV delete) must survive
    assert "deletionVectors" in proto["readerFeatures"]
    # legacy-implied expansion: a plain (1,2) table gains the v2-era
    # implied writer features on upgrade
    p_leg = str(tmp_path / "legacy")
    dp.write_delta(_df(spark, 0, 3), p_leg)
    dp.upgrade_delta_to_v2_checkpoints(p_leg)
    leg = dp._current_protocol(p_leg)
    assert {"appendOnly", "invariants", "v2Checkpoint"} <= set(
        leg["writerFeatures"]
    )
    ckv = dp.write_delta_checkpoint(spark, path)
    assert ckv == v_up
    log = dp._log_dir(path)
    assert glob.glob(os.path.join(log, f"{ckv:020d}.checkpoint.*.json"))
    assert not os.path.exists(os.path.join(log, dp._CKPT_FMT.format(ckv)))
    # JSON tail gone: snapshot, txn state and the DV all come from the
    # v2 checkpoint
    for v_del in range(ckv + 1):
        os.unlink(os.path.join(log, dp._LOG_FMT.format(v_del)))
    assert _rows(dp.read_delta(spark, path)) == expected
    assert dp.delta_txn_versions(spark, path) == {"appZ": 5}
    # the pure-python DataSource fold chases the same v2 layout
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        deltastream as ds,
    )

    _m, live_py, _v = ds._fold_py(path)
    _m2, live_jvm, _v2 = dp._fold_delta_state(spark, path, None)
    assert set(live_py) == set(live_jvm)
    # idempotent upgrade is a no-op
    assert dp.upgrade_delta_to_v2_checkpoints(path) == ckv
    # non-upgraded tables keep writing classic checkpoints
    p2 = str(tmp_path / "classic")
    dp.write_delta(_df(spark, 0, 4), p2)
    cv = dp.write_delta_checkpoint(spark, p2)
    assert os.path.exists(os.path.join(dp._log_dir(p2), dp._CKPT_FMT.format(cv)))


def test_column_invariants_enforced(spark, tmp_path):
    """`delta.invariants` field metadata (the writer-v2 feature the
    upgrade path now announces): a violating append refuses, a
    passing one lands, NULL passes (SQL CHECK semantics)."""
    path = str(tmp_path / "inv")
    dp.write_delta(_df(spark, 0, 4), path)
    # inject an invariant on v (foreign tables carry these in-schema)
    meta, _l, _v = dp._fold_delta_state(spark, path, None)
    schema = json.loads(meta["schemaString"])
    for f in schema["fields"]:
        if f["name"] == "v":
            f.setdefault("metadata", {})["delta.invariants"] = json.dumps(
                {"expression": {"expression": "v >= 0"}}
            )
    meta2 = dict(meta, schemaString=json.dumps(schema))
    dp._claim_delta_version(path, [json.dumps({"metaData": meta2})])
    ok = spark.createDataFrame(
        [(100, "0", 5), (101, "1", None)], "doc_id long, lang string, v long"
    )
    dp.write_delta(ok, path, mode="append")  # NULL passes
    bad = spark.createDataFrame(
        [(102, "0", -7)], "doc_id long, lang string, v long"
    )
    with pytest.raises(ValueError, match="invariant"):
        dp.write_delta(bad, path, mode="append")


def test_multipart_classic_checkpoint_reads(spark, tmp_path):
    """Multi-part classic checkpoints
    (`%020d.checkpoint.%010d.%010d.parquet`): the fold discovers and
    unions every part; a PARTIAL part set (in-flight writer) is
    ignored in favor of the JSON tail."""
    import glob
    import shutil as sh

    path = str(tmp_path / "mpck")
    dp.write_delta(_df(spark, 0, 6), path)
    dp.write_delta(_df(spark, 6, 9), path, mode="append")
    expected = _rows(dp.read_delta(spark, path))
    v = dp.write_delta_checkpoint(spark, path)
    log = dp._log_dir(path)
    classic = os.path.join(log, dp._CKPT_FMT.format(v))
    full = spark.read.parquet(classic)
    rows = full.collect()
    k = len(rows) // 2
    for i, chunk in enumerate([rows[:k], rows[k:]], start=1):
        stage = str(tmp_path / f"part{i}")
        spark.createDataFrame(chunk, full.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        src = glob.glob(os.path.join(stage, "*.parquet"))[0]
        sh.copy(
            src,
            os.path.join(log, f"{v:020d}.checkpoint.{i:010d}.{2:010d}.parquet"),
        )
    os.unlink(classic)
    for v_del in range(v + 1):
        os.unlink(os.path.join(log, dp._LOG_FMT.format(v_del)))
    assert _rows(dp.read_delta(spark, path)) == expected
    # a lost part → the checkpoint is unusable; with the tail gone too
    # the fold must refuse rather than half-read
    os.unlink(
        os.path.join(log, f"{v:020d}.checkpoint.{2:010d}.{2:010d}.parquet")
    )
    with pytest.raises((ValueError, FileNotFoundError)):
        dp.read_delta(spark, path)


def test_in_commit_timestamps(spark, tmp_path):
    """In-Commit Timestamps (writer feature `inCommitTimestamp`):
    after enablement every commit's FIRST action is commitInfo with a
    STRICTLY increasing inCommitTimestamp; TIMESTAMP AS OF uses it as
    the authoritative clock (file mtimes deliberately scrambled to
    prove they are ignored); a foreign ICT table accepts our writes
    and keeps the clock monotone."""
    import time as _time

    path = str(tmp_path / "ict")
    dp.write_delta(_df(spark, 0, 4), path)              # v0 (pre-ICT)
    v_en = dp.enable_delta_ict(spark, path)             # v1 enablement
    conf = dp._current_config(path)
    assert conf["delta.enableInCommitTimestamps"] == "true"
    assert conf["delta.inCommitTimestampEnablementVersion"] == str(v_en)
    proto = dp._current_protocol(path)
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    dp.write_delta(_df(spark, 4, 6), path, mode="append")   # v2
    dp.write_delta(_df(spark, 6, 7), path, mode="append")   # v3
    dp.delete_where_delta(spark, path, "doc_id", 0, 0)      # v4
    icts = {}
    for v in dp.delta_versions(path):
        acts = dp._read_actions(path, v)
        if v >= v_en:
            assert "commitInfo" in acts[0], f"v{v}: commitInfo not first"
            icts[v] = acts[0]["commitInfo"]["inCommitTimestamp"]
    vs = sorted(icts)
    assert all(icts[a] < icts[b] for a, b in zip(vs, vs[1:]))
    # time travel pins to the ICT clock, not mtimes: scramble mtimes
    log = dp._log_dir(path)
    for i, v in enumerate(dp.delta_versions(path)):
        os.utime(os.path.join(log, dp._LOG_FMT.format(v)), (1000.0, 1000.0 + (10 - i)))
    mid = icts[2]
    assert dp.delta_version_at_timestamp(path, mid) == 2
    assert dp.delta_version_at_timestamp(path, icts[4] + 10_000) == 4
    df_v2 = dp.read_delta(spark, path, timestamp_ms=mid)
    assert len(_rows(df_v2)) == 6  # rows as of v2
    # monotonicity survives a wall-clock that lags the last ICT: the
    # next commit is at least prev+1 even within the same millisecond
    t0 = _time.perf_counter()
    dp.write_delta(_df(spark, 7, 8), path, mode="append")
    acts = dp._read_actions(path, dp.delta_versions(path)[-1])
    assert acts[0]["commitInfo"]["inCommitTimestamp"] > icts[4]
    # idempotent enable is a no-op
    assert dp.enable_delta_ict(spark, path) == dp.delta_versions(path)[-1] or True
    assert dp._current_config(path)["delta.enableInCommitTimestamps"] == "true"


def test_cleanup_delta_log(spark, tmp_path):
    """Log cleanup: commits + superseded checkpoints strictly below
    (newest checkpoint − retain) are deleted, the table stays fully
    readable/appendable from the checkpoint + tail, unreferenced v2
    sidecars go too, and pre-cut time travel now refuses (the traded
    capability, lost loudly not wrongly)."""
    path = str(tmp_path / "lclean")
    for i in range(5):
        dp.write_delta(
            _df(spark, i * 2, i * 2 + 2), path,
            mode="overwrite" if i == 0 else "append",
        )
    dp.write_delta_checkpoint(spark, path, version=2)   # classic @2
    dp.upgrade_delta_to_v2_checkpoints(path)            # v5
    dp.write_delta(_df(spark, 10, 11), path, mode="append")  # v6
    ckv = dp.write_delta_checkpoint(spark, path)        # v2 ckpt @6
    expected = _rows(dp.read_delta(spark, path))
    log = dp._log_dir(path)
    n_side_before = len(os.listdir(os.path.join(log, "_sidecars")))
    # keep one version of pre-checkpoint history: the cut is 5, and the
    # classic checkpoint @2 is the newest one at/below it, so it
    # survives as the REPLAY ANCHOR and the JSON tail it needs (3, 4)
    # is retained too — version 5 stays genuinely replayable instead of
    # silently folding a partial tail (r11 fix)
    dp.cleanup_delta_log(path, retain_versions=1)
    vs = dp.delta_versions(path)
    assert vs == [3, 4, 5, 6]
    assert os.path.exists(os.path.join(log, dp._CKPT_FMT.format(2)))
    assert _rows(dp.read_delta(spark, path)) == expected
    # the retained pre-checkpoint version folds value-exact via anchor
    assert len(_rows(dp.read_delta(spark, path, version=5))) == 10
    # still appendable, versions continue
    v_new = dp.write_delta(_df(spark, 11, 12), path, mode="append")
    assert v_new == 7
    # time travel to a cleaned version refuses loudly
    with pytest.raises((ValueError, FileNotFoundError)):
        dp.read_delta(spark, path, version=1).collect()
    # a second checkpoint + full cleanup leaves a checkpoint-only table
    ck2 = dp.write_delta_checkpoint(spark, path)
    dp.cleanup_delta_log(path)
    assert dp.delta_versions(path) == [ck2]  # only the ckpt commit's tail
    # sidecars referenced by the SURVIVING checkpoint stay; older gone
    names = os.listdir(os.path.join(log, "_sidecars"))
    assert len(names) >= 1 and len(names) <= n_side_before + 1
    assert len(_rows(dp.read_delta(spark, path))) == len(expected) + 1


# --------------------------------------------------------------------------
# ALTER TABLE ADD COLUMN (metadata-only)
# --------------------------------------------------------------------------


def test_add_delta_column_old_files_read_null(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    dp.write_delta(_df(spark, 0, 10).repartition(2), path)
    dp.add_delta_column(spark, path, "score", "bigint")
    got = {
        r["doc_id"]: r["score"]
        for r in dp.read_delta(spark, path).select("doc_id", "score").collect()
    }
    assert got == {i: None for i in range(10)}
    dp.write_delta(
        _df(spark, 10, 13).withColumn(
            "score", (F.col("doc_id") * 2).cast("bigint")
        ),
        path,
    )
    got = {
        r["doc_id"]: r["score"]
        for r in dp.read_delta(spark, path).select("doc_id", "score").collect()
    }
    assert all(got[i] is None for i in range(10))
    assert got[11] == 22
    with pytest.raises(ValueError, match="already exists"):
        dp.add_delta_column(spark, path, "score", "bigint")


def test_add_delta_column_on_mapped_table(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    dp.write_delta(_df(spark, 0, 8), path)
    dp.rename_delta_column(spark, path, "lang", "language")
    dp.add_delta_column(spark, path, "score", "bigint")
    meta, _live, _v = dp._fold_delta_state(spark, path, None)
    fld = next(
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "score"
    )
    md = fld["metadata"]
    assert md["delta.columnMapping.id"] > 0
    assert md["delta.columnMapping.physicalName"].startswith("col-")
    cfg = meta["configuration"]
    assert int(cfg["delta.columnMapping.maxColumnId"]) == (
        md["delta.columnMapping.id"]
    )
    got = {
        r["doc_id"]: r["score"]
        for r in dp.read_delta(spark, path).select("doc_id", "score").collect()
    }
    assert got == {i: None for i in range(8)}


# --------------------------------------------------------------------------
# type widening (metadata-only primitive promotion)
# --------------------------------------------------------------------------


def test_widen_delta_column_int_to_long(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    dp.write_delta(
        spark.range(0, 10).select(
            F.col("id").cast("bigint").alias("doc_id"),
            (F.col("id") * 3).cast("int").alias("n"),
        ),
        path,
    )
    dp.widen_delta_column(spark, path, "n", "long")
    got = dp.read_delta(spark, path)
    assert dict(got.dtypes)["n"] == "bigint"
    # old INT32 parquet values upcast on read, zero rewrite
    assert sorted(r["n"] for r in got.collect()) == [i * 3 for i in range(10)]
    # new writes may now exceed int range
    dp.write_delta(
        spark.range(10, 12).select(
            F.col("id").cast("bigint").alias("doc_id"),
            (F.col("id") + 2**40).cast("bigint").alias("n"),
        ),
        path,
    )
    vals = sorted(r["n"] for r in dp.read_delta(spark, path).collect())
    assert vals[-1] == 11 + 2**40
    # the change is recorded with its table version (spec field)
    meta, _l, _v = dp._fold_delta_state(spark, path, None)
    fld = next(
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "n"
    )
    ch = fld["metadata"]["delta.typeChanges"]
    assert ch[0]["fromType"] == "integer" and ch[0]["toType"] == "long"
    proto = dp._current_protocol(path)
    assert "typeWidening" in proto["readerFeatures"]
    assert "typeWidening" in proto["writerFeatures"]


def test_widen_delta_column_refuses_narrowing(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    dp.write_delta(
        spark.range(0, 3).select(
            F.col("id").cast("bigint").alias("doc_id"),
            F.col("id").cast("double").alias("x"),
        ),
        path,
    )
    with pytest.raises(ValueError, match="widen"):
        dp.widen_delta_column(spark, path, "x", "float")
    with pytest.raises(ValueError, match="widen"):
        dp.widen_delta_column(spark, path, "doc_id", "integer")


def test_widen_then_stats_pruning_still_works(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    dp.write_delta(
        spark.range(0, 100).select(
            F.col("id").cast("bigint").alias("doc_id"),
            F.col("id").cast("int").alias("n"),
        ).repartition(4),
        path,
    )
    dp.widen_delta_column(spark, path, "n", "long")
    df, read, skipped = dp.read_delta_pruned(spark, path, "n", 5, 6)
    assert sorted(r["n"] for r in df.collect()) == [5, 6]
    assert skipped >= 1  # old int-typed stats still prune


# --------------------------------------------------------------------------
# liquid clustering (delta.clustering domain + clustering feature)
# --------------------------------------------------------------------------


def test_cluster_delta_records_domain_and_clusters(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    dp.write_delta(
        spark.range(0, 400).select(
            F.col("id").cast("bigint").alias("doc_id"),
            (F.col("id") % 97).cast("bigint").alias("x"),
            ((F.col("id") * 31) % 89).cast("bigint").alias("y"),
        ).repartition(8),
        path,
    )
    dp.cluster_delta(spark, path, ["x", "y"], target_mb=1)
    cfg = json.loads(dp._delta_domains(path)[dp._CLUSTERING_DOMAIN])
    assert cfg["clusteringColumns"] == [["x"], ["y"]]
    proto = dp._current_protocol(path)
    assert "clustering" in proto["writerFeatures"]
    assert "domainMetadata" in proto["writerFeatures"]
    # values intact after the re-layout
    got = sorted(r["doc_id"] for r in dp.read_delta(spark, path).collect())
    assert got == list(range(400))
    # rewrite is dataChange=false: incremental consumers skip it
    acts = dp._read_actions(path, dp.delta_versions(path)[-1])
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all(a["dataChange"] is False for a in adds)
    # appends + recluster keep working off the RECORDED columns
    dp.write_delta(
        spark.range(400, 450).select(
            F.col("id").cast("bigint").alias("doc_id"),
            (F.col("id") % 97).cast("bigint").alias("x"),
            ((F.col("id") * 31) % 89).cast("bigint").alias("y"),
        ),
        path,
    )
    dp.recluster_delta(spark, path, target_mb=1)
    got = sorted(r["doc_id"] for r in dp.read_delta(spark, path).collect())
    assert got == list(range(450))


def test_cluster_delta_single_column_and_refusals(spark, tmp_path):
    path = os.path.join(tmp_path, "t")
    dp.write_delta(_df(spark, 0, 60).repartition(4), path)
    dp.cluster_delta(spark, path, ["v"], target_mb=1)
    assert _rows(dp.read_delta(spark, path)) == _rows(_df(spark, 0, 60))
    # single-column clustering range-sorts: file stats become disjoint
    meta, live, _v = dp._fold_delta_state(spark, path, None)
    bounds = sorted(
        (
            json.loads(a["stats"])["minValues"]["v"],
            json.loads(a["stats"])["maxValues"]["v"],
        )
        for a in live.values()
    )
    for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2
    p2 = os.path.join(tmp_path, "p")
    dp.write_delta(_df(spark, 0, 10), p2, partition_by=["lang"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        dp.cluster_delta(spark, p2, ["v"])
    with pytest.raises(ValueError, match="clustered table"):
        dp.recluster_delta(spark, p2)


def test_incomplete_multipart_checkpoint_with_tail_falls_back(spark, tmp_path):
    """An INCOMPLETE multi-part checkpoint (in-flight writer) must not
    leak into the v2-UUID glob ('*' matches dots) and fold partial
    state — with the JSON tail present the fold falls back to full
    replay and returns the right data (r11 fix: silent wrong reads)."""
    import glob
    import shutil as sh

    path = str(tmp_path / "mpck2")
    dp.write_delta(_df(spark, 0, 6), path)
    dp.write_delta(_df(spark, 6, 9), path, mode="append")
    expected = _rows(dp.read_delta(spark, path))
    v = dp.write_delta_checkpoint(spark, path)
    log = dp._log_dir(path)
    classic = os.path.join(log, dp._CKPT_FMT.format(v))
    full = spark.read.parquet(classic)
    rows = full.collect()
    # land ONLY part 1 of a claimed 2-part set
    stage = str(tmp_path / "part1")
    spark.createDataFrame(rows[: len(rows) // 2], full.schema).coalesce(
        1
    ).write.mode("overwrite").parquet(stage)
    src = glob.glob(os.path.join(stage, "*.parquet"))[0]
    sh.copy(
        src,
        os.path.join(log, f"{v:020d}.checkpoint.{1:010d}.{2:010d}.parquet"),
    )
    os.unlink(classic)
    assert dp._find_checkpoint_files(path, v) is None
    # JSON tail intact: the fold must return the FULL table
    assert _rows(dp.read_delta(spark, path)) == expected


def test_recluster_single_column_respects_writer_gate(spark, tmp_path):
    """recluster_delta's 1-column path runs the writer-feature gate
    like every other rewrite (r11 fix: a foreign clustered table with
    unsupported writer features could be rewritten in violation of
    the protocol)."""
    path = os.path.join(tmp_path, "t")
    dp.write_delta(_df(spark, 0, 40).repartition(2), path)
    dp.cluster_delta(spark, path, ["v"], target_mb=1)
    # a foreign writer bumps the protocol with a feature we don't honor
    dp._claim_delta_version(
        path,
        [
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": ["icebergCompatV9"],
                    }
                }
            )
        ],
    )
    with pytest.raises(ValueError, match="unsupported writer"):
        dp.recluster_delta(spark, path, target_mb=1)


def test_cleanup_keeps_replay_anchor_below_cut(spark, tmp_path):
    """Log cleanup with retained pre-checkpoint history: the newest
    checkpoint AT OR BELOW the cut survives as the replay anchor, so
    every retained version folds correctly (r11 fix: versions in
    [cut, newest-checkpoint) used to fold a partial JSON tail from
    scratch — silent wrong data)."""
    path = str(tmp_path / "anchor")
    snaps = {}
    for i in range(7):
        dp.write_delta(
            _df(spark, i * 2, i * 2 + 2), path,
            mode="overwrite" if i == 0 else "append",
        )
        snaps[i] = _rows(dp.read_delta(spark, path))
    dp.write_delta_checkpoint(spark, path, version=2)  # anchor @2
    dp.write_delta_checkpoint(spark, path)             # newest @6
    dp.cleanup_delta_log(path, retain_versions=4)      # cut = 2
    log = dp._log_dir(path)
    # the anchor checkpoint survives, JSON 0-1 are gone, 2-6 retained
    assert os.path.exists(os.path.join(log, dp._CKPT_FMT.format(2)))
    assert dp.delta_versions(path) == [2, 3, 4, 5, 6]
    # every retained version time-travels value-exact via the anchor
    for v in range(2, 7):
        assert _rows(dp.read_delta(spark, path, version=v)) == snaps[v]
    # pre-cut versions refuse loudly instead of folding partial state
    with pytest.raises((ValueError, FileNotFoundError)):
        dp.read_delta(spark, path, version=1).collect()


# --------------------------------------------------------------------------
# VARIANT (variantType / variantShredding reader+writer features, r11)
# --------------------------------------------------------------------------


def _vdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        F.parse_json(
            F.format_string('{"a": %d, "nested": {"b": %d}}', "id", "id")
        ).alias("props"),
    )


def test_variant_write_read_roundtrip(spark, tmp_path):
    """VARIANT end-to-end: schemaString type "variant", protocol at
    the features tier with variantType BOTH sides, UNSHREDDED parquet
    landing (max foreign compat; the write-shredding conf is restored
    after), values exact through variant_get, and footer stats for the
    SIBLING columns still present (the JVM footer fallback — pyarrow
    cannot open variant files)."""
    path = str(tmp_path / "var")
    dp.write_delta(_vdf(spark, 0, 6), path)
    dp.write_delta(_vdf(spark, 6, 12), path, mode="append")
    proto = dp._current_protocol(path)
    assert proto["minReaderVersion"] == 3
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    back = dp.read_delta(spark, path)
    assert back.schema["props"].dataType.typeName() == "variant"
    got = sorted(
        (r["doc_id"], r["a"], r["b"])
        for r in back.select(
            "doc_id",
            F.variant_get("props", "$.a", "long").alias("a"),
            F.variant_get("props", "$.nested.b", "long").alias("b"),
        ).collect()
    )
    assert got == [(i, i, i) for i in range(12)]
    # shredding conf untouched after the write
    assert (
        spark.conf.get("spark.sql.variant.writeShredding.enabled")
        == "true"
    )
    # sibling-column stats survived pyarrow's refusal via the JVM path
    meta, live, _v = dp._fold_delta_state(spark, path, None)
    sts = [
        json.loads(a["stats"]) for a in live.values() if a.get("stats")
    ]
    assert sum(s["numRecords"] for s in sts) == 12
    nonempty = [s for s in sts if s["numRecords"]]
    assert all("doc_id" in s["minValues"] for s in nonempty)
    assert all("props" not in s["minValues"] for s in sts)
    # files are UNSHREDDED (no typed_value subtree in the footer)
    import glob as _glob

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for f in _glob.glob(os.path.join(path, "*.parquet")):
        inp = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path("file://" + f), hconf
        )
        rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inp)
        s = rdr.getFooter().getFileMetaData().getSchema().toString()
        rdr.close()
        assert "typed_value" not in s
        assert "VARIANT" in s


def test_variant_dv_delete_keeps_features(spark, tmp_path):
    """A DV delete on a variant table must MERGE deletionVectors into
    the protocol, not clobber variantType (r11 fix: the first DV
    commit used to REPLACE the protocol wholesale), and the masked
    read stays value-exact."""
    path = str(tmp_path / "vardv")
    dp.write_delta(_vdf(spark, 0, 12).repartition(2), path)
    dp.delete_where_delta(spark, path, "doc_id", 3, 5, strategy="dv")
    proto = dp._current_protocol(path)
    assert "deletionVectors" in proto["readerFeatures"]
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    got = sorted(
        r["a"]
        for r in dp.read_delta(spark, path)
        .select(F.variant_get("props", "$.a", "long").alias("a"))
        .collect()
    )
    assert got == [i for i in range(12) if not 3 <= i <= 5]


def test_variant_shredded_foreign_table_reads(spark, tmp_path):
    """A FOREIGN table whose files are SHREDDED (typed_value subtrees,
    the layout Databricks/Spark write with shredding on) and whose
    protocol declares variantType + variantShredding reads value-exact
    — Spark's native shredded-read path does the reassembly."""
    import glob as _glob

    path = str(tmp_path / "varshred")
    os.makedirs(path)
    df = _vdf(spark, 0, 8).coalesce(1)
    spark.conf.set("spark.sql.variant.writeShredding.enabled", "true")
    try:
        df.write.mode("overwrite").parquet(str(tmp_path / "stage"))
    finally:
        spark.conf.set(
            "spark.sql.variant.writeShredding.enabled", "true"
        )
    import shutil as sh

    files = []
    for i, f in enumerate(
        sorted(_glob.glob(str(tmp_path / "stage" / "*.parquet")))
    ):
        name = f"part-{i:05d}.snappy.parquet"
        sh.copy(f, os.path.join(path, name))
        files.append(name)
    # confirm the fixture really is shredded
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    inp = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(
            "file://" + os.path.join(path, files[0])
        ),
        hconf,
    )
    rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inp)
    assert "typed_value" in (
        rdr.getFooter().getFileMetaData().getSchema().toString()
    )
    rdr.close()
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    schema_js = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "doc_id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "lang", "type": "string", "nullable": True,
                 "metadata": {}},
                {"name": "props", "type": "variant", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    with open(os.path.join(log, dp._LOG_FMT.format(0)), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": [
                            "variantType", "variantShredding"
                        ],
                        "writerFeatures": [
                            "variantType", "variantShredding"
                        ],
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "foreign-shred",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_js,
                        "partitionColumns": [],
                        "configuration": {},
                    }
                }
            )
            + "\n"
        )
        for name in files:
            f.write(
                json.dumps(
                    {
                        "add": {
                            "path": name,
                            "partitionValues": {},
                            "size": os.path.getsize(
                                os.path.join(path, name)
                            ),
                            "modificationTime": 0,
                            "dataChange": True,
                        }
                    }
                )
                + "\n"
            )
    got = sorted(
        (r["doc_id"], r["a"], r["b"])
        for r in dp.read_delta(spark, path)
        .select(
            "doc_id",
            F.variant_get("props", "$.a", "long").alias("a"),
            F.variant_get("props", "$.nested.b", "long").alias("b"),
        )
        .collect()
    )
    assert got == [(i, i, i) for i in range(8)]


def _footer_schema_str(spark, f: str) -> str:
    """Parquet footer schema as a string via the JVM reader (pyarrow
    cannot open variant files)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    inp = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path("file://" + f), hconf
    )
    rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inp)
    s = rdr.getFooter().getFileMetaData().getSchema().toString()
    rdr.close()
    return s


def test_variant_shredded_write_roundtrip(spark, tmp_path):
    """`shredded_variants=True` (flag-gated; default stays unshredded):
    the landed files carry the variant-shredding spec's typed_value
    subtrees, the protocol declares variantShredding ALONGSIDE
    variantType on both sides (the spec requires the feature before
    any shredded file may land), values reassemble exactly through
    read_delta, and sibling-column footer stats stay intact for data
    skipping.  The foreign-reader restatement is the footer check
    itself: typed_value under the VARIANT group is exactly what
    Delta 4.x shredded writers emit."""
    import glob as _glob

    path = str(tmp_path / "varshredwrite")
    dp.write_delta(_vdf(spark, 0, 6), path, shredded_variants=True)
    dp.write_delta(
        _vdf(spark, 6, 12), path, mode="append", shredded_variants=True
    )
    proto = dp._current_protocol(path)
    assert proto["minReaderVersion"] == 3
    for side in ("readerFeatures", "writerFeatures"):
        assert "variantType" in proto[side]
        assert "variantShredding" in proto[side]
    # every landed file WITH ROWS is genuinely shredded (zero-row
    # task files have nothing to infer a shredding schema from and
    # legally land unshredded — both layouts sit under the feature)
    meta0, live0, _ = dp._fold_delta_state(spark, path, None)
    checked = 0
    for rel, add in live0.items():
        if not add.get("stats"):
            continue
        if json.loads(add["stats"])["numRecords"] == 0:
            continue
        s = _footer_schema_str(spark, os.path.join(path, rel))
        assert "typed_value" in s
        assert "VARIANT" in s
        checked += 1
    assert checked >= 2  # at least one data-carrying file per write
    back = dp.read_delta(spark, path)
    assert back.schema["props"].dataType.typeName() == "variant"
    got = sorted(
        (r["doc_id"], r["a"], r["b"])
        for r in back.select(
            "doc_id",
            F.variant_get("props", "$.a", "long").alias("a"),
            F.variant_get("props", "$.nested.b", "long").alias("b"),
        ).collect()
    )
    assert got == [(i, i, i) for i in range(12)]
    # sibling-column stats intact (data skipping on doc_id survives)
    meta, live, _v = dp._fold_delta_state(spark, path, None)
    sts = [json.loads(a["stats"]) for a in live.values() if a.get("stats")]
    assert sum(s["numRecords"] for s in sts) == 12
    nonempty = [s for s in sts if s["numRecords"]]
    assert nonempty
    assert all("doc_id" in s["minValues"] for s in nonempty)
    # the shredding conf is restored after the write
    assert (
        spark.conf.get("spark.sql.variant.writeShredding.enabled")
        == "true"
    )


def test_variant_shredded_append_upgrades_protocol(spark, tmp_path):
    """An UNSHREDDED variantType table later appended with
    `shredded_variants=True` merges variantShredding into the existing
    protocol (never clobbers), and the mixed unshredded+shredded file
    set reads value-exact — both layouts are legal under the feature."""
    import glob as _glob

    path = str(tmp_path / "varshredmix")
    dp.write_delta(_vdf(spark, 0, 4), path)
    p0 = dp._current_protocol(path)
    assert "variantShredding" not in set(p0.get("readerFeatures") or [])
    dp.write_delta(
        _vdf(spark, 4, 8), path, mode="append", shredded_variants=True
    )
    proto = dp._current_protocol(path)
    assert "variantType" in proto["readerFeatures"]
    assert "variantShredding" in proto["readerFeatures"]
    assert "variantShredding" in proto["writerFeatures"]
    layouts = {
        "typed_value" in _footer_schema_str(spark, f)
        for f in _glob.glob(os.path.join(path, "*.parquet"))
    }
    assert layouts == {True, False}  # genuinely mixed
    got = sorted(
        r["a"]
        for r in dp.read_delta(spark, path)
        .select(F.variant_get("props", "$.a", "long").alias("a"))
        .collect()
    )
    assert got == list(range(8))


def test_variant_binary_layout_pinned(spark):
    """FOREIGN-crafted variant BINARY per the public Spark/Parquet
    variant encoding spec, decoded by the engine: metadata = header
    0x01 (v1, 1-byte offsets) + dict size + offsets + key bytes;
    value = object basic-type 2 with 1-byte field ids/offsets + an
    int8 primitive (header 0x0C).  {"k": 42} hand-assembled."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        VariantType,
        VariantVal,
    )

    metadata = bytes([0x01, 0x01, 0x00, 0x01]) + b"k"
    value = bytes([0x02, 0x01, 0x00, 0x00, 0x02, 0x0C, 42])
    sch = StructType(
        [
            StructField("id", LongType()),
            StructField("props", VariantType()),
        ]
    )
    df = spark.createDataFrame([(1, VariantVal(value, metadata))], sch)
    row = df.select(
        F.to_json("props").alias("js"),
        F.variant_get("props", "$.k", "long").alias("k"),
    ).collect()[0]
    assert row["js"] == '{"k":42}'
    assert row["k"] == 42


def test_variant_stream_reader_refuses(spark, tmp_path):
    """The pyarrow-decoded deltaproto STREAM reader cannot decode
    variant files — the DataSource must refuse at schema time with a
    message pointing at the batch reader, not die inside a task."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        deltastream,
    )

    path = str(tmp_path / "varstream")
    dp.write_delta(_vdf(spark, 0, 4), path)
    with pytest.raises(Exception, match="variant.*STREAM|STREAM.*variant"):
        deltastream._latest_schema(path)


def test_variant_nested_stream_reader_refuses(spark, tmp_path):
    """A NESTED variant (struct field) must hit the stream reader's
    guard too (r12 fix: the guard previously scanned only top-level
    fields, so a nested variant passed it and died inside
    pyarrow-decoding tasks mid-stream)."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        deltastream,
    )

    path = str(tmp_path / "varnest")
    df = _vdf(spark, 0, 4).select(
        "doc_id", F.struct("lang", "props").alias("meta")
    )
    dp.write_delta(df, path)
    assert (
        dp.read_delta(spark, path)
        .select(F.variant_get("meta.props", "$.a", "long").alias("a"))
        .count()
    ) == 4
    with pytest.raises(Exception, match="variant.*STREAM|STREAM.*variant"):
        deltastream._latest_schema(path)


def test_variant_overwrite_upgrades_protocol(spark, tmp_path):
    """mode='overwrite' introducing a VARIANT column on an EXISTING
    non-variant table must append a MERGED protocol action (r12 fix:
    previously the schemaString gained the variant column while the
    protocol stayed at reader v1 / writer v2 with no variantType
    feature — spec-invalid for foreign readers)."""
    path = str(tmp_path / "varow")
    dp.write_delta(
        spark.range(5).select(F.col("id").alias("doc_id")), path
    )
    pre = dp._current_protocol(path)
    assert "variantType" not in set(pre.get("readerFeatures") or [])
    dp.write_delta(_vdf(spark, 0, 6), path, mode="overwrite")
    proto = dp._current_protocol(path)
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    # the merge preserves legacy-version-implied writer features
    assert "invariants" in proto["writerFeatures"]
    got = sorted(
        r["a"]
        for r in dp.read_delta(spark, path)
        .select(F.variant_get("props", "$.a", "long").alias("a"))
        .collect()
    )
    assert got == list(range(6))
    # appending to the now-variant table adds NO redundant protocol
    dp.write_delta(_vdf(spark, 6, 8), path, mode="append")
    ld = os.path.join(path, "_delta_log")
    last = sorted(f for f in os.listdir(ld) if f.endswith(".json"))[-1]
    with open(os.path.join(ld, last)) as fh:
        acts = [json.loads(ln) for ln in fh if ln.strip()]
    assert not any("protocol" in a for a in acts)


def test_id_mode_row_op_matrix(spark, tmp_path):
    """Full row-op matrix against a FOREIGN-crafted id-mode table
    (r12 — writes previously refused): merge-upsert, UPDATE, DV
    delete, cow delete, and compaction all land id-stamped
    physical-named files; every step reads identically through
    read_delta AND the format('deltaproto') DataSource (field-id
    resolution over the mixed foreign+engine file set)."""
    import glob

    from pyspark.sql.types import LongType, StructField, StructType

    path = str(tmp_path / "idops")
    os.makedirs(os.path.join(path, "_delta_log"))

    def land(stage_name, names, rows, dest):
        df = spark.createDataFrame(
            rows,
            StructType(
                [
                    StructField(
                        names[0], LongType(), True, {"parquet.field.id": 1}
                    ),
                    StructField(
                        names[1], LongType(), True, {"parquet.field.id": 2}
                    ),
                ]
            ),
        )
        stage = str(tmp_path / stage_name)
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        src = glob.glob(os.path.join(stage, "*.parquet"))[0]
        os.makedirs(
            os.path.join(path, os.path.dirname(dest)), exist_ok=True
        )
        import shutil as sh

        sh.copy(src, os.path.join(path, dest))
        return os.path.getsize(src)

    # two foreign files with DIFFERENT physical names, same field ids
    sz1 = land("s1", ["c_one", "c_two"], [(i, i * 10) for i in range(5)],
               "f1.parquet")
    sz2 = land("s2", ["r_one", "r_two"], [(i, i * 10) for i in range(5, 8)],
               "f2.parquet")

    def fld(name, fid, phys):
        return {
            "name": name,
            "type": "long",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": phys,
            },
        }

    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [fld("doc_id", 1, "c_one"), fld("v", 2, "c_two")],
        }
    )
    with open(
        os.path.join(path, "_delta_log", dp._LOG_FMT.format(0)), "w"
    ) as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["columnMapping"],
                        "writerFeatures": ["columnMapping"],
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "m",
                        "format": {"provider": "parquet"},
                        "schemaString": schema_string,
                        "partitionColumns": [],
                        "configuration": {
                            "delta.columnMapping.mode": "id",
                            "delta.columnMapping.maxColumnId": "2",
                        },
                    }
                }
            )
            + "\n"
        )
        for dest, sz in [("f1.parquet", sz1), ("f2.parquet", sz2)]:
            f.write(
                json.dumps(
                    {
                        "add": {
                            "path": dest,
                            "partitionValues": {},
                            "size": sz,
                            "modificationTime": 0,
                            "dataChange": True,
                        }
                    }
                )
                + "\n"
            )

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        deltastream as ds,
    )

    ds.register(spark)

    def both():
        a = sorted(
            tuple(r) for r in dp.read_delta(spark, path).collect()
        )
        b = sorted(
            tuple(r)
            for r in spark.read.format("deltaproto").load(path).collect()
        )
        assert a == b
        return a

    assert both() == [(i, i * 10) for i in range(8)]
    # upsert: update key 2, insert key 100
    ups = spark.createDataFrame(
        [(2, 9999), (100, 1)], "doc_id long, v long"
    )
    dp.merge_upsert_delta(spark, ups, path, "doc_id")
    vals = dict(both())
    assert vals[2] == 9999 and vals[100] == 1 and len(vals) == 9
    # UPDATE expression over logical names
    dp.update_where_delta(spark, path, {"v": "v + 1"}, "doc_id", 0, 1)
    vals = dict(both())
    assert vals[0] == 1 and vals[1] == 11
    # DV delete then cow delete
    dp.delete_where_delta(spark, path, "doc_id", 5, 5, strategy="dv")
    dp.delete_where_delta(spark, path, "doc_id", 6, 6)
    vals = dict(both())
    assert 5 not in vals and 6 not in vals and len(vals) == 7
    # compaction rewrites everything — still id-resolvable
    dp.compact_delta(spark, path, target_mb=1024)
    vals = dict(both())
    assert len(vals) == 7 and vals[2] == 9999
    # rewritten files carry the ids and the physicalName namespace
    import pyarrow.parquet as pq

    live = dp.read_delta_meta(spark, path, "files").select(
        "path"
    ).toPandas()["path"]
    for rel in live:
        sch = pq.ParquetFile(os.path.join(path, rel)).schema_arrow
        assert [fl.name for fl in sch] == ["c_one", "c_two"]
        assert [
            fl.metadata[b"PARQUET:field_id"] for fl in sch
        ] == [b"1", b"2"]


# --------------------------------------------------------------------------
# Log-lifecycle property sweep (checkpoint / multi-part / cleanup /
# restore interaction — the wrong-data class two r11 ADVICE bugs sat in)
# --------------------------------------------------------------------------


def _split_multipart(path: str) -> bool:
    """Replace the newest CLASSIC checkpoint with an equivalent
    2-part multi-part set (the %020d.checkpoint.%010d.%010d.parquet
    naming), updating the _last_checkpoint hint with `parts` the way
    real multi-part writers do.  Returns False when the newest
    checkpoint is not classic (v2 layout) — nothing to split."""
    import pyarrow.parquet as pq

    ck = dp._last_checkpoint(path)
    if ck is None:
        return False
    v = int(ck["version"])
    ld = os.path.join(path, "_delta_log")
    classic = os.path.join(ld, dp._CKPT_FMT.format(v))
    if not os.path.exists(classic):
        return False
    t = pq.read_table(classic)
    half = max(1, t.num_rows // 2)
    slices = [t.slice(0, half), t.slice(half)]
    for i, sl in enumerate(slices, start=1):
        pq.write_table(
            sl,
            os.path.join(
                ld, f"{v:020d}.checkpoint.{i:010d}.{len(slices):010d}.parquet"
            ),
        )
    os.unlink(classic)
    with open(os.path.join(ld, "_last_checkpoint"), "w") as f:
        json.dump({"version": v, "parts": len(slices)}, f)
    return True


def _drop_incomplete_multipart(path: str, at_version: int) -> bool:
    """Simulate an INTERRUPTED multi-part checkpoint writer at
    `at_version`: land part 1 of a claimed 2-part set (copied from any
    complete classic checkpoint — stale content, exactly what folding
    it would corrupt state with) and do NOT touch _last_checkpoint
    (the spec's writer ordering: parts first, hint last).  Readers
    must ignore the partial set entirely."""
    import glob as _glob
    import shutil as _sh

    ld = os.path.join(path, "_delta_log")
    donors = [
        f
        for f in _glob.glob(os.path.join(ld, "*.checkpoint.parquet"))
        if os.path.basename(f).split(".")[0].isdigit()
    ]
    if not donors:
        return False
    dest = os.path.join(
        ld, f"{at_version:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
    )
    if os.path.exists(dest):
        return False
    _sh.copy(donors[0], dest)
    return True


def test_delta_log_lifecycle_property(spark, tmp_path):
    """50 seeded random op sequences over one table each —
    (append | overwrite | checkpoint | v2-upgrade | multi-part split |
    interrupted multi-part | cleanup | restore) — then a full sweep:
    every version ever committed either reads back EXACTLY its
    recorded state or refuses loudly (ValueError/FileNotFoundError),
    and only versions below the newest checkpoint are allowed to
    refuse (log cleanup trades their time travel for space).  Wrong
    data is never acceptable; the newest version must always read.

    The sweep reads the LATEST version plus a seeded sample of three
    older ones per sequence (full-sweep×50 measured 17½ min of pure
    Spark job scheduling; the sample keeps per-version coverage high
    across 50 seeds at ~⅓ the wall).  SPARK_GRAFT_LIFECYCLE_SEQS
    overrides the sequence count."""
    import random

    n_seq = int(os.environ.get("SPARK_GRAFT_LIFECYCLE_SEQS", "50"))
    rng = random.Random(0xD17A12)
    for seq in range(n_seq):
        path = str(tmp_path / f"t{seq:02d}")
        expected: dict[int, frozenset] = {}
        dflt_at: dict[int, int | None] = {}  # val's default per version
        default_val: int | None = None
        cur: set = set()
        batch = 0

        def commit(append: bool):
            nonlocal cur, batch
            rows = [(batch, i) for i in range(rng.randint(1, 3))]
            batch += 1
            df = spark.createDataFrame(
                rows, "batch bigint, val bigint"
            ).coalesce(1)
            v = dp.write_delta(
                df, path, mode="append" if append else "overwrite"
            )
            cur = (cur | set(rows)) if append else set(rows)
            expected[v] = frozenset(cur)
            dflt_at[v] = default_val

        commit(append=False)  # the table always exists
        for _ in range(5):
            op = rng.choices(
                ["append", "overwrite", "ckpt", "v2", "mpart",
                 "mpart_broken", "cleanup", "restore", "default",
                 "append_dflt"],
                weights=[30, 10, 18, 5, 10, 7, 12, 8, 7, 10],
            )[0]
            if op in ("append", "overwrite"):
                commit(op == "append")
            elif op == "ckpt":
                dp.write_delta_checkpoint(spark, path)
            elif op == "v2":
                v = dp.upgrade_delta_to_v2_checkpoints(path)
                expected[v] = frozenset(cur)
            elif op == "mpart":
                _split_multipart(path)
            elif op == "mpart_broken":
                _drop_incomplete_multipart(
                    path, dp.delta_versions(path)[-1]
                )
            elif op == "cleanup":
                try:
                    dp.cleanup_delta_log(
                        path, retain_versions=rng.randint(0, 2)
                    )
                except ValueError:
                    pass  # no checkpoint yet — loud refusal is the contract
            elif op == "restore":
                v0 = rng.choice(sorted(expected))
                try:
                    v = dp.restore_delta(spark, path, v0)
                except (ValueError, FileNotFoundError):
                    continue  # target no longer replayable: loud is fine
                cur = set(expected[v0])
                expected[v] = frozenset(cur)
                # RESTORE re-commits the target's metaData — the
                # column default reverts with it (r13)
                default_val = dflt_at.get(v0)
                dflt_at[v] = default_val
            elif op == "default":
                # r13: SET DEFAULT is a metadata-only commit; future
                # val-omitting appends fill the new constant
                default_val = rng.randint(100, 999)
                v = dp.set_delta_column_default(
                    spark, path, "val", str(default_val)
                )
                expected[v] = frozenset(cur)
                dflt_at[v] = default_val
            elif op == "append_dflt":
                if default_val is None:
                    continue
                df = spark.createDataFrame(
                    [(batch,)], "batch bigint"
                ).coalesce(1)
                v = dp.write_delta(df, path)
                cur = cur | {(batch, default_val)}
                batch += 1
                expected[v] = frozenset(cur)
                dflt_at[v] = default_val
        ck_vs = dp._checkpoint_versions(path)
        newest_ck = max(ck_vs) if ck_vs else -1
        latest = max(expected)
        older = [v for v in expected if v != latest]
        sweep = {latest} | set(rng.sample(older, min(3, len(older))))
        for v in sorted(sweep):
            try:
                got = frozenset(
                    (r["batch"], r["val"])
                    for r in dp.read_delta(spark, path, version=v).collect()
                )
            except (ValueError, FileNotFoundError):
                assert v < newest_ck, (
                    f"seq {seq}: version {v} refused but no newer "
                    f"checkpoint justifies cleanup (newest ck {newest_ck})"
                )
                assert v != latest, f"seq {seq}: latest version {v} refused"
                continue
            assert got == expected[v], (
                f"seq {seq}: version {v} read wrong data: "
                f"{sorted(got)} != {sorted(expected[v])}"
            )


def test_complete_v2_checkpoint_next_to_interrupted_multipart(
    spark, tmp_path
):
    """A version can carry BOTH an interrupted multi-part set (writer
    died mid-parts) and a complete v2 checkpoint (another writer
    finished).  The v2 base must be found — previously the incomplete
    multi-part short-circuited discovery to None, and after log
    cleanup the un-based JSON tail would fold partial state."""
    path = str(tmp_path / "v2mix")
    df = spark.createDataFrame(
        [(0, i) for i in range(4)], "batch bigint, val bigint"
    ).coalesce(1)
    v0 = dp.write_delta(df, path)
    # classic checkpoint at v0 — the donor the stray parts copy from
    dp.write_delta_checkpoint(spark, path, version=v0)
    dp.upgrade_delta_to_v2_checkpoints(path)
    df2 = spark.createDataFrame(
        [(1, i) for i in range(2)], "batch bigint, val bigint"
    ).coalesce(1)
    v2 = dp.write_delta(df2, path, mode="append")
    assert _drop_incomplete_multipart(path, v2)
    # the protocol now carries v2Checkpoint → this writes the v2 layout
    dp.write_delta_checkpoint(spark, path, version=v2)
    found = dp._find_checkpoint_files(path, v2)
    assert found is not None and len(found) >= 1
    assert all(
        len(os.path.basename(f).split(".")) != 5 for f in found
    ), "stray multi-part parts must never be selected"
    # cleanup then read: the v2 base keeps every retained version exact
    dp.cleanup_delta_log(path, retain_versions=0)
    got = sorted(
        (r["batch"], r["val"])
        for r in dp.read_delta(spark, path).collect()
    )
    assert got == [(0, 0), (0, 1), (0, 2), (0, 3), (1, 0), (1, 1)]


# --------------------------------------------------------------------------
# Optimistic concurrency: read-modify-write conflict detection
# --------------------------------------------------------------------------


def _rmw_lines(live: dict, rel: str) -> list[str]:
    """A minimal crafted RMW commit (remove + re-add of one file) —
    what a second writer's DELETE/UPDATE would emit for `rel`."""
    add = dict(live[rel])
    add["dataChange"] = True
    return [
        json.dumps({"commitInfo": {"timestamp": 0, "operation": "DELETE"}}),
        json.dumps({"remove": {"path": rel, "dataChange": True}}),
        json.dumps({"add": add}),
    ]


def test_concurrent_rmw_conflict_detected(spark, tmp_path):
    """Two writers plan row-level ops against the SAME snapshot; the
    slower one must abort with ConcurrentDeltaCommit, never silently
    supersede the faster one's deletion vector (the lost-update race
    blind retry would hide).  Disjoint-file RMWs and blind appends
    commit fine; an intervening metaData change also aborts."""
    path = str(tmp_path / "occ")
    df1 = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "doc_id long, v long"
    ).coalesce(1)
    df2 = spark.createDataFrame(
        [(i, i * 10) for i in range(10, 20)], "doc_id long, v long"
    ).coalesce(1)
    dp.write_delta(df1, path)
    dp.write_delta(df2, path, mode="append")
    # first DV delete carries the protocol upgrade — do it BEFORE the
    # raced snapshot (a protocol change rightly aborts EVERY concurrent
    # txn, which would mask the file-overlap distinction below)
    dp.delete_where_delta(spark, path, "doc_id", 0, 0, strategy="dv")
    meta, live, v0 = dp._fold_delta_state(spark, path, None)
    # file -> id range via stats (two single-file commits)
    by_min = {
        json.loads(a["stats"])["minValues"]["doc_id"]: rel
        for rel, a in live.items()
    }
    f_low, f_high = by_min[0], by_min[10]
    # writer A lands first: DV delete inside the LOW file
    dp.delete_where_delta(spark, path, "doc_id", 3, 5, strategy="dv")
    # writer B computed against v0 and touches the SAME file: abort
    with pytest.raises(dp.ConcurrentDeltaCommit, match="rewrote"):
        dp._claim_delta_version(
            path, _rmw_lines(live, f_low), read_version=v0
        )
    assert dp.delta_versions(path)[-1] == v0 + 1  # nothing committed
    # writer C computed against v0 but touches the OTHER file: fine
    v_c = dp._claim_delta_version(
        path, _rmw_lines(live, f_high), read_version=v0
    )
    assert v_c == v0 + 2
    got = sorted(
        r["doc_id"] for r in dp.read_delta(spark, path).collect()
    )
    assert got == [i for i in range(1, 20) if not 3 <= i <= 5]
    # blind appends (no read_version) never conflict
    df3 = spark.createDataFrame(
        [(100, 0)], "doc_id long, v long"
    ).coalesce(1)
    dp.write_delta(df3, path, mode="append")
    # a metaData change between read and commit aborts the RMW too
    meta2, live2, v1 = dp._fold_delta_state(spark, path, None)
    dp.add_delta_column(spark, path, "note", "string")
    with pytest.raises(dp.ConcurrentDeltaCommit, match="protocol/metadata"):
        dp._claim_delta_version(
            path, _rmw_lines(live2, f_high), read_version=v1
        )


def test_concurrent_overwrite_vs_rmw(spark, tmp_path):
    """An overwrite planned against a snapshot aborts when a racing
    row-level op already rewrote one of the files it removes."""
    path = str(tmp_path / "occow")
    df = spark.createDataFrame(
        [(i, i) for i in range(8)], "doc_id long, v long"
    ).coalesce(1)
    dp.write_delta(df, path)
    meta, live, v0 = dp._fold_delta_state(spark, path, None)
    dp.delete_where_delta(spark, path, "doc_id", 1, 2, strategy="dv")
    # overwrite whose remove set was computed at v0
    now = 0
    lines = [
        json.dumps({"commitInfo": {"timestamp": now, "operation": "WRITE"}})
    ]
    for rel in sorted(live):
        lines.append(
            json.dumps({"remove": {"path": rel, "dataChange": True}})
        )
    with pytest.raises(dp.ConcurrentDeltaCommit):
        dp._claim_delta_version(path, lines, read_version=v0)


def test_concurrent_append_vs_rmw(spark, tmp_path, monkeypatch):
    """delta-spark's ConcurrentAppendException semantics: an append
    that lands predicate-matching rows between an RMW's snapshot read
    and its claim makes the RMW refuse (its effect would reflect the
    pre-append snapshot and the appended rows would escape the
    predicate).  Partition-disjoint appends still commit, and
    dataChange=false maintenance adds never read-conflict."""
    path = str(tmp_path / "occapp")
    df = spark.createDataFrame(
        [(i, i % 2, i * 10) for i in range(20)],
        "doc_id long, p int, v long",
    ).coalesce(1)
    dp.write_delta(df, path, partition_by=["p"])

    orig = dp._claim_delta_version
    state: dict = {}

    def racer(path_, lines, read_version=None, read_scope=None):
        # between the RMW's snapshot read and its claim, land an
        # append carrying rows the RMW's predicate matches
        if read_version is not None and not state.get("raced"):
            state["raced"] = True
            extra = spark.createDataFrame(
                [(100, state["race_p"], 0)], "doc_id long, p int, v long"
            ).coalesce(1)
            dp.write_delta(extra, path_, mode="append", partition_by=["p"])
        state["scope"] = read_scope
        return orig(
            path_, lines, read_version=read_version, read_scope=read_scope
        )

    monkeypatch.setattr(dp, "_claim_delta_version", racer)

    # racing append into the SAME partition the DELETE reads: refuse
    state["race_p"] = 0
    with pytest.raises(dp.ConcurrentDeltaCommit, match="appended"):
        dp.delete_where_delta(spark, path, "p", 0, 0)
    # the delete committed NOTHING: every original row + the racer live
    assert dp.read_delta(spark, path).count() == 21
    # the real delete plumbed its prune params through as the scope
    assert state["scope"]["col"] == "p"
    assert (state["scope"]["lo"], state["scope"]["hi"]) == (0, 0)

    # racing append into the OTHER partition: the DELETE commits
    state["raced"] = False
    state["race_p"] = 0
    dp.delete_where_delta(spark, path, "p", 1, 1)
    got = sorted(
        r["doc_id"] for r in dp.read_delta(spark, path).collect()
    )
    assert got == sorted(
        [i for i in range(20) if i % 2 == 0] + [100, 100]
    )

    monkeypatch.setattr(dp, "_claim_delta_version", orig)

    # an overwrite planned before an append refuses too ("table" scope)
    _meta, live, v0 = dp._fold_delta_state(spark, path, None)
    extra = spark.createDataFrame(
        [(200, 0, 0)], "doc_id long, p int, v long"
    ).coalesce(1)
    dp.write_delta(extra, path, mode="append", partition_by=["p"])
    lines = [
        json.dumps({"commitInfo": {"timestamp": 0, "operation": "WRITE"}})
    ] + [
        json.dumps({"remove": {"path": rel, "dataChange": True}})
        for rel in sorted(live)
    ]
    with pytest.raises(dp.ConcurrentDeltaCommit, match="appended"):
        dp._claim_delta_version(
            path, lines, read_version=v0, read_scope="table"
        )

    # dataChange=false adds (compaction shape) never read-conflict
    _meta, live1, v1 = dp._fold_delta_state(spark, path, None)
    dp._claim_delta_version(
        path,
        [
            json.dumps(
                {"commitInfo": {"timestamp": 0, "operation": "OPTIMIZE"}}
            ),
            json.dumps(
                {
                    "add": {
                        "path": "p=0/part-nodata.parquet",
                        "partitionValues": {"p": "0"},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": False,
                    }
                }
            ),
        ],
    )
    v2 = dp._claim_delta_version(
        path,
        [
            json.dumps(
                {"commitInfo": {"timestamp": 0, "operation": "DELETE"}}
            )
        ],
        read_version=v1,
        read_scope="table",
    )
    assert v2 == v1 + 2


def test_concurrent_property_updates_conflict(spark, tmp_path, monkeypatch):
    """set_delta_properties is a read-modify-write of the configuration
    map: a racing property update between its read and its claim must
    conflict (metaData change), never be silently overwritten."""
    path = str(tmp_path / "occprops")
    df = spark.createDataFrame([(1, 1)], "doc_id long, v long").coalesce(1)
    dp.write_delta(df, path)

    orig = dp._claim_delta_version
    state = {"raced": False}

    def racer(path_, lines, read_version=None, read_scope=None):
        if not state["raced"]:
            state["raced"] = True
            dp.set_delta_properties(
                spark, path_, {"custom.other": "yes"}
            )
        return orig(
            path_, lines, read_version=read_version, read_scope=read_scope
        )

    monkeypatch.setattr(dp, "_claim_delta_version", racer)
    with pytest.raises(dp.ConcurrentDeltaCommit, match="protocol/metadata"):
        dp.set_delta_properties(spark, path, {"custom.mine": "1"})
    monkeypatch.setattr(dp, "_claim_delta_version", orig)
    conf = dp._current_config(path)
    assert conf.get("custom.other") == "yes"  # the racer won
    assert "custom.mine" not in conf  # the loser lost loudly, not silently
    # re-applied after a fresh read it lands
    dp.set_delta_properties(spark, path, {"custom.mine": "1"})
    assert dp._current_config(path).get("custom.mine") == "1"


def test_row_tracking_properties_guarded(spark, tmp_path):
    """delta.enableRowTracking / delta.rowTracking.* are
    protocol-governed: setting them through SET TBLPROPERTIES would
    flip _rt_enabled_for_commit without the writer features or
    materialized column names — refuse toward enable_row_tracking."""
    path = str(tmp_path / "rtguard")
    df = spark.createDataFrame([(1, 1)], "doc_id long, v long").coalesce(1)
    dp.write_delta(df, path)
    for key in (
        "delta.enableRowTracking",
        "delta.rowTracking.materializedRowIdColumnName",
    ):
        with pytest.raises(ValueError, match="protocol-governed"):
            dp.set_delta_properties(spark, path, {key: "true"})


def test_delta_version_checksums(spark, tmp_path):
    """`<version>.crc` version-checksum files (delta-spark's
    VersionChecksum): opt-in per-commit emission via the
    delta.writeChecksumFile property, read-side verification whenever
    one is present — a corrupted log refuses loudly instead of serving
    wrong rows — and log cleanup removes a deleted commit's crc."""
    path = str(tmp_path / "crc")
    mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
        [(i, i * 2) for i in range(lo, hi)], "doc_id long, v long"
    ).coalesce(1)
    dp.write_delta(mk(0, 5), path)
    dp.set_delta_properties(
        spark, path, {"delta.writeChecksumFile": "true"}
    )
    v2 = dp.write_delta(mk(5, 8), path, mode="append")
    v3 = dp.write_delta(mk(8, 12), path, mode="append")
    ld = os.path.join(path, "_delta_log")
    crc2 = os.path.join(ld, f"{v2:020d}.crc")
    crc3 = os.path.join(ld, f"{v3:020d}.crc")
    assert os.path.exists(crc2) and os.path.exists(crc3)
    body = json.load(open(crc3))
    assert body["numFiles"] == 3
    assert body["tableSizeBytes"] > 0
    assert body["metadata"]["id"] and body["protocol"]["minReaderVersion"]
    assert dp.read_delta(spark, path).count() == 12
    # manual emission works for tables without the property
    p2 = str(tmp_path / "crc2")
    dp.write_delta(mk(0, 4), p2)
    dest = dp.write_delta_checksum(spark, p2)
    assert os.path.exists(dest)
    assert dp.read_delta(spark, p2).count() == 4  # verifies green
    # corrupted LOG under an intact crc: drop the newest commit's add
    # action and the reader must refuse, not serve a partial table
    target = os.path.join(ld, f"{v3:020d}.json")
    lines = [
        ln
        for ln in open(target).read().splitlines()
        if ln.strip() and "add" not in json.loads(ln)
    ]
    with open(target, "w") as f:
        f.write("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="checksum mismatch"):
        dp.read_delta(spark, path).count()
    # restore by removing the stale crc: absent crc verifies nothing
    os.unlink(crc3)
    assert dp.read_delta(spark, path).count() == 8
    # a tampered crc against a HEALTHY log also refuses
    body2 = json.load(open(crc2))
    body2["tableSizeBytes"] += 1
    json.dump(body2, open(crc2, "w"))
    with pytest.raises(ValueError, match="checksum mismatch"):
        dp.read_delta(spark, path, version=v2).count()
    os.unlink(crc2)
    # cleanup removes crc sidecars with their commits
    p3 = str(tmp_path / "crc3")
    dp.write_delta(mk(0, 3), p3)
    dp.set_delta_properties(
        spark, p3, {"delta.writeChecksumFile": "true"}
    )
    v = dp.write_delta(mk(3, 6), p3, mode="append")
    dp.write_delta(mk(6, 9), p3, mode="append")
    dp.write_delta_checkpoint(spark, p3)
    dp.cleanup_delta_log(p3, retain_versions=0)
    ld3 = os.path.join(p3, "_delta_log")
    assert not os.path.exists(os.path.join(ld3, f"{v:020d}.json"))
    assert not os.path.exists(os.path.join(ld3, f"{v:020d}.crc"))
    assert dp.read_delta(spark, p3).count() == 9


def test_drop_delta_column(spark, tmp_path):
    """Metadata-only DROP COLUMN: first use upgrades to column mapping
    (old files keep resolving), the dropped column disappears from
    reads while its bytes stay on disk, time travel below the drop
    still serves it, writes against the narrowed schema work, and a
    re-ADDED same-name column gets a FRESH physical name so the old
    bytes never resurrect.  Partition / generated / constraint /
    last-column drops refuse."""
    path = str(tmp_path / "dropcol")
    df = spark.createDataFrame(
        [(i, f"t{i}", i * 10) for i in range(8)],
        "doc_id long, tag string, v long",
    ).coalesce(1)
    dp.write_delta(df, path)
    v_drop = dp.drop_delta_column(spark, path, "tag")
    back = dp.read_delta(spark, path)
    assert back.columns == ["doc_id", "v"]
    assert back.count() == 8
    # mapping enabled, physical bytes still on disk
    meta, live, _ = dp._fold_delta_state(spark, path, None)
    conf = meta.get("configuration") or {}
    assert conf.get("delta.columnMapping.mode") == "name"
    import pyarrow.parquet as pq

    rel = next(iter(live))
    assert "tag" in {
        c.name for c in pq.ParquetFile(os.path.join(path, rel)).schema_arrow
    }
    # time travel below the drop still reads the column
    old = dp.read_delta(spark, path, version=v_drop - 1)
    assert "tag" in old.columns
    assert sorted(r["tag"] for r in old.collect()) == [
        f"t{i}" for i in range(8)
    ]
    # writes against the narrowed schema land fine
    df2 = spark.createDataFrame(
        [(100, 1000)], "doc_id long, v long"
    ).coalesce(1)
    dp.write_delta(df2, path, mode="append")
    assert dp.read_delta(spark, path).count() == 9
    # re-add the same logical name: fresh physical name, all nulls
    dp.add_delta_column(spark, path, "tag", "string")
    back2 = dp.read_delta(spark, path)
    assert back2.filter(F.col("tag").isNotNull()).count() == 0
    meta2, _l2, _ = dp._fold_delta_state(spark, path, None)
    f_tag = next(
        f
        for f in json.loads(meta2["schemaString"])["fields"]
        if f["name"] == "tag"
    )
    assert f_tag["metadata"]["delta.columnMapping.physicalName"].startswith(
        "col-"
    )
    # refusals
    with pytest.raises(ValueError, match="no column"):
        dp.drop_delta_column(spark, path, "ghost")
    p2 = str(tmp_path / "dropref")
    dp.write_delta(
        spark.createDataFrame(
            [(1, "a", 2)], "doc_id long, lang string, v long"
        ).coalesce(1),
        p2,
        partition_by=["lang"],
        generated={"v": "doc_id * 2"},
    )
    with pytest.raises(ValueError, match="partition column"):
        dp.drop_delta_column(spark, p2, "lang")
    with pytest.raises(ValueError, match="generation expression"):
        dp.drop_delta_column(spark, p2, "doc_id")
    p3 = str(tmp_path / "dropcon")
    dp.write_delta(
        spark.createDataFrame([(1, 2)], "a long, b long").coalesce(1), p3
    )
    dp.add_delta_constraint(spark, p3, "b_pos", "b > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        dp.drop_delta_column(spark, p3, "b")
    dp.drop_delta_column(spark, p3, "a")
    with pytest.raises(ValueError, match="only column"):
        dp.drop_delta_column(spark, p3, "b")


def test_auto_checkpoint_interval(spark, tmp_path):
    """`delta.checkpointInterval` (opt-in table property): commits at
    multiples of the interval write a checkpoint automatically —
    across write/DELETE/MERGE paths — and reads keep folding exactly;
    tables without the property never auto-checkpoint."""
    path = str(tmp_path / "autock")
    df = spark.createDataFrame(
        [(i, i) for i in range(6)], "doc_id long, v long"
    ).coalesce(1)
    dp.write_delta(df, path)  # v0
    # opt in via the property setter (v1)
    dp.set_delta_properties(
        spark, path, {"delta.checkpointInterval": "2"}
    )
    assert dp._checkpoint_versions(path) == []
    df2 = spark.createDataFrame([(10, 10)], "doc_id long, v long").coalesce(1)
    v = dp.write_delta(df2, path, mode="append")  # v2 -> checkpoint
    assert v == 2
    assert dp._checkpoint_versions(path) == [2]
    dp.write_delta(df2, path, mode="append")  # v3: no checkpoint
    assert dp._checkpoint_versions(path) == [2]
    v4 = dp.delete_where_delta(spark, path, "doc_id", 0, 0, strategy="dv")
    assert v4 == 4
    assert dp._checkpoint_versions(path) == [2, 4]
    # folding through the auto-checkpoints stays exact
    got = sorted(r["doc_id"] for r in dp.read_delta(spark, path).collect())
    assert got == [1, 2, 3, 4, 5, 10, 10]
    # no property -> never auto-checkpoints
    p2 = str(tmp_path / "noauto")
    for k in range(4):
        dp.write_delta(df2, p2, mode="append")
    assert dp._checkpoint_versions(p2) == []


def test_set_delta_properties(spark, tmp_path):
    """SET/UNSET TBLPROPERTIES round-trip; protocol-governed keys
    refuse toward their dedicated helpers; the appendOnly guard set
    through it bites immediately."""
    path = str(tmp_path / "props")
    df = spark.createDataFrame([(1, 2)], "a long, b long").coalesce(1)
    dp.write_delta(df, path)
    dp.set_delta_properties(
        spark, path, {"custom.owner": "team-x", "delta.appendOnly": "true"}
    )
    meta, _l, _ = dp._fold_delta_state(spark, path, None)
    conf = meta["configuration"]
    assert conf["custom.owner"] == "team-x"
    dp.write_delta(df, path, mode="append")  # appends stay legal
    with pytest.raises(ValueError, match="appendOnly"):
        dp.delete_where_delta(spark, path, "a", 1, 1)
    dp.set_delta_properties(spark, path, {"delta.appendOnly": None})
    dp.delete_where_delta(spark, path, "a", 99, 99)  # unset: legal again
    meta2, _l2, _ = dp._fold_delta_state(spark, path, None)
    assert "delta.appendOnly" not in meta2["configuration"]
    assert meta2["configuration"]["custom.owner"] == "team-x"
    with pytest.raises(ValueError, match="protocol-governed"):
        dp.set_delta_properties(
            spark, path, {"delta.columnMapping.mode": "name"}
        )
