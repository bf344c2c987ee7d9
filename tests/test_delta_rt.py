"""Delta ROW TRACKING (sources/deltaproto.py): the protocol's
`rowTracking` + `domainMetadata` writer features — durable `_row_id` /
`_row_commit_version` for every row.

What the spec prescribes, pinned here: fresh rows take `baseRowId` +
position and `defaultRowCommitVersion` (anchors assigned at claim
time from the `delta.rowTracking` high-water mark domain, so racing
writers can never hand out overlapping ranges); the DV delete shape
re-adds the SAME file and must carry its anchors; rewrites (cow
DELETE, UPDATE, MERGE, OPTIMIZE, ZORDER) MATERIALIZE ids into hidden
file columns named by the table configuration, which win over
inheritance on read; updated rows keep their id but take the new
commit version; the high-water mark and anchors survive checkpoints
and log cleanup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    deltaproto as dp,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") * 10).cast("bigint").alias("v"),
    )


def _rt(spark, path):
    return {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in dp.read_delta(spark, path, with_row_tracking=True)
        .select("k", "_row_id", "_row_commit_version")
        .collect()
    }


def _mk(spark, tmp_path, n=40, parts=2):
    path = os.path.join(tmp_path, "t")
    dp.write_delta(_df(spark, 0, n).repartition(parts), path)
    dp.enable_delta_row_tracking(spark, path)
    return path


def test_enable_backfills_and_appends_extend(spark, tmp_path):
    path = _mk(spark, tmp_path)
    dp.write_delta(_df(spark, 40, 60).repartition(1), path)
    got = _rt(spark, path)
    assert sorted(rid for rid, _cv in got.values()) == list(range(60))
    # backfilled files keep their ORIGINAL commit version (0); the
    # append takes its own commit's
    assert {cv for k, (_r, cv) in got.items() if k < 40} == {0}
    assert {cv for k, (_r, cv) in got.items() if k >= 40} == {2}
    assert {got[k][0] for k in range(40, 60)} == set(range(40, 60))
    assert dp._rt_high_water_mark(path) == 59


def test_dv_delete_preserves_anchors(spark, tmp_path):
    path = _mk(spark, tmp_path)
    before = _rt(spark, path)
    dp.delete_where_delta(spark, path, "k", 10, 19, strategy="dv")
    after = _rt(spark, path)
    assert set(after) == set(before) - set(range(10, 20))
    assert all(after[k] == before[k] for k in after)
    # same physical file re-added: no new row ids were consumed
    assert dp._rt_high_water_mark(path) == 39


def test_cow_delete_materializes(spark, tmp_path):
    path = _mk(spark, tmp_path)
    before = _rt(spark, path)
    dp.delete_where_delta(spark, path, "k", 10, 19, strategy="rewrite")
    after = _rt(spark, path)
    assert set(after) == set(before) - set(range(10, 20))
    assert all(after[k] == before[k] for k in after)


def test_update_keeps_id_bumps_commit_version(spark, tmp_path):
    path = _mk(spark, tmp_path)
    before = _rt(spark, path)
    v = dp.update_where_delta(spark, path, {"v": "v + 1"}, "k", 5, 9)
    after = _rt(spark, path)
    assert set(after) == set(before)
    # every row keeps its id
    assert all(after[k][0] == before[k][0] for k in after)
    # updated rows take the UPDATE commit's version; others keep theirs
    assert {after[k][1] for k in range(5, 10)} == {v}
    assert all(
        after[k][1] == before[k][1] for k in after if not 5 <= k <= 9
    )


def test_compact_and_zorder_materialize(spark, tmp_path):
    path = _mk(spark, tmp_path, n=60, parts=4)
    dp.delete_where_delta(spark, path, "k", 3, 7, strategy="dv")
    before = _rt(spark, path)
    dp.compact_delta(spark, path, target_mb=1024)
    assert _rt(spark, path) == before
    dp.optimize_zorder_delta(spark, path, "k", "v", n_files=3)
    assert _rt(spark, path) == before


def test_merge_keeps_matched_ids_fresh_inserted(spark, tmp_path):
    path = _mk(spark, tmp_path)
    before = _rt(spark, path)
    upd = spark.createDataFrame(
        [(5, "0", 999), (100, "0", 1000), (101, "1", 1010)],
        "k bigint, g string, v bigint",
    )
    v = dp.merge_upsert_delta(spark, upd, path, "k")
    after = _rt(spark, path)
    assert set(after) == set(before) | {100, 101}
    # matched row keeps its id, takes the merge's commit version
    assert after[5][0] == before[5][0] and after[5][1] == v
    # untouched rows keep both
    carried = [k for k in before if k != 5]
    assert all(after[k] == before[k] for k in carried)
    # inserted rows get FRESH ids above the old mark, at the merge version
    assert {after[k][1] for k in (100, 101)} == {v}
    assert min(after[k][0] for k in (100, 101)) > max(
        b[0] for b in before.values()
    )


def test_restore_and_clone_carry_anchors(spark, tmp_path):
    path = _mk(spark, tmp_path)
    before = _rt(spark, path)
    v0 = dp.delta_versions(path)[-1]
    dp.delete_where_delta(spark, path, "k", 0, 4, strategy="dv")
    dp.restore_delta(spark, path, v0)
    assert _rt(spark, path) == before
    dst = os.path.join(tmp_path, "c")
    dp.clone_delta(spark, path, dst)
    assert _rt(spark, dst) == before


def test_hwm_survives_checkpoint_and_log_cleanup(spark, tmp_path):
    path = _mk(spark, tmp_path)
    before = _rt(spark, path)
    dp.write_delta_checkpoint(spark, path)
    dp.cleanup_delta_log(path)
    assert dp._rt_high_water_mark(path) == 39
    dp.write_delta(_df(spark, 40, 50).repartition(1), path)
    after = _rt(spark, path)
    assert all(after[k] == before[k] for k in before)
    assert sorted(after[k][0] for k in range(40, 50)) == list(
        range(40, 50)
    )


def test_v2_checkpoint_carries_domain_and_anchors(spark, tmp_path):
    path = _mk(spark, tmp_path)
    dp.upgrade_delta_to_v2_checkpoints(path)
    before = _rt(spark, path)
    dp.write_delta_checkpoint(spark, path)
    dp.cleanup_delta_log(path)
    assert dp._rt_high_water_mark(path) == 39
    assert _rt(spark, path) == before


def test_classic_checkpoint_preserves_configuration(spark, tmp_path):
    """Regression: classic checkpoints used to drop
    metaData.configuration — after log cleanup, CHECK constraints /
    row tracking / column mapping would silently vanish."""
    path = _mk(spark, tmp_path)
    dp.write_delta_checkpoint(spark, path)
    dp.cleanup_delta_log(path)
    meta, _live, _v = dp._fold_delta_state(spark, path, None)
    cfg = meta.get("configuration") or {}
    assert cfg.get("delta.enableRowTracking") == "true"
    assert dp._rt_materialized_cols(meta) is not None


def test_row_tracking_refuses_when_disabled(spark, tmp_path):
    path = os.path.join(tmp_path, "plain")
    dp.write_delta(_df(spark, 0, 5), path)
    with pytest.raises(ValueError, match="row tracking"):
        dp.read_delta(spark, path, with_row_tracking=True).collect()


def test_reads_foreign_row_tracked_table(spark, tmp_path):
    """A row-tracked log CRAFTED the way delta-spark lays it out:
    baseRowId/defaultRowCommitVersion on the add actions, the
    high-water mark in a delta.rowTracking domainMetadata action, and
    one file carrying MATERIALIZED id columns under configured hidden
    names — our reader must resolve _row_id/_row_commit_version with
    the materialized columns winning over the anchors."""
    import json as _json

    path = str(tmp_path / "foreign")
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"k": [0, 1, 2]}), os.path.join(path, "a.parquet")
    )
    # rewritten file: rows 3,4 carry their ORIGINAL ids materialized
    pq.write_table(
        pa.table(
            {
                "k": [3, 4],
                "ridcol": pa.array([77, 78], pa.int64()),
                "rcvcol": pa.array([0, 0], pa.int64()),
            }
        ),
        os.path.join(path, "b.parquet"),
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}}
        ],
    }
    lines = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["rowTracking", "domainMetadata"]}},
        {"metaData": {
            "id": "f",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": [],
            "configuration": {
                "delta.enableRowTracking": "true",
                "delta.rowTracking.materializedRowIdColumnName": "ridcol",
                "delta.rowTracking.materializedRowCommitVersionColumnName":
                    "rcvcol",
            },
            "createdTime": 1,
        }},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True,
                 "stats": _json.dumps({"numRecords": 3}),
                 "baseRowId": 10, "defaultRowCommitVersion": 0}},
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True,
                 "stats": _json.dumps({"numRecords": 2}),
                 "baseRowId": 100, "defaultRowCommitVersion": 1}},
        {"domainMetadata": {"domain": "delta.rowTracking",
                            "configuration": _json.dumps(
                                {"rowIdHighWaterMark": 101}),
                            "removed": False}},
    ]
    with open(os.path.join(log, dp._LOG_FMT.format(0)), "w") as f:
        f.write("\n".join(_json.dumps(a) for a in lines) + "\n")
    got = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in dp.read_delta(spark, path, with_row_tracking=True)
        .collect()
    }
    # a.parquet: inherited anchors (10+pos, cv 0); b.parquet: the
    # MATERIALIZED columns win over baseRowId=100
    assert got == {
        0: (10, 0), 1: (11, 0), 2: (12, 0),
        3: (77, 0), 4: (78, 0),
    }
    assert dp._rt_high_water_mark(path) == 101
    # the next append allocates ABOVE the foreign high-water mark
    dp.write_delta(
        spark.range(5, 7).select(F.col("id").cast("bigint").alias("k")),
        path,
    )
    got2 = {
        r["k"]: r["_row_id"]
        for r in dp.read_delta(spark, path, with_row_tracking=True)
        .collect()
    }
    assert sorted(got2[k] for k in (5, 6)) == [102, 103]


def test_datasource_with_row_tracking_option(spark, tmp_path):
    """format('deltaproto').option('withRowTracking', 'true'):
    the pure-python batch reader resolves _row_id/_row_commit_version
    by the same rule as the native reader — anchors for fresh files,
    materialized hidden columns for rewritten ones."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        deltastream,
    )

    path = os.path.join(tmp_path, "t")
    dp.write_delta(_df(spark, 0, 20).repartition(2), path)
    dp.enable_delta_row_tracking(spark, path)
    before = _rt(spark, path)
    # a rewrite materializes ids; the DataSource must read those too
    dp.update_where_delta(spark, path, {"v": "v + 1"}, "k", 3, 5)
    deltastream.register(spark)
    got = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in spark.read.format("deltaproto")
        .option("withRowTracking", "true")
        .load(path)
        .collect()
    }
    native = _rt(spark, path)
    assert got == native
    assert all(got[k][0] == before[k][0] for k in got)
    # refusals: option on a plain table; option combined with CDF
    plain = os.path.join(tmp_path, "plain")
    dp.write_delta(_df(spark, 0, 3), plain)
    with pytest.raises(Exception, match="row tracking"):
        spark.read.format("deltaproto").option(
            "withRowTracking", "true"
        ).load(plain).collect()


def test_stream_with_row_tracking_ids(spark, tmp_path):
    """Streaming a row-tracked table delivers each appended row WITH
    its durable _row_id — the join key an incremental downstream
    pipeline needs."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        deltastream,
    )

    path = os.path.join(tmp_path, "t")
    dp.write_delta(_df(spark, 0, 10).repartition(1), path)
    dp.enable_delta_row_tracking(spark, path)
    dp.write_delta(_df(spark, 10, 15).repartition(1), path)
    deltastream.register(spark)
    out = os.path.join(tmp_path, "out")
    ck = os.path.join(tmp_path, "ck")
    (
        spark.readStream.format("deltaproto")
        .option("withRowTracking", "true")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {
        r["k"]: r["_row_id"] for r in spark.read.parquet(out).collect()
    }
    assert got == {k: v[0] for k, v in _rt(spark, path).items()}
