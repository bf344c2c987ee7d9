"""format("deltaproto") DataSource (sources/deltastream.py): the real
Delta log as a batch source and a streaming offset log, with the
readChangeFeed option mirroring `read_changes_delta` per micro-batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    deltaproto as dp,
    deltastream,
)


def _df(spark, lo, hi, tag=0):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") * 10 + tag).cast("bigint").alias("v"),
    )


def _rows(df):
    return sorted(
        (r["doc_id"], r["lang"], r["v"])
        for r in df.select("doc_id", "lang", "v").collect()
    )


def test_batch_datasource_matches_read_delta(spark, tmp_path):
    """The Python DataSource batch read (one task per add-action, DV
    applied, partition columns reconstructed) returns exactly the JVM
    snapshot read's rows — on a partitioned table carrying a DV."""
    deltastream.register(spark)
    path = str(tmp_path / "delta")
    dp.write_delta(
        _df(spark, 0, 40).repartitionByRange(4, "doc_id"),
        path,
        partition_by=["lang"],
    )
    dp.delete_where_delta(spark, path, "doc_id", 5, 14, strategy="dv")
    got = spark.read.format("deltaproto").load(path)
    assert dict(got.dtypes)["lang"] == "string"
    assert _rows(got) == _rows(dp.read_delta(spark, path))
    assert got.count() == 30


def test_stream_appends_skip_optimize_break_on_overwrite(spark, tmp_path):
    """The plain stream delivers each append's rows exactly once,
    skips dataChange:false OPTIMIZE commits, and fails loudly on a
    data-changing remove (overwrite) — delta-spark's own rule."""
    deltastream.register(spark)
    path = str(tmp_path / "delta")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    dp.write_delta(_df(spark, 0, 40), path)

    def drain():
        q = (
            spark.readStream.format("deltaproto")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 40
    dp.compact_delta(spark, path)  # dataChange: false — must not break
    dp.write_delta(_df(spark, 40, 55), path)
    drain()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(55))  # rewrites never re-sent
    dp.write_delta(_df(spark, 100, 105), path, mode="overwrite")
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="remove"):
        q = (
            spark.readStream.format("deltaproto")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)


def test_stream_change_feed_option(spark, tmp_path):
    """readChangeFeed=true streams the CDF: inserts for appends, the
    committed `_change_data` pre-images for DELETE commits (both
    rewrite and DV strategies), nothing for compaction — exactly-once
    across drains with a persistent checkpoint."""
    deltastream.register(spark)
    path = str(tmp_path / "delta")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    dp.write_delta(
        _df(spark, 0, 60).repartitionByRange(3, "doc_id"),
        path,
        partition_by=["lang"],
    )

    def drain():
        q = (
            spark.readStream.format("deltaproto")
            .option("readChangeFeed", "true")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    first = spark.read.parquet(out)
    assert first.count() == 60
    assert {r["_change_type"] for r in first.collect()} == {"insert"}
    dp.delete_where_delta(spark, path, "doc_id", 10, 19)  # rewrite + cdc
    dp.delete_where_delta(spark, path, "doc_id", 40, 44, strategy="dv")
    dp.compact_delta(spark, path)
    drain()
    feed = spark.read.parquet(out)
    deletes = feed.filter(F.col("_change_type") == "delete")
    assert sorted(r["doc_id"] for r in deletes.collect()) == list(
        range(10, 20)
    ) + list(range(40, 45))
    # partition column reconstructed on every change row
    assert deletes.filter(F.col("lang").isNull()).count() == 0
    assert feed.filter(F.col("_change_type") == "insert").count() == 60
    # batch CDF and stream CDF agree on the same window
    batch = dp.read_changes_delta(spark, path, 0)
    assert batch.filter("_change_type = 'delete'").count() == 15


def test_stream_sink_exactly_once_txn(spark, tmp_path):
    """format('deltaproto') streaming sink: each micro-batch commits
    once with the spec's `txn` action (appId + batchId); a replayed
    batch commits nothing; the resulting table is a plain Delta table
    with stats-bearing adds readable by read_delta; txn state survives
    a parquet checkpoint."""
    deltastream.register(spark)
    src = str(tmp_path / "src")
    path = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")
    _df(spark, 0, 25).write.mode("overwrite").parquet(src)

    def drain():
        q = (
            spark.readStream.schema("doc_id bigint, lang string, v bigint")
            .parquet(src)
            .writeStream.format("deltaproto")
            .option("path", path)
            .option("txnAppId", "test-sink")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    assert _rows(dp.read_delta(spark, path)) == _rows(_df(spark, 0, 25))
    acts = dp._read_actions(path, dp.delta_versions(path)[-1])
    txns = [a["txn"] for a in acts if "txn" in a]
    assert txns and txns[0]["appId"] == "test-sink"
    assert any(a["add"].get("stats") for a in acts if "add" in a)
    # replaying the SAME committed batch id is an exactly-once no-op
    writer = deltastream.DeltaProtoStreamWriter(
        {"path": path, "txnAppId": "test-sink"},
        spark.read.format("deltaproto").load(path).schema,
    )
    v_before = dp.delta_versions(path)[-1]
    writer.commit([], batchId=txns[0]["version"])
    assert dp.delta_versions(path)[-1] == v_before
    # txn state survives checkpointing the JSON tail away
    dp.write_delta_checkpoint(spark, path)
    assert dp.delta_txn_versions(spark, path)["test-sink"] == txns[0]["version"]


def test_txn_idempotent_write_and_timestamp_travel(spark, tmp_path):
    """write_delta(txn=) drops replayed application transactions, and
    read_delta(timestamp_ms=) resolves TIMESTAMP AS OF from commitInfo
    stamps."""
    import json as _json
    import os as _os

    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 10), path, txn=("app", 0))
    dp.write_delta(_df(spark, 10, 20), path, txn=("app", 1))
    # replay of version 1: nothing committed
    v = dp.write_delta(_df(spark, 10, 20), path, txn=("app", 1))
    assert v == dp.delta_versions(path)[-1]
    assert dp.read_delta(spark, path).count() == 20
    assert dp.delta_txn_versions(spark, path) == {"app": 1}
    # TIMESTAMP AS OF: stamp the two commits apart and query between
    log = _os.path.join(path, "_delta_log")
    for ver, ts in ((0, 1000), (1, 2000)):
        f = _os.path.join(log, dp._LOG_FMT.format(ver))
        lines = open(f).read().splitlines()
        acts = [_json.loads(ln) for ln in lines if ln]
        for a in acts:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
        with open(f, "w") as fh:
            fh.write("\n".join(_json.dumps(a) for a in acts) + "\n")
    assert dp.read_delta(spark, path, timestamp_ms=1500).count() == 10
    assert dp.read_delta(spark, path, timestamp_ms=2500).count() == 20
    with pytest.raises(ValueError, match="no Delta commit"):
        dp.read_delta(spark, path, timestamp_ms=500)


def test_vacuum_delta_reclaims_unreferenced(spark, tmp_path):
    """vacuum_delta removes data/DV/cdc files unreferenced by the
    retained history (age-gated), keeps everything the retained
    snapshots reference, and the table still reads exactly."""
    import os as _os

    path = str(tmp_path / "delta")
    dp.write_delta(_df(spark, 0, 40).repartition(4), path)
    dp.delete_where_delta(spark, path, "doc_id", 5, 9, strategy="dv")
    dp.delete_where_delta(spark, path, "doc_id", 20, 29)  # rewrite
    dp.compact_delta(spark, path)
    before = dp.read_delta(spark, path)
    rows_before = _rows(before)
    # young files are spared
    assert dp.vacuum_delta(spark, path, retain_versions=0, min_age_s=3600) == 0
    # age everything, keep only the current snapshot
    for dirpath, _dirs, files in _os.walk(path):
        if "_delta_log" in dirpath:
            continue
        for f in files:
            full = _os.path.join(dirpath, f)
            _os.utime(full, (1, 1))
    n = dp.vacuum_delta(spark, path, retain_versions=0, min_age_s=60)
    assert n > 0
    assert _rows(dp.read_delta(spark, path)) == rows_before
    # time travel to vacuumed versions is gone (files missing) — but
    # the latest snapshot is intact, which is the trade vacuum makes


def test_timestamp_ntz_foreign_table_reads(spark, tmp_path):
    """A v3 table listing timestampNtz reads: the type maps onto
    Spark's TimestampNTZType; the feature gate passes."""
    import datetime
    import json as _json
    import os as _os

    path = str(tmp_path / "ntz")
    _os.makedirs(_os.path.join(path, "_delta_log"))
    df = spark.createDataFrame(
        [(1, datetime.datetime(2021, 3, 14, 1, 59, 26))],
        "doc_id bigint, ts timestamp_ntz",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
    import glob
    import shutil as _sh

    src = glob.glob(str(tmp_path / "stage" / "*.parquet"))[0]
    _sh.copy(src, _os.path.join(path, "f1.parquet"))
    with open(
        _os.path.join(path, "_delta_log", dp._LOG_FMT.format(0)), "w"
    ) as f:
        f.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["timestampNtz"],
                    }
                }
            )
            + "\n"
        )
        f.write(
            _json.dumps(
                {
                    "metaData": {
                        "id": "n",
                        "format": {"provider": "parquet"},
                        "schemaString": df.schema.json(),
                        "partitionColumns": [],
                    }
                }
            )
            + "\n"
        )
        f.write(
            _json.dumps(
                {
                    "add": {
                        "path": "f1.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    got = dp.read_delta(spark, path)
    assert dict(got.dtypes)["ts"] == "timestamp_ntz"
    assert got.collect()[0]["ts"] == datetime.datetime(2021, 3, 14, 1, 59, 26)


def test_batch_datasource_time_travel_options(spark, tmp_path):
    """format('deltaproto') batch reads honor versionAsOf /
    timestampAsOf — delta-spark's reader options."""
    import json as _json
    import os as _os

    deltastream.register(spark)
    path = str(tmp_path / "tt")
    dp.write_delta(_df(spark, 0, 10), path)
    dp.write_delta(_df(spark, 10, 30), path)
    # stamp the two commits apart for the timestamp option
    log = _os.path.join(path, "_delta_log")
    for ver, ts in ((0, 1000), (1, 2000)):
        f = _os.path.join(log, dp._LOG_FMT.format(ver))
        acts = [_json.loads(ln) for ln in open(f).read().splitlines() if ln]
        for a in acts:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
        with open(f, "w") as fh:
            fh.write("\n".join(_json.dumps(a) for a in acts) + "\n")

    assert spark.read.format("deltaproto").load(path).count() == 30
    v0 = (
        spark.read.format("deltaproto")
        .option("versionAsOf", 0)
        .load(path)
    )
    assert v0.count() == 10
    t0 = (
        spark.read.format("deltaproto")
        .option("timestampAsOf", 1500)
        .load(path)
    )
    assert t0.count() == 10
    import pytest as _pytest

    with _pytest.raises(Exception, match="not both"):
        spark.read.format("deltaproto").option("versionAsOf", 0).option(
            "timestampAsOf", 1500
        ).load(path).count()


def test_stream_fails_on_mid_stream_schema_change(spark, tmp_path):
    """A rename/drop commit BETWEEN triggers must fail the stream
    (delta-spark's rule) — the restarted stream binds the new schema
    and keeps going; already-delivered rows are not re-served."""
    deltastream.register(spark)
    path = str(tmp_path / "delta")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    dp.write_delta(_df(spark, 0, 10), path)

    def drain():
        q = (
            spark.readStream.format("deltaproto")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 10
    dp.rename_delta_column(spark, path, "v", "val")
    dp.write_delta(
        _df(spark, 10, 15).withColumnRenamed("v", "val"),
        path,
        mode="append",
    )
    import pyspark.errors

    with pytest.raises(
        pyspark.errors.exceptions.base.PySparkException,
        match="different table schema|schema changed",
    ):
        drain()
    # restart (fresh checkpoint): the new-schema stream serves all rows
    out2 = str(tmp_path / "out2")
    ckpt2 = str(tmp_path / "ckpt2")
    q = (
        spark.readStream.format("deltaproto")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    back = spark.read.parquet(out2)
    assert "val" in back.columns
    assert back.count() == 15


def test_stream_sink_refuses_guarded_tables(spark, tmp_path):
    """The streaming sink cannot run write_delta's validations in
    Python workers — tables with CHECK constraints or GENERATED
    columns refuse up front instead of landing unvalidated rows."""
    deltastream.register(spark)
    p1 = str(tmp_path / "con")
    dp.write_delta(_df(spark, 0, 4), p1)
    dp.add_delta_constraint(spark, p1, "v_pos", "v >= 0")
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(Exception, match="CHECK constraints"):
        (
            src.selectExpr(
                "value as doc_id",
                "cast(value % 3 as string) as lang",
                "value * 10 as v",
            )
            .writeStream.format("deltaproto")
            .option("path", p1)
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )
    p2 = str(tmp_path / "gen")
    dp.write_delta(
        _df(spark, 0, 4), p2, generated={"v": "doc_id * 10"}
    )
    with pytest.raises(Exception, match="GENERATED columns"):
        (
            src.selectExpr(
                "value as doc_id",
                "cast(value % 3 as string) as lang",
                "value * 10 as v",
            )
            .writeStream.format("deltaproto")
            .option("path", p2)
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )
