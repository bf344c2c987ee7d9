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
