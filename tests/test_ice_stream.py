"""format("iceberg") DataSource (sources/icestream.py): the snapshot
log as a batch source and an incremental-append streaming source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    iceberg as ib,
    icestream,
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


def test_batch_datasource_matches_read_iceberg(spark, tmp_path):
    """The Python DataSource batch read equals the JVM snapshot read —
    on a partitioned v2 table carrying position deletes AND a renamed
    column (name-mapping resolution python-side)."""
    icestream.register(spark)
    path = str(tmp_path / "ice")
    ib.write_iceberg(
        _df(spark, 0, 30).repartitionByRange(3, "doc_id"),
        path,
        partition_by=["lang"],
    )
    ib.delete_where_iceberg(
        spark, path, "doc_id", 5, 9, strategy="merge-on-read"
    )
    ib.evolve_iceberg_schema(path, rename={"v": "value"})
    got = spark.read.format("iceberg").load(path)
    assert sorted(got.columns) == ["doc_id", "lang", "value"]
    jvm = ib.read_iceberg(spark, path)
    key = lambda df: sorted(  # noqa: E731
        (r["doc_id"], r["lang"], r["value"]) for r in df.collect()
    )
    assert key(got) == key(jvm)
    assert got.count() == 25


def test_stream_incremental_appends(spark, tmp_path):
    """The stream delivers each append snapshot's rows exactly once
    and fails loudly on a delete snapshot (incremental append scan
    semantics)."""
    icestream.register(spark)
    path = str(tmp_path / "ice")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ib.write_iceberg(_df(spark, 0, 20), path)

    def drain():
        q = (
            spark.readStream.format("iceberg")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 20
    ib.write_iceberg(_df(spark, 20, 35), path)
    drain()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(35))  # each row exactly once
    ib.delete_where_iceberg(spark, path, "doc_id", 0, 4)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="delete"):
        q = (
            spark.readStream.format("iceberg")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
