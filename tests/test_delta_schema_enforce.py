"""Append-time schema enforcement + mergeSchema evolution
(sources/deltaproto.py, delta-spark parity, r13).

Before this, an append carrying an UNKNOWN column was accepted and the
column silently vanished behind the table projection, and a
WRONG-TYPE append landed a mismatched physical type that poisoned
every later read of that file.  Now: unknown columns refuse unless
`merge_schema=True` (which appends them to the schema, nullable, in
the same commit — delta's mergeSchema); type mismatches refuse unless
the lossless typeWidening ladder covers them, in which case the frame
up-casts before landing."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    deltaproto as dp,
)


def _mk(spark, tmp_path, name="t"):
    p = str(tmp_path / name)
    dp.write_delta(
        spark.createDataFrame([(1, "a", 10)], "id long, s string, v long"),
        p,
        mode="overwrite",
    )
    return p


def test_unknown_column_refuses_then_merges(spark, tmp_path):
    p = _mk(spark, tmp_path)
    extra = spark.createDataFrame(
        [(2, "b", 20, 9.5)], "id long, s string, v long, score double"
    )
    with pytest.raises(ValueError, match="merge_schema"):
        dp.write_delta(extra, p)
    dp.write_delta(extra, p, merge_schema=True)
    got = {r["id"]: r["score"] for r in dp.read_delta(spark, p).collect()}
    assert got == {1: None, 2: 9.5}  # old rows null-fill, new visible
    meta, _l, _v = dp._fold_delta_state(spark, p, None)
    fields = json.loads(meta["schemaString"])["fields"]
    fld = next(f for f in fields if f["name"] == "score")
    assert fld["type"] == "double" and fld["nullable"] is True
    # a later plain append against the evolved schema just works
    dp.write_delta(
        spark.createDataFrame(
            [(3, "c", 30, 1.5)], "id long, s string, v long, score double"
        ),
        p,
    )
    assert dp.read_delta(spark, p).count() == 3


def test_wrong_type_refuses_loudly(spark, tmp_path):
    p = _mk(spark, tmp_path)
    bad = spark.createDataFrame(
        [("x", "b", 20)], "id string, s string, v long"
    )
    with pytest.raises(ValueError, match="poison"):
        dp.write_delta(bad, p)
    # the table still reads fine (nothing landed)
    assert dp.read_delta(spark, p).count() == 1


def test_lossless_widening_upcasts(spark, tmp_path):
    p = _mk(spark, tmp_path)
    narrow = spark.createDataFrame(
        [(2, "b", 20)], "id int, s string, v int"  # int into long cols
    )
    dp.write_delta(narrow, p)
    got = dp.read_delta(spark, p)
    assert got.schema["id"].dataType.simpleString() == "bigint"
    assert {r["id"] for r in got.collect()} == {1, 2}
    # int into double widens; long into int refuses
    p2 = str(tmp_path / "d2")
    dp.write_delta(
        spark.createDataFrame([(1, 1.5)], "id long, x double"), p2
    )
    dp.write_delta(spark.createDataFrame([(2, 7)], "id long, x int"), p2)
    assert {r["x"] for r in dp.read_delta(spark, p2).collect()} == {1.5, 7.0}
    with pytest.raises(ValueError, match="poison"):
        dp.write_delta(
            spark.createDataFrame([(3, 1)], "id long, x long").select(
                "id", F.col("x").cast("long").alias("id2")
            ).withColumnRenamed("id2", "x"),
            p2,
        )


def test_decimal_widening_rules(spark, tmp_path):
    p = str(tmp_path / "dec")
    dp.write_delta(
        spark.createDataFrame([(1,)], "id long").select(
            "id", F.lit("1.25").cast("decimal(12,2)").alias("amt")
        ),
        p,
    )
    # (10,2) fits inside (12,2): widen-lands
    dp.write_delta(
        spark.createDataFrame([(2,)], "id long").select(
            "id", F.lit("2.50").cast("decimal(10,2)").alias("amt")
        ),
        p,
    )
    assert dp.read_delta(spark, p).count() == 2
    # (14,2) would overflow the declared (12,2): refuses
    with pytest.raises(ValueError, match="poison"):
        dp.write_delta(
            spark.createDataFrame([(3,)], "id long").select(
                "id", F.lit("3.75").cast("decimal(14,2)").alias("amt")
            ),
            p,
        )


def test_merge_schema_refused_on_mapped_tables(spark, tmp_path):
    p = _mk(spark, tmp_path)
    dp.rename_delta_column(spark, p, "s", "label")  # upgrades to mapping
    extra = spark.createDataFrame(
        [(2, "b", 20, True)], "id long, label string, v long, flag boolean"
    )
    with pytest.raises(ValueError, match="add_delta_column"):
        dp.write_delta(extra, p, merge_schema=True)


def test_overwrite_still_replaces_schema(spark, tmp_path):
    p = _mk(spark, tmp_path)
    dp.write_delta(
        spark.createDataFrame([(9, True)], "k long, flag boolean"),
        p,
        mode="overwrite",
    )
    assert set(dp.read_delta(spark, p).columns) == {"k", "flag"}
