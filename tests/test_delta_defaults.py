"""Delta column DEFAULT values (`allowColumnDefaults` writer feature,
sources/deltaproto.py).

`set_delta_column_default` records a field's `CURRENT_DEFAULT` SQL
expression (the Spark ANSI default-column metadata key Delta adopted)
and declares the writer feature; `write_delta` calls that OMIT the
column fill it at write time — files always carry the value, readers
never fill (the spec's writer-only contract).  Supplied values always
win; SET DEFAULT affects future INSERTs only (delta-spark semantics);
constraints over a defaulted column see the filled value."""

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
        spark.createDataFrame(
            [(1, "eu", 10), (2, "us", 20)], "id long, region string, v long"
        ),
        p,
        mode="overwrite",
    )
    return p


def test_default_fills_omitted_column(spark, tmp_path):
    p = _mk(spark, tmp_path)
    dp.set_delta_column_default(spark, p, "region", "'unknown'")
    # protocol declares the feature, schema carries CURRENT_DEFAULT
    proto = dp._current_protocol(p)
    assert "allowColumnDefaults" in (proto.get("writerFeatures") or [])
    meta, _l, _v = dp._fold_delta_state(spark, p, None)
    fld = next(
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "region"
    )
    assert fld["metadata"]["CURRENT_DEFAULT"] == "'unknown'"
    # an INSERT omitting the column fills it; supplied columns land
    dp.write_delta(
        spark.createDataFrame([(3, 30)], "id long, v long"), p
    )
    got = {
        r["id"]: r["region"]
        for r in dp.read_delta(spark, p).collect()
    }
    assert got == {1: "eu", 2: "us", 3: "unknown"}
    # the landed FILE carries the value (writer-only contract)
    import glob

    import pyarrow.parquet as pq

    vals = set()
    for f in glob.glob(f"{p}/*.parquet"):
        t = pq.read_table(f, columns=["region"])
        vals.update(t.column("region").to_pylist())
    assert "unknown" in vals


def test_supplied_values_win_and_existing_rows_untouched(spark, tmp_path):
    p = _mk(spark, tmp_path)
    dp.set_delta_column_default(spark, p, "v", "99")
    dp.write_delta(
        spark.createDataFrame(
            [(4, "apac", 40)], "id long, region string, v long"
        ),
        p,
    )
    got = {r["id"]: r["v"] for r in dp.read_delta(spark, p).collect()}
    assert got == {1: 10, 2: 20, 4: 40}  # nothing rewritten or filled


def test_default_expression_and_cast(spark, tmp_path):
    p = _mk(spark, tmp_path)
    # non-literal constant expressions fold (concat), and the result
    # casts to the declared column type
    dp.set_delta_column_default(spark, p, "v", "CAST('4' AS INT) + 38")
    dp.write_delta(
        spark.createDataFrame([(5, "sa")], "id long, region string"), p
    )
    got = {r["id"]: r["v"] for r in dp.read_delta(spark, p).collect()}
    assert got[5] == 42
    assert (
        dp.read_delta(spark, p).schema["v"].dataType.simpleString()
        == "bigint"
    )


def test_drop_default_and_refusals(spark, tmp_path):
    p = _mk(spark, tmp_path)
    dp.set_delta_column_default(spark, p, "region", "'x'")
    dp.set_delta_column_default(spark, p, "region", None)  # DROP DEFAULT
    meta, _l, _v = dp._fold_delta_state(spark, p, None)
    assert dp._column_defaults(meta) == {}
    # the feature, once declared, stays (spec upgrade rule)
    assert "allowColumnDefaults" in (
        dp._current_protocol(p).get("writerFeatures") or []
    )
    # an omitted column now lands absent again (reads as NULL)
    dp.write_delta(
        spark.createDataFrame([(6, 60)], "id long, v long"), p
    )
    got = {r["id"]: r["region"] for r in dp.read_delta(spark, p).collect()}
    assert got[6] is None
    with pytest.raises(ValueError, match="no column"):
        dp.set_delta_column_default(spark, p, "nope", "'x'")
    # column references are not constant-foldable — refuse at ALTER
    with pytest.raises(ValueError, match="constant"):
        dp.set_delta_column_default(spark, p, "region", "id + 1")


def test_constraint_sees_filled_default(spark, tmp_path):
    p = _mk(spark, tmp_path)
    dp.add_delta_constraint(spark, p, "region_known", "region IS NOT NULL")
    dp.set_delta_column_default(spark, p, "region", "'unknown'")
    # omitting region fills 'unknown' -> constraint passes
    dp.write_delta(
        spark.createDataFrame([(7, 70)], "id long, v long"), p
    )
    # supplying an explicit NULL still violates
    with pytest.raises(ValueError, match="region_known"):
        dp.write_delta(
            spark.createDataFrame(
                [(8, None, 80)], "id long, region string, v long"
            ),
            p,
        )


def test_foreign_written_default_metadata_honored(spark, tmp_path):
    """A table whose CURRENT_DEFAULT was stamped by a FOREIGN writer
    (hand-edited schemaString, features-tier protocol) fills on our
    writes — key-level interop, no helper involved."""
    p = _mk(spark, tmp_path)
    meta, _l, v = dp._fold_delta_state(spark, p, None)
    schema = json.loads(meta["schemaString"])
    for f in schema["fields"]:
        if f["name"] == "region":
            f["metadata"] = {"CURRENT_DEFAULT": "'fgn'"}
    import time as _t

    lines = [
        json.dumps(
            {
                "protocol": {
                    "minReaderVersion": 1,
                    "minWriterVersion": 7,
                    "writerFeatures": ["allowColumnDefaults"],
                }
            }
        ),
        json.dumps(
            {
                "metaData": {
                    "id": meta["id"],
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": int(_t.time() * 1000),
                }
            }
        ),
    ]
    dp._claim_delta_version(p, lines)
    dp.write_delta(
        spark.createDataFrame([(9, 90)], "id long, v long"), p
    )
    got = {r["id"]: r["region"] for r in dp.read_delta(spark, p).collect()}
    assert got[9] == "fgn"
