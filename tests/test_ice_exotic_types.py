"""uuid / fixed(L) / time in the Iceberg tier (sources/iceberg.py).

Completes the primitive type matrix VERDICT r12 flagged: a foreign
Iceberg table carrying uuid, fixed, or time columns could not even be
READ.  uuid projects as its canonical lowercase string (the Java
TypeToSparkType rule), fixed(L) as binary with a loud length check,
time as Spark 4.1's TimeType.  Physical forms follow spec Appendix A:
uuid → FIXED_LEN_BYTE_ARRAY(16), fixed(L) → FLBA(L), time → INT64
TIME(MICROS).  Spark's own parquet writer can produce none of these
and its reader refuses TIME outright — writes stage in surrogate form
and a distributed pyarrow pass rewrites each file; reads route
time-bearing tables through an Arrow mapInPandas kernel and convert
uuid bytes JVM-side.  Single-value (de)serialization per Appendix D:
uuid 16-byte big-endian, time 8-byte LE micros, fixed raw bytes.
Bucket hashing per Appendix B (hashBytes of the uuid's big-endian
form).  Known engine edge, documented: Spark 4.1 refuses AGGREGATES
over any frame containing a TimeType column (`df.count()` included) —
select the other columns first; joins/filters/sorts work.
"""

from __future__ import annotations

import datetime
import glob
import os
import uuid as U

import pytest
from pyspark.sql import functions as F, types as T

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    avrotiny,
    iceberg as ib,
)


def _uuids(n):
    return [str(U.UUID(int=i * 7 + 1)) for i in range(n)]


def _exotic_df(spark, n=8):
    us = _uuids(n)
    rows = [
        (
            i,
            us[i],
            bytes([i]) * 8,
            datetime.time(i + 1, 30, 0, 250000),
        )
        for i in range(n)
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("u", T.StringType()),
            T.StructField("fx", T.BinaryType()),
            T.StructField("tm", T.TimeType()),
        ]
    )
    return spark.createDataFrame(rows, schema), us


# --------------------------------------------------------------------------
# unit: mapping + single-value serialization + avro codec
# --------------------------------------------------------------------------


def test_type_mapping_and_ser_deser():
    assert ib._ice_type_to_spark_json("uuid") == "string"
    assert ib._ice_type_to_spark_json("time") == "time(6)"
    assert ib._ice_type_to_spark_json("fixed[12]") == "binary"
    assert ib._spark_to_ice_type(T.TimeType()) == "time"

    u = "0a1b2c3d-4e5f-6071-8293-a4b5c6d7e8f9"
    raw = ib.ser_value("uuid", u)
    assert raw == U.UUID(u).bytes and len(raw) == 16
    assert ib.deser_value("uuid", raw) == u
    # uppercase input normalizes
    assert ib.ser_value("uuid", u.upper()) == raw

    tm = datetime.time(13, 14, 15, 123456)
    raw = ib.ser_value("time", tm)
    micros = ((13 * 3600 + 14 * 60 + 15) * 1_000_000) + 123456
    assert raw == micros.to_bytes(8, "little")
    assert ib.deser_value("time", raw) == micros

    assert ib.ser_value("fixed[4]", b"abcd") == b"abcd"
    with pytest.raises(ValueError, match="fixed"):
        ib.ser_value("fixed[4]", b"abc")


def test_avrotiny_uuid_logical_roundtrip():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {
                "name": "u",
                "type": {
                    "type": "fixed",
                    "name": "uuid_1",
                    "size": 16,
                    "logicalType": "uuid",
                },
            }
        ],
    }
    import io

    u = str(U.UUID(int=42))
    buf = io.BytesIO()
    avrotiny.write_datum(buf, schema, {"u": u})
    buf.seek(0)
    assert avrotiny.read_datum(buf, schema) == {"u": u}


def test_nested_exotic_refused():
    fields = [
        {
            "id": 1,
            "name": "s",
            "required": False,
            "type": {
                "type": "struct",
                "fields": [
                    {"id": 2, "name": "u", "required": False, "type": "uuid"}
                ],
            },
        }
    ]
    with pytest.raises(ValueError, match="nested 'uuid'"):
        ib._spark_schema(fields)


# --------------------------------------------------------------------------
# write / read round trip + physical form
# --------------------------------------------------------------------------


def test_roundtrip_and_physical_schema(spark, tmp_path):
    df, us = _exotic_df(spark)
    p = str(tmp_path / "t1")
    ib.write_iceberg(
        df.repartition(4),
        p,
        mode="overwrite",
        iceberg_types={"u": "uuid", "fx": "fixed[8]"},
    )
    assert [
        (f["name"], f["type"]) for f in ib._schema_of(ib.current_metadata(p))
    ] == [
        ("id", "long"),
        ("u", "uuid"),
        ("fx", "fixed[8]"),
        ("tm", "time"),
    ]
    got = sorted(ib.read_iceberg(spark, p).collect(), key=lambda r: r["id"])
    assert [r["u"] for r in got] == us
    assert got[2]["fx"] == bytes([2]) * 8
    assert got[2]["tm"] == datetime.time(3, 30, 0, 250000)

    # spec Appendix-A physical form, field ids preserved
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(glob.glob(f"{p}/data/*.parquet")[0])
    txt = str(pf.schema)
    assert "fixed_len_byte_array(16) field_id=2 u" in txt
    assert "fixed_len_byte_array(8) field_id=3 fx" in txt
    assert "field_id=4 tm (Time(" in txt

    # append adopts the table's declared types (no iceberg_types)
    one = spark.createDataFrame(
        [(99, str(U.UUID(int=999)), b"zzzzzzzz", datetime.time(5, 5, 5))],
        df.schema,
    )
    ib.write_iceberg(one, p, mode="append")
    assert ib.read_iceberg(spark, p).select("id").count() == 9


def test_bounds_pruning_time_and_uuid(spark, tmp_path):
    df, us = _exotic_df(spark)
    p = str(tmp_path / "t2")
    ib.write_iceberg(
        df.repartition(4),
        p,
        mode="overwrite",
        iceberg_types={"u": "uuid", "fx": "fixed[8]"},
    )
    pr, fr, fs, _ms = ib.read_iceberg_pruned(
        spark, p, "tm", datetime.time(2, 0), datetime.time(3, 0)
    )
    assert fs > 0
    assert sorted(r["id"] for r in pr.collect()) == [1]
    pr, fr, fs, _ms = ib.read_iceberg_pruned(spark, p, "u", us[3], us[3])
    assert fs > 0
    assert [r["id"] for r in pr.collect()] == [3]


def test_partitions_identity_and_bucket_uuid(spark, tmp_path):
    df, us = _exotic_df(spark)
    p = str(tmp_path / "ident")
    ib.write_iceberg(
        df,
        p,
        mode="overwrite",
        partition_by=["u"],
        iceberg_types={"u": "uuid", "fx": "fixed[8]"},
    )
    # hive dirs carry the canonical string; values reconstruct exactly
    assert any(
        d.startswith("u=") and d == f"u={us[0]}"
        for d in os.listdir(f"{p}/data")
    )
    got = sorted(ib.read_iceberg(spark, p).collect(), key=lambda r: r["id"])
    assert [r["u"] for r in got] == us

    p2 = str(tmp_path / "bucket")
    ib.write_iceberg(
        df,
        p2,
        mode="overwrite",
        partition_by=["bucket(4, u)"],
        iceberg_types={"u": "uuid", "fx": "fixed[8]"},
    )
    # python twin and landed partition agree; point lookup prunes
    pr, fr, fs, _ms = ib.read_iceberg_pruned(spark, p2, "u", us[3], us[3])
    assert fs > 0 and [r["id"] for r in pr.collect()] == [3]
    # Appendix-B: bucket hashes the 16-byte big-endian form
    b = ib._bucket_of("uuid", us[3], 4)
    assert b == (ib.murmur3_32(U.UUID(us[3]).bytes) & 0x7FFFFFFF) % 4


def test_deletes_cow_and_mor(spark, tmp_path):
    df, us = _exotic_df(spark)
    p = str(tmp_path / "del")
    ib.write_iceberg(
        df.repartition(2),
        p,
        mode="overwrite",
        iceberg_types={"u": "uuid", "fx": "fixed[8]"},
    )
    # COW rewrite re-lands through the surrogate + pyarrow pass
    ib.delete_where_iceberg(spark, p, "id", 0, 1)
    got = sorted(ib.read_iceberg(spark, p).collect(), key=lambda r: r["id"])
    assert [r["id"] for r in got] == list(range(2, 8))
    assert [r["u"] for r in got] == us[2:]
    # MOR position deletes apply through the Arrow scan's ordinal pos
    ib.delete_where_iceberg(spark, p, "id", 2, 2, strategy="merge-on-read")
    got = sorted(ib.read_iceberg(spark, p).collect(), key=lambda r: r["id"])
    assert [r["id"] for r in got] == list(range(3, 8))
    assert got[0]["tm"] == datetime.time(4, 30, 0, 250000)


# --------------------------------------------------------------------------
# foreign-crafted files (pyarrow writer, not ours)
# --------------------------------------------------------------------------


def test_foreign_crafted_exotic_file_reads(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    df, us = _exotic_df(spark, 2)
    p = str(tmp_path / "foreign")
    ib.write_iceberg(
        df, p, mode="overwrite", iceberg_types={"u": "uuid", "fx": "fixed[8]"}
    )
    # a file landed by a DIFFERENT writer: pyarrow-typed columns,
    # TIME(MICROS) annotation, FLBA(16)/FLBA(8), its own field ids
    fu = str(U.UUID(int=77))
    t = pa.table(
        {
            "id": pa.array([100], pa.int64()),
            "u": pa.array([U.UUID(fu).bytes], pa.binary(16)),
            "fx": pa.array([b"FOREIGN!"], pa.binary(8)),
            "tm": pa.array([datetime.time(23, 59, 59, 999999)], pa.time64("us")),
        },
        schema=pa.schema(
            [
                pa.field("id", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
                pa.field("u", pa.binary(16), metadata={b"PARQUET:field_id": b"2"}),
                pa.field("fx", pa.binary(8), metadata={b"PARQUET:field_id": b"3"}),
                pa.field("tm", pa.time64("us"), metadata={b"PARQUET:field_id": b"4"}),
            ]
        ),
    )
    rel = "foreign-00001.parquet"
    os.makedirs(f"{p}/data", exist_ok=True)
    pq.write_table(t, f"{p}/data/{rel}")
    assert ib.commit_iceberg_files(p, [rel], df.schema) is not None
    got = sorted(ib.read_iceberg(spark, p).collect(), key=lambda r: r["id"])
    assert [r["id"] for r in got] == [0, 1, 100]
    assert got[2]["u"] == fu
    assert got[2]["fx"] == b"FOREIGN!"
    assert got[2]["tm"] == datetime.time(23, 59, 59, 999999)


# --------------------------------------------------------------------------
# refusals stay loud
# --------------------------------------------------------------------------


def test_refusals(spark, tmp_path):
    df, us = _exotic_df(spark)
    # iceberg_types validation
    with pytest.raises(ValueError, match="no column"):
        ib.write_iceberg(
            df, str(tmp_path / "x1"), iceberg_types={"nope": "uuid"}
        )
    with pytest.raises(ValueError, match="needs a string"):
        ib.write_iceberg(
            df, str(tmp_path / "x2"), iceberg_types={"id": "uuid"}
        )
    # identity partition over time / fixed
    with pytest.raises(ValueError, match="identity partition source"):
        ib.write_iceberg(
            df,
            str(tmp_path / "x3"),
            partition_by=["tm"],
            iceberg_types={"u": "uuid", "fx": "fixed[8]"},
        )
    # ORC landing
    with pytest.raises(ValueError, match="ORC data files"):
        ib.write_iceberg(
            df,
            str(tmp_path / "x4"),
            file_format="orc",
            iceberg_types={"u": "uuid", "fx": "fixed[8]"},
        )
    # equality deletes over exotic keys
    p = str(tmp_path / "eq")
    ib.write_iceberg(
        df, p, mode="overwrite", iceberg_types={"u": "uuid", "fx": "fixed[8]"}
    )
    with pytest.raises(ValueError, match="unsupported"):
        ib.delete_eq_iceberg(p, ["u"], [us[0]])
    # UniForm: no Delta counterpart for uuid/fixed/time
    with pytest.raises(ValueError, match="Delta interop"):
        ib.uniform_delta_metadata(spark, p)
    # append with a wrong-length fixed value refuses in the rewrite
    bad = spark.createDataFrame(
        [(7, us[0], b"short", datetime.time(1, 2, 3))], df.schema
    )
    with pytest.raises(Exception, match="fixed"):
        ib.write_iceberg(bad, p, mode="append")


# --------------------------------------------------------------------------
# batch DataSource
# --------------------------------------------------------------------------


def test_exotic_through_datasource(spark, tmp_path):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        icestream,
    )

    icestream.register(spark)
    df, us = _exotic_df(spark, 3)
    p = str(tmp_path / "ds")
    ib.write_iceberg(
        df, p, mode="overwrite", iceberg_types={"u": "uuid", "fx": "fixed[8]"}
    )
    got = sorted(
        spark.read.format("iceberg").option("path", p).load().collect(),
        key=lambda r: r["id"],
    )
    assert [r["u"] for r in got] == us
    assert got[1]["fx"] == bytes([1]) * 8
    assert got[1]["tm"] == datetime.time(2, 30, 0, 250000)
