"""FOREIGN-ENGINE interop proof for the Avro tier: the Apache Avro
JAVA reference implementation (avro-1.12.1.jar, shipped inside
pyspark's jars and driven here through py4j) reads the Iceberg
manifest lists / manifests our in-repo `avrotiny` codec writes, and
`avrotiny` reads object-container files the Java library writes —
byte-level validation in BOTH directions against the implementation
every real Iceberg engine embeds.

(DuckDB's delta/iceberg extensions stay uninstallable offline —
re-verified r9, see COVERAGE.md — so this is the strongest foreign
validation available in the sandbox: the Avro object-container layer
is the only custom binary format in the Iceberg metadata tree; the
rest is standard JSON + parquet.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    avrotiny as av,
    iceberg as ib,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") * 10).cast("bigint").alias("v"),
    )


def _java_read_avro(spark, path: str):
    """Read an Avro object-container file with the JAVA reference
    implementation; return (records_as_GenericRecord, schema_json)."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    schema_json = reader.getSchema().toString()
    recs = []
    while reader.hasNext():
        recs.append(reader.next())
    reader.close()
    return recs, schema_json


def test_java_avro_reads_our_iceberg_manifests(spark, tmp_path):
    """Manifest list AND manifest written by avrotiny (deflate codec)
    decode bit-exactly under the Java reference implementation —
    schema parse, block/sync framing, and every record value."""
    path = str(tmp_path / "ice")
    ib.write_iceberg(
        _df(spark, 0, 30).coalesce(1), path, partition_by=["lang"]
    )
    meta = ib.current_metadata(path)
    snap = ib._snapshot(meta, None)
    ml = ib._abs_path(path, snap["manifest-list"])

    jrecs, jschema = _java_read_avro(spark, ml)
    ours, _m, _ws = av.read_container(ml)
    assert len(jrecs) == len(ours) == 1
    assert json.loads(jschema)["name"] == "manifest_file"
    jmf = jrecs[0]
    assert str(jmf.get("manifest_path")) == ours[0]["manifest_path"]
    assert jmf.get("manifest_length") == ours[0]["manifest_length"]
    assert jmf.get("added_data_files_count") == 3  # one per lang

    mp = ib._abs_path(path, str(jmf.get("manifest_path")))
    jentries, jeschema = _java_read_avro(spark, mp)
    oentries, _m2, _ws2 = av.read_container(mp)
    assert len(jentries) == len(oentries) == 3
    assert json.loads(jeschema)["name"] == "manifest_entry"
    total = 0
    for je, oe in zip(jentries, oentries):
        jdf = je.get("data_file")
        assert je.get("status") == oe["status"] == 1
        assert str(jdf.get("file_path")) == oe["data_file"]["file_path"]
        assert jdf.get("record_count") == oe["data_file"]["record_count"]
        # identity partition value survives the Java decode
        assert str(jdf.get("partition").get("lang")) == (
            oe["data_file"]["partition"]["lang"]
        )
        total += jdf.get("record_count")
    assert total == 30


def test_java_avro_reads_v2_delete_manifests(spark, tmp_path):
    """The v2 tier (sequence-number fields, content=1 delete
    manifests, position-delete entries) also decodes under the Java
    implementation."""
    path = str(tmp_path / "ice")
    ib.write_iceberg(_df(spark, 0, 30), path)
    ib.delete_where_iceberg(
        spark, path, "doc_id", 5, 9, strategy="merge-on-read"
    )
    meta = ib.current_metadata(path)
    snap = ib._snapshot(meta, None)
    ml = ib._abs_path(path, snap["manifest-list"])
    jrecs, _js = _java_read_avro(spark, ml)
    by_content = {int(r.get("content")) for r in jrecs}
    assert by_content == {0, 1}
    del_mf = next(r for r in jrecs if int(r.get("content")) == 1)
    assert int(del_mf.get("sequence_number")) == 1
    jentries, _je = _java_read_avro(
        spark, ib._abs_path(path, str(del_mf.get("manifest_path")))
    )
    jdf = jentries[0].get("data_file")
    assert int(jdf.get("content")) == 1
    assert jdf.get("record_count") == 5


def test_avrotiny_reads_java_written_container(spark, tmp_path):
    """Reverse direction: a deflate object-container file written by
    the JAVA reference implementation (its own block framing, sync
    markers, string/bytes/long encodings) reads back exactly through
    avrotiny."""
    jvm = spark._jvm
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "jrec",
            "fields": [
                {"name": "s", "type": "string"},
                {"name": "n", "type": "long"},
                {"name": "o", "type": ["null", "int"], "default": None},
            ],
        }
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter()
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    dest = str(tmp_path / "java.avro")
    writer.create(schema, jvm.java.io.File(dest))
    expected = []
    for i in range(100):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("s", f"value-{i}-é")
        rec.put("n", i * (2**33))
        rec.put("o", None if i % 2 else i)
        writer.append(rec)
        expected.append(
            {"s": f"value-{i}-é", "n": i * (2**33), "o": None if i % 2 else i}
        )
    writer.close()
    assert os.path.getsize(dest) > 0
    got, _meta, ws = av.read_container(dest)
    assert ws["name"] == "jrec"
    assert got == expected


def test_java_avro_reads_uuid_partition_manifests(spark, tmp_path):
    """r13: a uuid-identity-partitioned table's manifest carries the
    partition value as fixed(16) with the `uuid` logical annotation —
    the Java reference implementation must parse the schema and
    return the exact 16 bytes our codec encoded from the canonical
    string."""
    import uuid as U

    from pyspark.sql import types as T

    path = str(tmp_path / "uuidp")
    us = [str(U.UUID(int=i + 1)) for i in range(3)]
    df = spark.createDataFrame(
        [(i, us[i]) for i in range(3)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("u", T.StringType()),
            ]
        ),
    )
    ib.write_iceberg(
        df, path, partition_by=["u"], iceberg_types={"u": "uuid"}
    )
    meta = ib.current_metadata(path)
    snap = ib._snapshot(meta, None)
    mfs = ib._read_manifest_list(path, snap)
    mp = ib._abs_path(path, mfs[0]["manifest_path"])
    jentries, jeschema = _java_read_avro(spark, mp)
    # schema carries the logical annotation where the spec puts it
    part_fields = None
    for f in json.loads(jeschema)["fields"]:
        if f["name"] != "data_file":
            continue
        for df_f in f["type"]["fields"]:
            if df_f["name"] == "partition":
                part_fields = df_f["type"]["fields"]
    (pf,) = part_fields
    branch = next(t for t in pf["type"] if t != "null")
    assert branch["type"] == "fixed" and branch["size"] == 16
    assert branch.get("logicalType") == "uuid"
    got = set()
    for je in jentries:
        jfixed = je.get("data_file").get("partition").get("u")
        got.add(str(U.UUID(bytes=bytes(jfixed.bytes()))))
    assert got == set(us)
