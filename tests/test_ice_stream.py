"""format("iceberg") DataSource (sources/icestream.py): the snapshot
log as a batch source and an incremental-append streaming source."""

from __future__ import annotations

import os

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


def test_stream_sink_exactly_once_summary_ledger(spark, tmp_path):
    """format('iceberg') streaming sink: each micro-batch appends ONE
    snapshot whose summary carries (streaming-app-id, streaming-batch-
    id); a replayed batch commits nothing and unlinks its orphaned
    files; the result is a plain Iceberg table with stats-bearing
    data files readable by read_iceberg."""
    icestream.register(spark)
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    path = str(tmp_path / "ice")
    ckpt = str(tmp_path / "ckpt")
    df = spark.range(0, 25).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") * 10).cast("bigint").alias("v"),
    )
    df.write.mode("overwrite").parquet(src)

    q = (
        spark.readStream.schema("doc_id bigint, lang string, v bigint")
        .parquet(src)
        .writeStream.format("iceberg")
        .option("path", path)
        .option("streamAppId", "test-ice-sink")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    back = ib.read_iceberg(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    ledger = ib.iceberg_stream_batch_ids(path)
    assert ledger.get("test-ice-sink", -1) >= 0
    committed = ledger["test-ice-sink"]

    # stats made it into the manifest entries
    meta = ib.current_metadata(path)
    snap = ib._snapshot(meta, None)
    entries = [
        e
        for mf in ib._data_manifests(ib._read_manifest_list(path, snap))
        for e in ib._read_manifest(path, mf)
    ]
    assert entries and all(
        e["data_file"].get("lower_bounds") for e in entries
    )

    # replaying a committed batch is an exactly-once no-op AND the
    # orphaned replay file is unlinked
    writer = icestream.IcebergStreamWriter(
        {"path": path, "streamAppId": "test-ice-sink"}, back.schema
    )
    msg = writer.write(iter([(999, "x", 9990)]))
    orphan = os.path.join(path, "data", msg.file_name)
    assert os.path.exists(orphan)
    n_snaps = len(meta.get("snapshots") or [])
    writer.commit([msg], batchId=committed)
    assert not os.path.exists(orphan)
    assert len(ib.current_metadata(path).get("snapshots") or []) == n_snaps
    assert ib.read_iceberg(spark, path).count() == 25

    # a NEWER batch id commits normally
    msg2 = writer.write(iter([(1000, "y", 10000)]))
    writer.commit([msg2], batchId=committed + 1)
    assert ib.read_iceberg(spark, path).count() == 26

    # timestamp-sourced partition transforms are accepted since r12
    # (the row codec was probed engine-deterministic) — full coverage
    # in test_partitioned_stream_sink_timestamp_transforms below
    p2 = str(tmp_path / "part")
    ts = df.withColumn("ts", F.timestamp_micros(F.col("doc_id")))
    ib.write_iceberg(ts, p2, partition_by=["years(ts)"])
    icestream.IcebergStreamWriter(
        {"path": p2, "streamAppId": "x"}, ts.schema
    )


def test_datasource_applies_v3_defaults(spark, tmp_path):
    """The pure-python row reader follows the same default-values
    presence rule as the native reader: a column absent from the file
    reads its initial-default, while files written after carry their
    real values (including genuine NULLs)."""
    import os

    from pyspark.sql import functions as F

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        iceberg as ib,
    )

    path = os.path.join(tmp_path, "t")
    df = spark.range(0, 6).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("lang"),
    )
    ib.write_iceberg(df, path)
    ib.evolve_iceberg_schema(path, add=[("score", "long", 7)])
    ib.write_iceberg(
        spark.range(6, 8).select(
            F.col("id").cast("bigint").alias("doc_id"),
            (F.col("id") % 2).cast("string").alias("lang"),
            F.when(F.col("id") == 7, F.lit(None))
            .otherwise(F.lit(99))
            .cast("long")
            .alias("score"),
        ),
        path,
    )
    icestream.register(spark)
    got = {
        r["doc_id"]: r["score"]
        for r in spark.read.format("iceberg").load(path).collect()
    }
    assert got == {0: 7, 1: 7, 2: 7, 3: 7, 4: 7, 5: 7, 6: 99, 7: None}


def test_stream_sink_partitioned_exactly_once_and_pruned(spark, tmp_path):
    """Partitioned exactly-once sink: stream into a table partitioned
    by (years(d), bucket(4, doc_id)) — each micro-batch lands one
    hive-pathed file per partition tuple and ONE snapshot; the result
    matches the batch writer row-for-row AND prunes identically; a
    duplicate-trigger replay commits nothing; identity sources stay
    out of file content."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    icestream.register(spark)
    src = str(tmp_path / "src")
    path = str(tmp_path / "ice")
    ckpt = str(tmp_path / "ckpt")
    df = spark.range(0, 40).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        F.date_add(
            F.lit("2019-06-01").cast("date"),
            ((F.col("id") * 37) % 1100).cast("int"),
        ).alias("d"),
    )
    # pre-create the partitioned table (empty) with the target spec:
    # one identity field (dropped from file content, reconstructed on
    # read), one time transform, one bucket transform
    ib.write_iceberg(
        df.limit(0), path,
        partition_by=["lang", "years(d)", "bucket(4, doc_id)"],
    )
    df.write.mode("overwrite").parquet(src)
    q = (
        spark.readStream.schema("doc_id bigint, lang string, d date")
        .parquet(src)
        .writeStream.format("iceberg")
        .option("path", path)
        .option("streamAppId", "test-part-sink")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    back = ib.read_iceberg(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # batch-parity of the landed metadata: a twin table written by the
    # BATCH writer prunes to the same file subsets
    twin = str(tmp_path / "twin")
    ib.write_iceberg(
        df, twin, partition_by=["lang", "years(d)", "bucket(4, doc_id)"]
    )
    import datetime as _dt

    for col, lo, hi in [
        ("d", _dt.date(2020, 1, 1), _dt.date(2020, 12, 31)),
        ("doc_id", 7, 7),
    ]:
        got_s, read_s, skip_s, _mf_s = ib.read_iceberg_pruned(
            spark, path, col, lo, hi
        )
        got_b, _read_b, _skip_b, _mf_b = ib.read_iceberg_pruned(
            spark, twin, col, lo, hi
        )
        assert sorted(tuple(r) for r in got_s.collect()) == sorted(
            tuple(r) for r in got_b.collect()
        )
        # pruning actually skipped files on the stream-landed table
        assert skip_s > 0
    # identity sources absent from file content, hive dirs present
    import glob as _glob

    files = _glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                       recursive=True)
    assert files and all("d_year=" in f or "=" in f for f in files)
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.pqfooter import (
        read_footer,
    )

    for f in files:
        cols = read_footer(f)["columns"]
        assert "lang" not in cols  # identity source dropped
        assert "d" in cols  # transform sources stay, per spec
        assert "doc_id" in cols
    # duplicate-trigger replay: exactly-once no-op, orphan unlinked
    committed = ib.iceberg_stream_batch_ids(path)["test-part-sink"]
    writer = icestream.IcebergStreamWriter(
        {"path": path, "streamAppId": "test-part-sink"}, back.schema
    )
    import datetime

    msg = writer.write(
        iter([(999, "x", datetime.date(2021, 2, 3))])
    )
    assert msg.files and len(msg.files) == 1
    orphan = os.path.join(path, "data", msg.files[0][0])
    assert os.path.exists(orphan)
    n_snaps = len(ib.current_metadata(path).get("snapshots") or [])
    writer.commit([msg], batchId=committed)
    assert not os.path.exists(orphan)
    assert (
        len(ib.current_metadata(path).get("snapshots") or []) == n_snaps
    )
    # a NEWER batch commits and the new tuple is pruneable
    msg2 = writer.write(
        iter([(1000, "y", datetime.date(2023, 7, 1))])
    )
    writer.commit([msg2], batchId=committed + 1)
    got, _r, _s, _m = ib.read_iceberg_pruned(
        spark, path, "d", _dt.date(2023, 1, 1), _dt.date(2023, 12, 31)
    )
    assert [r["doc_id"] for r in got.collect()] == [1000]
    # a stale-spec tuple refuses at commit
    with _pytest.raises(ValueError, match="partition tuple"):
        ib.commit_iceberg_files(
            path, [("nope.parquet", {"wrong": 1})], back.schema,
            app_id="test-part-sink", batch_id=committed + 2,
        )


def test_variant_nested_refusals_reader_and_sink(spark, tmp_path):
    """r12 ADVICE fixes: (a) the iceberg STREAM reader's variant guard
    walks NESTED types (a struct-wrapped variant used to pass the
    top-level check and die inside pyarrow tasks); (b) the streaming
    SINK refuses variant-bearing schemas up front — a first commit
    through it would otherwise create sub-v3 table metadata carrying
    type 'variant'."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        VariantType,
    )

    path = str(tmp_path / "icevar")
    df = spark.range(4).select(
        F.col("id").alias("doc_id"),
        F.parse_json(F.format_string('{"a": %d}', "id")).alias("p"),
    )
    ib.write_iceberg(df, path, format_version=3)
    with pytest.raises(Exception, match="variant.*STREAM|STREAM.*variant"):
        icestream._schema(path)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField(
                "meta", StructType([StructField("p", VariantType())])
            ),
        ]
    )
    with pytest.raises(ValueError, match="variant"):
        icestream.IcebergStreamWriter(
            {"path": str(tmp_path / "sink")}, schema
        )


def test_partitioned_stream_sink_timestamp_transforms(spark, tmp_path):
    """Streaming sink into a table partitioned by hours(timestamptz) +
    days(timestamp_ntz) — the r11 refusal, lifted in r12.  The
    DataSource row codec is engine-deterministic (probed: timestamptz
    arrives as a NAIVE UTC datetime regardless of session timezone;
    ntz as its wall-clock naive datetime), so the python transform
    kernels see exactly the spec's internal micros.  Pins: session-tz
    independence (runs under Pacific/Kiritimati, UTC+14), row parity
    and PARTITION-TUPLE parity with the batch writer, hour-range
    pruning that skips files, and duplicate-trigger exactly-once."""
    import datetime

    icestream.register(spark)
    src = str(tmp_path / "src")
    path = str(tmp_path / "ice")
    twin = str(tmp_path / "twin")
    ckpt = str(tmp_path / "ckpt")
    df = spark.range(0, 48).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("id") * 1800
        ).alias("ts"),
        F.make_timestamp_ntz(
            F.lit(2024), F.lit(3), (F.col("id") % 9 + 1).cast("int"),
            F.lit(12), F.lit(30), F.lit(0.0),
        ).alias("tsn"),
    )
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
    try:
        ib.write_iceberg(
            df.limit(0), path, partition_by=["hours(ts)", "days(tsn)"]
        )
        df.write.mode("overwrite").parquet(src)
        q = (
            spark.readStream.schema(
                "doc_id bigint, ts timestamp, tsn timestamp_ntz"
            )
            .parquet(src)
            .writeStream.format("iceberg")
            .option("path", path)
            .option("streamAppId", "test-ts-sink")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        ib.write_iceberg(df, twin, partition_by=["hours(ts)", "days(tsn)"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    back = ib.read_iceberg(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )

    # partition TUPLES in the manifests match the batch writer's
    def tuples(p):
        meta = ib.current_metadata(p)
        snaps = ib._snapshot(meta, None)
        out = {}
        for mf in ib._data_manifests(ib._read_manifest_list(p, snaps)):
            for e in ib._read_manifest(p, mf):
                if e.get("status", 0) in (0, 1):
                    pv = e["data_file"].get("partition") or {}
                    key = (pv.get("ts_hour"), pv.get("tsn_day"))
                    out[key] = out.get(key, 0) + int(
                        e["data_file"]["record_count"]
                    )
        return out

    assert tuples(path) == tuples(twin)
    # hour-range pruning: 1_700_000_000s = 2023-11-14T22:13:20Z; rows
    # span 24 h at 2/hour — a 3-hour UTC window keeps ~6 rows and
    # SKIPS files on both tables identically
    lo = datetime.datetime(2023, 11, 15, 6, 0, 0)
    hi = datetime.datetime(2023, 11, 15, 8, 59, 59)
    got_s, _r, skip_s, _m = ib.read_iceberg_pruned(spark, path, "ts", lo, hi)
    got_b, _r2, skip_b, _m2 = ib.read_iceberg_pruned(spark, twin, "ts", lo, hi)
    rows_s = sorted(r["doc_id"] for r in got_s.collect())
    assert rows_s == sorted(r["doc_id"] for r in got_b.collect())
    assert rows_s and len(rows_s) <= 8
    assert skip_s > 0
    # ntz day pruning stays wall-clock (no session-tz shift)
    got_n, _r3, skip_n, _m3 = ib.read_iceberg_pruned(
        spark, path, "tsn",
        datetime.datetime(2024, 3, 2, 0, 0, 0),
        datetime.datetime(2024, 3, 3, 23, 59, 59),
    )
    assert sorted(r["doc_id"] for r in got_n.collect()) == sorted(
        r["doc_id"] for r in df.filter("day(tsn) in (2, 3)").collect()
    )
    assert skip_n > 0
    # duplicate-trigger replay: exactly-once no-op
    committed = ib.iceberg_stream_batch_ids(path)["test-ts-sink"]
    writer = icestream.IcebergStreamWriter(
        {"path": path, "streamAppId": "test-ts-sink"}, back.schema
    )
    msg = writer.write(
        iter(
            [
                (
                    999,
                    datetime.datetime(2023, 11, 16, 1, 2, 3),
                    datetime.datetime(2024, 3, 9, 4, 5, 6),
                )
            ]
        )
    )
    n_snaps = len(ib.current_metadata(path).get("snapshots") or [])
    writer.commit([msg], batchId=committed)
    assert (
        len(ib.current_metadata(path).get("snapshots") or []) == n_snaps
    )
    assert ib.read_iceberg(spark, path).count() == 48


def test_ice_stream_fails_on_schema_evolution(spark, tmp_path):
    """evolve_iceberg_schema between triggers must fail the stream
    loudly; a fresh checkpoint binds the new schema and serves all
    rows (old files null-fill the added column by field id)."""
    icestream.register(spark)
    path = str(tmp_path / "ice")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ib.write_iceberg(_df(spark, 0, 8), path)

    def drain(o, c):
        q = (
            spark.readStream.format("iceberg")
            .load(path)
            .writeStream.format("parquet")
            .option("path", o)
            .option("checkpointLocation", c)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain(out, ckpt)
    assert spark.read.parquet(out).count() == 8
    ib.evolve_iceberg_schema(path, add=[("note", "string")])
    ib.write_iceberg(
        _df(spark, 8, 12).withColumn("note", F.lit("n")),
        path,
        mode="append",
    )
    import pyspark.errors

    with pytest.raises(
        pyspark.errors.exceptions.base.PySparkException,
        match="different table schema|schema changed",
    ):
        drain(out, ckpt)
    out2 = str(tmp_path / "out2")
    drain(out2, str(tmp_path / "ckpt2"))
    back = spark.read.parquet(out2)
    assert back.count() == 12
    assert "note" in back.columns
    assert back.filter(F.col("note").isNotNull()).count() == 4


def test_commit_files_refuses_stale_spec(spark, tmp_path):
    """commit_iceberg_files(expect_spec=...): a partition-spec change
    with the SAME field name (bucket(4) -> bucket(8) both emit
    doc_id_bucket) passes the tuple-name check but would mis-attribute
    every tuple — the full-definition fingerprint refuses instead."""
    import glob as _glob
    import shutil as _sh

    path = str(tmp_path / "ice")
    ib.write_iceberg(_df(spark, 0, 8), path, partition_by=["bucket(4, doc_id)"])
    meta = ib.current_metadata(path)
    old_spec = [
        (pf["name"], pf.get("transform", "identity"), pf["source-id"])
        for pf in ib._spec_of(meta)
    ]
    assert old_spec[0][1] == "bucket[4]"
    ib.evolve_iceberg_spec(path, ["bucket(8, doc_id)"])
    donor = _glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                       recursive=True)[0]
    rel = "stale-probe.parquet"
    _sh.copy(donor, os.path.join(path, "data", rel))
    schema = ib._spark_schema(ib._schema_of(meta))
    with pytest.raises(ValueError, match="partition spec changed"):
        ib.commit_iceberg_files(
            path, [(rel, {"doc_id_bucket": 1})], schema,
            expect_spec=old_spec,
        )
    # the matching spec commits fine
    new_spec = [
        (pf["name"], pf.get("transform", "identity"), pf["source-id"])
        for pf in ib._spec_of(ib.current_metadata(path))
    ]
    assert new_spec[0][1] == "bucket[8]"
    snap = ib.commit_iceberg_files(
        path, [(rel, {"doc_id_bucket": 1})], schema, expect_spec=new_spec
    )
    assert snap is not None


def test_batch_datasource_as_of_timestamp(spark, tmp_path):
    """`option("asOfTimestamp", ms)` on the batch DataSource resolves
    through the snapshot-log like read_iceberg(timestamp_ms=);
    combined selectors refuse."""
    import time as _time

    icestream.register(spark)
    path = str(tmp_path / "ice")
    ib.write_iceberg(_df(spark, 0, 5), path)
    t1 = ib.current_metadata(path)["snapshot-log"][-1]["timestamp-ms"]
    _time.sleep(0.02)
    ib.write_iceberg(_df(spark, 5, 8), path, mode="append")
    got = sorted(
        r["doc_id"]
        for r in spark.read.format("iceberg")
        .option("asOfTimestamp", str(t1))
        .load(path)
        .collect()
    )
    assert got == list(range(5))
    assert (
        spark.read.format("iceberg").load(path).count() == 8
    )
    with pytest.raises(Exception, match="at most one"):
        spark.read.format("iceberg").option(
            "asOfTimestamp", str(t1)
        ).option("snapshotId", "1").load(path).collect()


def test_stream_sink_manifest_auto_compaction(spark, tmp_path):
    """Opt-in stream-sink maintenance (r13): with
    `commit.manifest-merge.enabled` set, the sink compacts the data
    manifests whenever their count reaches
    `commit.manifest.min-count-to-merge` — a long-running stream keeps
    a BOUNDED manifest list (each trigger otherwise appends one
    forever) with row-exact reads throughout, and the exactly-once
    ledger survives the interleaved `replace` snapshots."""
    from pyspark.sql.types import _parse_datatype_string

    path = str(tmp_path / "icemm")
    schema = _parse_datatype_string("doc_id bigint, lang string")

    def run_batch(b: int) -> None:
        w = icestream.IcebergStreamWriter(
            {"path": path, "streamAppId": "mm-app"}, schema
        )
        msg = w.write(
            iter([(b * 10 + i, f"l{i % 2}") for i in range(10)])
        )
        w.commit([msg], batchId=b)

    def n_data_manifests() -> int:
        meta = ib.current_metadata(path)
        snap = ib._snapshot(meta, None)
        return len(ib._data_manifests(ib._read_manifest_list(path, snap)))

    run_batch(0)  # creates the table (property not yet set: no merge)
    ib.set_iceberg_properties(
        path,
        {
            "commit.manifest-merge.enabled": "true",
            "commit.manifest.min-count-to-merge": "5",
        },
    )
    peak = 0
    for b in range(1, 13):
        run_batch(b)
        n = n_data_manifests()
        peak = max(peak, n)
        # row-exact at every step, through every compaction
        assert ib.read_iceberg(spark, path).count() == (b + 1) * 10
    # bounded: compaction fires at the threshold, so the list never
    # grows past it (5 = merge threshold; without maintenance it
    # would be 13 by now)
    assert peak <= 5
    assert n_data_manifests() <= 5
    # the ledger survived the replace snapshots: replaying an old
    # batch is still an exactly-once no-op
    w = icestream.IcebergStreamWriter(
        {"path": path, "streamAppId": "mm-app"}, schema
    )
    msg = w.write(iter([(999, "zz")]))
    orphan = os.path.join(path, "data", msg.file_name)
    n_before = ib.read_iceberg(spark, path).count()
    w.commit([msg], batchId=3)
    assert not os.path.exists(orphan)
    assert ib.read_iceberg(spark, path).count() == n_before
    # values, not just counts: every non-replayed row present exactly once
    got = sorted(
        r["doc_id"] for r in ib.read_iceberg(spark, path).collect()
    )
    assert got == sorted(b * 10 + i for b in range(13) for i in range(10))


def test_stream_sink_ndv_auto_refresh(spark, tmp_path, monkeypatch):
    """Opt-in stream-sink statistics maintenance (r14): with
    `write.statistics.auto-refresh.enabled` set, every committed
    trigger refreshes the registered NDV sketches — the FIRST enabled
    commit lands the initial full build, every later one runs the
    INCREMENTAL union (O(batch files), pinned here by counting full
    builds), stepping over the manifest auto-compaction's interleaved
    `replace` snapshots.  Estimates stay exact below the sketch's k
    and are re-registered at every current snapshot (stale stats are
    never served — read_iceberg_ndv refuses otherwise)."""
    from pyspark.sql.types import _parse_datatype_string

    path = str(tmp_path / "icendv")
    schema = _parse_datatype_string("doc_id bigint, lang string")

    def run_batch(b: int) -> None:
        w = icestream.IcebergStreamWriter(
            {"path": path, "streamAppId": "ndv-app"}, schema
        )
        msg = w.write(
            iter([(b * 10 + i, f"l{i % 2}") for i in range(10)])
        )
        w.commit([msg], batchId=b)

    run_batch(0)  # property not yet set: no stats registered
    assert not (ib.current_metadata(path).get("statistics") or [])
    ib.set_iceberg_properties(
        path,
        {
            "write.statistics.auto-refresh.enabled": "true",
            "commit.manifest-merge.enabled": "true",
            "commit.manifest.min-count-to-merge": "4",
        },
    )
    full_builds = {"n": 0}
    orig_full = ib.write_iceberg_table_stats

    def counting_full(*a, **kw):
        full_builds["n"] += 1
        return orig_full(*a, **kw)

    monkeypatch.setattr(ib, "write_iceberg_table_stats", counting_full)
    for b in range(1, 9):
        run_batch(b)
        ndv = ib.read_iceberg_ndv(path)  # raises if stats went stale
        assert ndv["doc_id"] == (b + 1) * 10  # exact below sketch k
        assert ndv["lang"] == 2
    # exactly one full build; the other seven commits ran the union —
    # including across the manifest-merge replace snapshots
    assert full_builds["n"] == 1
    meta = ib.current_metadata(path)
    snap_id = int(ib._snapshot(meta, None)["snapshot-id"])
    assert any(
        int(e["snapshot-id"]) == snap_id
        for e in meta.get("statistics") or []
    )
