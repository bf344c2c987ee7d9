"""End-to-end ingestion pipeline test: letter-keyed JSON fixture →
distributed flatten → clean → catalog sink → round-trip (reference
Pharma_Ingestion_Cleaning.py flow)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.pipeline import (
    clean,
    flatten_and_extract,
    price_stats,
    run_ingestion,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.json_ingest import (
    read_letter_keyed_json,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.rest import (
    land_dict,
)


def _med(name, lab, therapeutic, rate, refundable, form="tablet", generic="x"):
    return {
        "name": name,
        "lab": {"name": lab, "address": None, "tel": None, "web": None},
        "class": {"therapeutic": therapeutic, "pharmacological": f"{therapeutic}-ph"},
        "form": form,
        "generic": generic,
        "reference_rate": rate,
        "refundable": refundable,
    }


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    doc = {
        "A": [
            _med("ASPIRINE", "LabA", "analgesic", "120 DA", True),
            _med("AMOXIL", "LabA", "antibiotic", "450 DA", None),
        ],
        "B": [
            _med("BRUFEN", "LabB", "analgesic", "85 DA", False),
            _med("BADPRICE", "LabB", "antibiotic", "N/A", True),
            _med("BZERO", "LabB", "antibiotic", "0 DA", True),
        ],
        "C": [
            _med("CLAMOXYL", "LabC", "antibiotic", "620 DA", True),
        ],
    }
    path = str(tmp_path_factory.mktemp("landing") / "meds.json")
    return land_dict(doc, path)


def test_flatten_injects_first_letter(spark, landing):
    raw = read_letter_keyed_json(spark, landing)
    got = {(r["name"], r["first_letter"]) for r in raw.select("name", "first_letter").collect()}
    assert ("ASPIRINE", "A") in got and ("CLAMOXYL", "C") in got
    assert raw.count() == 6


def test_price_extraction_and_stats(spark, landing):
    extracted = flatten_and_extract(read_letter_keyed_json(spark, landing))
    stats = price_stats(extracted)
    assert stats.total == 6
    assert stats.null_price == 1  # 'N/A'
    assert stats.zero_price == 1  # '0 DA'
    assert stats.valid_price == 4


def test_clean_drops_invalid_and_buckets(spark, landing):
    cleaned = clean(flatten_and_extract(read_letter_keyed_json(spark, landing)))
    rows = {r["name"]: r for r in cleaned.collect()}
    assert set(rows) == {"ASPIRINE", "AMOXIL", "BRUFEN", "CLAMOXYL"}
    assert rows["BRUFEN"]["price_category"] == "Low"       # 85
    assert rows["AMOXIL"]["price_category"] == "Medium"    # 450
    assert rows["CLAMOXYL"]["price_category"] == "High"    # 620
    # tri-state preserved through the pipeline (imputation is downstream)
    assert rows["AMOXIL"]["refundable"] is None


def test_full_pipeline_roundtrip(spark, landing):
    saved, stats = run_ingestion(spark, landing, table_name="medications_test")
    assert saved.count() == stats.valid_price == 4
    assert "price_category" in saved.columns
    assert saved.filter(F.col("price") <= 0).count() == 0
    spark.sql("DROP TABLE IF EXISTS medications_test")


def test_partitioned_write_prunes_at_scan(spark, landing, tmp_path):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.plans.audit import (
        formatted_plan,
    )
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.sinks import (
        write_partitioned,
    )

    cleaned = clean(flatten_and_extract(read_letter_keyed_json(spark, landing)))
    out = str(tmp_path / "meds_by_letter")
    write_partitioned(cleaned, out, "first_letter")

    back = spark.read.parquet(out)
    assert back.count() == cleaned.count()
    one_letter = back.filter(F.col("first_letter") == "A")
    plan = formatted_plan(one_letter)
    # the partition predicate must prune directories, not filter rows
    assert "PartitionFilters" in plan and "first_letter" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert one_letter.count() == 2  # ASPIRINE + AMOXIL


def test_merge_upsert_semantics(spark, tmp_path):
    """MERGE on a parquet dir: matched rows replaced, unmatched
    inserted, untouched carried over; duplicate-key updates rejected;
    re-applying the same updates is a no-op."""
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.sinks import (
        merge_upsert,
    )

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    merge_upsert(spark, tgt, base, ["id"])
    assert spark.read.parquet(tgt).count() == 3

    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    merge_upsert(spark, tgt, updates, ["id"])
    rows = {r.id: (r.name, r.v) for r in spark.read.parquet(tgt).collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    # idempotent re-apply
    merge_upsert(spark, tgt, updates, ["id"])
    rows2 = {r.id: (r.name, r.v) for r in spark.read.parquet(tgt).collect()}
    assert rows2 == rows

    dup = spark.createDataFrame(
        [(5, "x", 1.0), (5, "y", 2.0)], "id long, name string, v double"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_upsert(spark, tgt, dup, ["id"])
    assert {r.id for r in spark.read.parquet(tgt).collect()} == {1, 2, 3, 4}


def test_merge_upsert_partition_pruned(spark, tmp_path):
    """Partition-pruned MERGE: only partitions holding updated keys are
    rewritten; untouched partition files stay byte-identical (the Delta
    MERGE file-pruning contract on plain parquet)."""
    import glob
    import hashlib
    import os

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.sinks import (
        merge_upsert,
    )

    tgt = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "east", 10.0), (2, "east", 20.0), (3, "west", 30.0), (4, "north", 40.0)],
        "id long, region string, v double",
    )
    merge_upsert(spark, tgt, base, ["id"], partition_col="region")
    assert spark.read.parquet(tgt).count() == 4

    def digest(pattern):
        out = {}
        for f in sorted(glob.glob(os.path.join(tgt, pattern, "*.parquet"))):
            out[os.path.relpath(f, tgt)] = (
                hashlib.sha256(open(f, "rb").read()).hexdigest(),
                os.path.getmtime(f),
            )
        return out

    west_before = digest("region=west")
    north_before = digest("region=north")
    assert west_before and north_before

    updates = spark.createDataFrame(
        [(2, "east", 99.0), (5, "south", 50.0)], "id long, region string, v double"
    )
    merge_upsert(spark, tgt, updates, ["id"], partition_col="region")

    rows = {r.id: (r.region, r.v) for r in spark.read.parquet(tgt).collect()}
    assert rows == {
        1: ("east", 10.0),
        2: ("east", 99.0),
        3: ("west", 30.0),
        4: ("north", 40.0),
        5: ("south", 50.0),
    }
    # untouched partitions: same files, same bytes, same mtime
    assert digest("region=west") == west_before
    assert digest("region=north") == north_before

    # idempotent re-apply, still pruned
    merge_upsert(spark, tgt, updates, ["id"], partition_col="region")
    assert digest("region=west") == west_before
    rows2 = {r.id: (r.region, r.v) for r in spark.read.parquet(tgt).collect()}
    assert rows2 == rows


def test_merge_upsert_crash_recovery(spark, tmp_path):
    """Leftover _merge_tmp / _merge_old dirs from a crashed merge are
    repaired at entry instead of failing the rerun."""
    import os
    import shutil

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.sinks import (
        merge_upsert,
    )

    tgt = str(tmp_path / "ctbl")
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    merge_upsert(spark, tgt, base, ["id"])

    # crash mid-write: stale _merge_tmp left behind
    os.makedirs(str(tmp_path / "_merge_tmp" / "junk"))
    upd = spark.createDataFrame([(2, 99.0)], "id long, v double")
    merge_upsert(spark, tgt, upd, ["id"])
    assert not os.path.exists(str(tmp_path / "_merge_tmp"))
    assert {r.id: r.v for r in spark.read.parquet(tgt).collect()} == {1: 10.0, 2: 99.0}

    # crash mid-swap: target renamed away, _merge_old holds the data
    os.rename(tgt, str(tmp_path / "_merge_old"))
    merge_upsert(spark, tgt, upd, ["id"])
    assert {r.id: r.v for r in spark.read.parquet(tgt).collect()} == {1: 10.0, 2: 99.0}
    assert not os.path.exists(str(tmp_path / "_merge_old"))

    # partitioned mid-swap crash: displaced partition restored when its
    # replacement was never published
    ptgt = str(tmp_path / "ptbl2")
    pbase = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, part string, v double"
    )
    merge_upsert(spark, ptgt, pbase, ["id"], partition_col="part")
    os.makedirs(str(tmp_path / "_merge_old"), exist_ok=True)
    shutil.move(
        os.path.join(ptgt, "part=b"), str(tmp_path / "_merge_old" / "part=b")
    )
    pupd = spark.createDataFrame([(1, "a", 5.0)], "id long, part string, v double")
    merge_upsert(spark, ptgt, pupd, ["id"], partition_col="part")
    rows = {r.id: (r.part, r.v) for r in spark.read.parquet(ptgt).collect()}
    assert rows == {1: ("a", 5.0), 2: ("b", 2.0)}


def test_csv_quarantine_split(spark, tmp_path):
    """Every input line lands in exactly one of good/bad; good rows are
    typed per the explicit schema; bad keeps the raw line."""
    from pyspark.sql import types as T

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        files,
    )

    p = tmp_path / "landing.csv"
    p.write_text(
        "id,name,price\n"          # header
        "1,amoxi,12.5\n"
        "2,parac,3.25\n"
        "not,a,number,extra,cols\n"  # malformed: arity + type
        "3,ibup,oops\n"              # malformed: price not a double
        "4,aspir,9.0\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    parsed = files.read_csv(spark, str(p), schema, header=True)
    good, bad = files.quarantine_split(parsed)
    g = {r.id: (r.name, r.price) for r in good.collect()}
    b = sorted(r.raw for r in bad.collect())
    assert g == {1: ("amoxi", 12.5), 2: ("parac", 3.25), 4: ("aspir", 9.0)}
    assert b == ["3,ibup,oops", "not,a,number,extra,cols"]
    assert good.count() + bad.count() == 5  # all non-header lines routed
    assert [f.dataType.simpleString() for f in good.schema.fields] == [
        "int", "string", "double",
    ]


def test_jsonl_quarantine_split(spark, tmp_path):
    from pyspark.sql import types as T

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        files,
    )

    p = tmp_path / "landing.jsonl"
    p.write_text(
        '{"id": 1, "name": "amoxi"}\n'
        "this is not json\n"
        '{"id": 2, "name": "parac"}\n'
        '{"id": "NaN-ish", "name": 7}\n'
        "\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    good, bad = files.quarantine_split(files.read_jsonl(spark, str(p), schema))
    assert {r.id for r in good.collect()} == {1, 2}
    assert bad.count() == 2  # broken line + type-mismatched record


def test_observed_read_metrics_match_routed_counts(spark, tmp_path):
    """The metrics dict must equal the actual routed counts, and the
    plan must carry the named observe node for listener-based
    telemetry.  (The Observation-object API is deliberately NOT used:
    registering one poisons the session for later closure-cleaned
    jobs — NotSerializableException: ObservationManager.)"""
    from pyspark.sql import types as T

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        files,
    )

    p = tmp_path / "obs.csv"
    p.write_text("1,a,1.0\n2,b,2.0\nbroken,row\n3,c,3.0\n")
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    good, bad, m = files.observed_read(spark, str(p), schema)
    assert m["lines"] == 4 and m["quarantined"] == 1
    assert good.count() == 3
    assert bad.count() == 1
    assert "CollectMetrics" in good._jdf.queryExecution().analyzed().toString()


# --------------------------------------------------------------------------
# Nested-field alignment regression (positional-cast swap)
# --------------------------------------------------------------------------


def test_nested_fields_align_by_name_not_position(spark, landing):
    """JSON inference sorts nested fields alphabetically and drops
    all-null ones; alignment must be BY NAME — a positional struct cast
    hands lab.name the address value and swaps
    therapeutic↔pharmacological (regression: the original reader did)."""
    raw = read_letter_keyed_json(spark, landing)
    r = {row["name"]: row for row in raw.collect()}["ASPIRINE"]
    assert r.lab.name == "LabA"
    assert r.lab.address is None  # all-null in fixture, dropped by inference
    assert r["class"].therapeutic == "analgesic"
    assert r["class"].pharmacological == "analgesic-ph"


# --------------------------------------------------------------------------
# Spark 4 Python DataSource (sources/pydatasource.py)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def registered(spark):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        pydatasource,
    )

    pydatasource.register(spark)
    return pydatasource


def test_datasource_single_file_parity(spark, landing, registered):
    """format('letterjson') on a landed document == the stack/explode
    reader, row for row (the DataSource moves the parse into per-letter
    tasks without changing semantics)."""
    ds = spark.read.format("letterjson").load(landing)
    ref = read_letter_keyed_json(spark, landing)
    # same names/types (nullable flags differ: the DataSource declares
    # the contract schema, inference marks everything nullable)
    assert ds.schema.simpleString() == ref.schema.simpleString()
    assert sorted(map(tuple, ds.collect())) == sorted(map(tuple, ref.collect()))


def test_datasource_directory_is_file_partitioned(spark, landing, registered, tmp_path):
    """Directory landing: one file → one input partition; union of the
    per-letter documents equals the single-document read."""
    import json

    with open(landing, encoding="utf-8") as f:
        doc = json.load(f)
    d = tmp_path / "byletter"
    d.mkdir()
    for letter, meds in doc.items():
        with open(d / f"{letter}.json", "w", encoding="utf-8") as f:
            json.dump({letter: meds}, f)
    ds = spark.read.format("letterjson").load(str(d))
    assert ds.rdd.getNumPartitions() == len(doc)
    single = spark.read.format("letterjson").load(landing)
    assert sorted(map(tuple, ds.collect())) == sorted(map(tuple, single.collect()))


def test_datasource_stream_replays_landing_dir(spark, landing, registered, tmp_path):
    """Streaming side: files become micro-batches in filename order;
    an availableNow drain lands every record exactly once."""
    import glob as g
    import json
    import tempfile

    with open(landing, encoding="utf-8") as f:
        doc = json.load(f)
    src = tmp_path / "arrivals"
    src.mkdir()
    for i, (letter, meds) in enumerate(sorted(doc.items())):
        with open(src / f"{i:04d}.json", "w", encoding="utf-8") as f:
            json.dump({letter: meds}, f)

    out = str(tmp_path / "landed")
    stream = spark.readStream.format("letterjson").load(str(src))
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.streaming import (
        jobs,
    )

    jobs.foreach_batch_to_parquet(stream, out)
    got = spark.read.parquet(out + "/batch=*")
    ref = spark.read.format("letterjson").load(landing)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_datasource_stream_checkpoint_restart_continuation(
    spark, landing, registered, tmp_path
):
    """Exactly-once across restarts: a second drain with the SAME
    checkpoint resumes from committed offsets and lands only files
    that arrived after the first drain — the custom source's offset
    store round-trips through a real checkpoint."""
    import json

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.streaming import (
        jobs,
    )

    with open(landing, encoding="utf-8") as f:
        doc = json.load(f)
    letters = sorted(doc)
    src = tmp_path / "arrivals"
    src.mkdir()
    for i, letter in enumerate(letters[:2]):
        with open(src / f"{i:04d}.json", "w", encoding="utf-8") as f:
            json.dump({letter: doc[letter]}, f)

    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.format("letterjson").load(str(src))
    jobs.foreach_batch_to_parquet(stream, out, checkpoint_dir=ckpt)
    first = spark.read.parquet(out + "/batch=*").collect()
    assert {r.first_letter for r in first} == set(letters[:2])

    # a new landing file arrives; the resumed drain processes ONLY it
    with open(src / "0002.json", "w", encoding="utf-8") as f:
        json.dump({letters[2]: doc[letters[2]]}, f)
    stream2 = spark.readStream.format("letterjson").load(str(src))
    jobs.foreach_batch_to_parquet(stream2, out, checkpoint_dir=ckpt)
    rows = spark.read.parquet(out + "/batch=*").collect()
    assert {r.first_letter for r in rows} == set(letters)
    # no duplicates: every record landed exactly once across both drains
    assert len(rows) == sum(len(v) for v in doc.values())


def test_provenance_metadata_columns(spark, sf_correct):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.catalog import (
        load_with_provenance,
    )

    df = load_with_provenance(spark, sf_correct, "documents")
    rows = df.select("_file_name", "_file_size").distinct().collect()
    assert len(rows) == 1  # single-file fixture ⇒ one provenance value
    assert rows[0]._file_name == "documents.parquet"
    assert rows[0]._file_size > 0
    # provenance rides every row without disturbing the data columns
    assert df.count() == 500


def test_dynamic_partition_overwrite_touches_only_loaded_partitions(spark, tmp_path):
    """Re-landing one partition replaces it and ONLY it: other
    partitions' files stay byte-identical, and re-running the same
    load is idempotent."""
    import glob
    import hashlib
    import os

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.sinks import (
        overwrite_partitions_dynamic,
        write_partitioned,
    )

    path = str(tmp_path / "part_tbl")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "id long, grp string, v double",
    )
    write_partitioned(base, path, "grp")

    def digest(pattern):
        return {
            os.path.relpath(f, path): hashlib.sha256(open(f, "rb").read()).hexdigest()
            for f in sorted(glob.glob(os.path.join(path, pattern, "*.parquet")))
        }

    b_before, c_before = digest("grp=b"), digest("grp=c")
    assert b_before and c_before

    mode_before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    reload_a = spark.createDataFrame([(1, "a", 99.0)], "id long, grp string, v double")
    overwrite_partitions_dynamic(spark, reload_a, path, "grp")
    rows = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert rows == {1: 99.0, 3: 30.0, 4: 40.0}  # grp=a replaced wholesale
    assert digest("grp=b") == b_before and digest("grp=c") == c_before

    # idempotent re-land
    overwrite_partitions_dynamic(spark, reload_a, path, "grp")
    rows2 = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert rows2 == rows
    # session conf restored (the dynamic mode stayed scoped to the write)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == mode_before


def test_datasource_writer_roundtrip_and_two_phase_commit(
    spark, landing, registered, tmp_path
):
    """Write side of the custom format: distributed round-trip equals
    the source rows; overwrite replaces instead of appending; no task
    temp files survive a committed write."""
    import os

    df = spark.read.format("letterjson").load(landing)
    out = str(tmp_path / "written")
    df.repartition(2, "first_letter").write.format("letterjson").mode(
        "overwrite"
    ).save(out)
    files = sorted(os.listdir(out))
    assert files and all(f.startswith("part-") and f.endswith(".json") for f in files)
    back = spark.read.format("letterjson").load(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    # overwrite: second write replaces, never appends
    df.write.format("letterjson").mode("overwrite").save(out)
    again = spark.read.format("letterjson").load(out)
    assert again.count() == df.count()
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, df.collect()))
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def test_compact_files_bin_packs_and_preserves_rows(spark, tmp_path):
    """OPTIMIZE-style compaction: many small files → few, same rows;
    idempotent; stale temp dirs from a crash are cleared at entry."""
    import os

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.sinks import (
        compact_files,
    )

    path = str(tmp_path / "smallfiles")
    df = spark.range(10000).withColumn("v", F.col("id") * 2)
    df.repartition(32).write.parquet(path)
    before = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(before) == 32

    os.makedirs(path + "_compact_tmp")  # stale temp from a "crash"
    n = compact_files(spark, path, target_mb=512)
    assert n == 1  # tiny data packs into one target-size file
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(10000))
    # idempotent
    assert compact_files(spark, path, target_mb=512) == 1


def test_compact_files_recovers_from_mid_swap_crash(spark, tmp_path):
    """A crash BETWEEN the two swap renames leaves the only complete
    copy in `_compact_old`; the next run must restore it, not rmtree
    it (the data-loss window the round-6 review flagged)."""
    import os
    import shutil

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.sinks import (
        compact_files,
    )

    path = str(tmp_path / "compactable")
    spark.range(1000).withColumn("v", F.col("id") + 1).repartition(8).write.parquet(path)

    # simulate the crash window: data dir renamed away, tmp half-written
    os.rename(path, path + "_compact_old")
    os.makedirs(path + "_compact_tmp")

    n = compact_files(spark, path, target_mb=512)
    assert n == 1
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == sum(i + 1 for i in range(1000))
    assert not os.path.isdir(path + "_compact_old")
    assert not os.path.isdir(path + "_compact_tmp")
    shutil.rmtree(path)


def test_datasource_append_does_not_clobber_prior_parts(
    spark, landing, registered, tmp_path
):
    """Append mode must number new part files past the existing ones —
    reusing part-00000 silently replaced previously committed data."""
    import os

    df = spark.read.format("letterjson").load(landing)
    out = str(tmp_path / "appended")
    df.write.format("letterjson").mode("overwrite").save(out)
    first = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".json")
    )
    df.write.format("letterjson").mode("append").save(out)
    second = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".json")
    )
    assert set(first) < set(second)  # originals survive
    assert len(second) == 2 * len(first)
    back = spark.read.format("letterjson").load(out)
    assert back.count() == 2 * df.count()


def test_minilake_commit_log_lifecycle(spark, tmp_path):
    """The log-structured table format: append accumulates, overwrite
    replaces, EVERY prior version stays readable (time travel across
    overwrite AND compaction), a crashed writer's orphan files are
    invisible and vacuumed, and vacuum(0) keeps only the current
    snapshot readable."""
    import os

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "lake")
    df1 = spark.range(100).withColumn("v", F.col("id") * 2)
    df2 = spark.range(100, 150).withColumn("v", F.col("id") * 2)

    v0 = minilake.commit_append(df1.repartition(4), path)
    v1 = minilake.commit_append(df2.repartition(2), path)
    assert (v0, v1) == (0, 1)
    assert minilake.read_snapshot(spark, path).count() == 150
    assert minilake.read_snapshot(spark, path, version=0).count() == 100

    # overwrite: new snapshot, old still travelable
    df3 = spark.range(7).withColumn("v", F.lit(0).cast("long"))
    v2 = minilake.commit_overwrite(df3, path)
    assert minilake.read_snapshot(spark, path).count() == 7
    assert minilake.read_snapshot(spark, path, version=v1).count() == 150

    # compaction: fewer files, same rows, pre-compaction versions intact
    v3 = minilake.compact(spark, path, target_mb=512)
    snap = minilake.read_snapshot(spark, path)
    assert snap.count() == 7
    assert minilake.read_snapshot(spark, path, version=v2).count() == 7
    assert minilake.read_snapshot(spark, path, version=v1).count() == 150
    assert [h["mode"] for h in minilake.history(path)] == [
        "append", "append", "overwrite", "compact",
    ]

    # crashed writer: data files landed, no commit → invisible
    minilake._land_data_files(spark.range(999), path)
    assert minilake.read_snapshot(spark, path).count() == 7

    n_files_before = len(os.listdir(path + "/data"))
    # min_age_s=0: the test's 'orphans' are seconds old; production
    # default spares young files for in-flight writers
    deleted = minilake.vacuum(path, retain_versions=0, min_age_s=0)
    assert deleted > 0
    assert len(os.listdir(path + "/data")) == n_files_before - deleted
    # current snapshot survives vacuum; history before it is gone
    assert minilake.read_snapshot(spark, path).count() == 7
    assert sorted(map(tuple, snap.collect())) == sorted(
        map(tuple, minilake.read_snapshot(spark, path).collect())
    )


def test_minilake_empty_and_version_claim(spark, tmp_path):
    """Empty overwrite keeps the schema readable; version claims are
    strictly sequential even when a stale temp commit file lingers."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "lake2")
    df = spark.range(5).withColumn("v", F.col("id") + 1)
    minilake.commit_append(df, path)
    minilake.commit_overwrite(df.limit(0), path)
    empty = minilake.read_snapshot(spark, path)
    assert empty.count() == 0
    # names + types survive the log round-trip (nullability is not
    # preserved by parquet reads either, so it is not part of the law)
    assert [(f.name, f.dataType) for f in empty.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    assert minilake.read_snapshot(spark, path, version=0).count() == 5
    assert minilake.versions(path) == [0, 1]


def test_minilake_schema_enforcement_and_evolution(spark, tmp_path):
    """Write-time schema contract: missing columns and type changes are
    rejected loudly; new columns require allow_evolution=True and read
    back as NULL for pre-evolution files (merged snapshot schema)."""
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "lake3")
    base = spark.range(10).withColumn("v", F.col("id") * 2)
    minilake.commit_append(base, path)

    with pytest.raises(ValueError, match="missing table columns"):
        minilake.commit_append(base.drop("v"), path)
    with pytest.raises(ValueError, match="changes column types"):
        minilake.commit_append(
            base.withColumn("v", F.col("v").cast("string")), path
        )
    evolved = base.withColumn("lang", F.lit("en"))
    with pytest.raises(ValueError, match="allow_evolution"):
        minilake.commit_append(evolved, path)

    minilake.commit_append(evolved, path, allow_evolution=True)
    snap = minilake.read_snapshot(spark, path)
    assert set(snap.columns) == {"id", "v", "lang"}
    assert snap.count() == 20
    assert snap.filter(F.col("lang").isNull()).count() == 10  # old files


def test_minilake_zone_maps_skip_files_and_prune_merge(spark, tmp_path):
    """Zone maps from parquet footers land in the commit log; a
    selective range scan reads ONLY overlapping files (skip count
    proves it, using the log alone); MERGE rewrites only the files
    whose key range can contain an update — untouched files keep their
    exact names in the log — and produces upsert-correct rows."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "zoned")
    # 4 files with disjoint id ranges via range-partitioned write
    df = spark.range(1000).withColumn("v", F.col("id") * 10)
    minilake.commit_append(
        df.repartitionByRange(4, "id"), path, stat_cols=["id"]
    )
    zones = minilake._live_zones(path)
    assert len(zones) == 4 and all(
        z and "id" in z["stats"] for z in zones.values()
    )

    pruned, n_read, n_skipped = minilake.scan_pruned(spark, path, "id", 10, 20)
    assert n_read == 1 and n_skipped == 3
    assert pruned.count() == 11
    assert pruned.agg(F.min("id"), F.max("id")).first() == (10, 20)

    # merge touching only the low range: 3 files survive untouched
    before = set(minilake._live_files(path))
    updates = spark.range(5).withColumn("v", F.lit(-1).cast("long"))
    minilake.merge_upsert_lake(spark, updates, path, "id")
    after = set(minilake._live_files(path))
    assert len(before & after) == 3  # untouched files carried by name
    snap = minilake.read_snapshot(spark, path)
    assert snap.count() == 1000
    assert snap.filter(F.col("v") == -1).count() == 5
    assert snap.filter((F.col("id") < 5) & (F.col("v") != -1)).count() == 0
    # merge commit carries zone maps too → skipping still works
    _, n_read2, n_skipped2 = minilake.scan_pruned(spark, path, "id", 900, 950)
    assert n_read2 == 1 and n_skipped2 >= 3


def test_minilake_zorder_layout_skips_in_both_dimensions(spark, tmp_path):
    """Layout × zone maps: a LINEAR sort gives tight zones on its sort
    column only (box predicate on the other column skips nothing); the
    Z-ORDER layout gives usably tight zones on BOTH, so the same 2-D
    box skips most files — the OPTIMIZE ZORDER BY payoff, measured
    from the commit log alone."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.functions.scale import (
        zorder_key_2d,
    )
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    n, files = 4096, 16
    base = (
        spark.range(n)
        .withColumn("x", F.col("id") % 1000)
        .withColumn("y", F.pmod(F.xxhash64("id"), F.lit(1000)))
    )
    ybox = {"y": (0, 99)}  # selective on the NON-sort column

    linear = str(tmp_path / "linear")
    minilake.commit_append(
        base.repartitionByRange(files, "x"), linear, stat_cols=["x", "y"]
    )
    lin_df, lin_read, lin_skip = minilake.scan_pruned_multi(
        spark, linear, ybox
    )

    zord = str(tmp_path / "zord")
    zkey = zorder_key_2d(F.col("x"), F.col("y"), 0, 1000, 0, 1000)
    minilake.commit_append(
        base.withColumn("z", zkey).repartitionByRange(files, "z").drop("z"),
        zord,
        stat_cols=["x", "y"],
    )
    z_df, z_read, z_skip = minilake.scan_pruned_multi(spark, zord, ybox)

    # identical answers, very different file counts
    assert sorted(map(tuple, lin_df.collect())) == sorted(map(tuple, z_df.collect()))
    assert lin_skip + lin_read == z_skip + z_read == files
    # linear-by-x: y is unclustered → every file's y-zone spans the
    # predicate → zero skipping.  z-order: y participates in the key →
    # most files' y-zones miss the 10% band.
    assert lin_skip == 0
    assert z_skip > files // 2
    # and the 2-D box stays cheap on the z layout
    _, z2_read, _ = minilake.scan_pruned_multi(
        spark, zord, {"x": (0, 99), "y": (0, 99)}
    )
    assert z2_read <= files // 2


def test_minilake_checkpoint_bounds_log_replay(spark, tmp_path, monkeypatch):
    """Delta's checkpoint rule: every N commits the folded state is
    written next to the log, and readers fold checkpoint + tail instead
    of replaying from version 0 — snapshot-construction cost is O(tail),
    not O(history).  Correctness is unchanged for current reads, time
    travel BEFORE the checkpoint, and torn checkpoint files."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    monkeypatch.setattr(minilake, "_CHECKPOINT_EVERY", 5)
    path = str(tmp_path / "ck_lake")
    for i in range(12):
        minilake.commit_append(
            spark.range(i * 10, (i + 1) * 10).withColumn("v", F.col("id") % 3),
            path,
        )

    ld = os.path.join(path, "_log")
    cks = sorted(f for f in os.listdir(ld) if f.endswith(".checkpoint.json"))
    assert [int(f[:-16]) for f in cks] == [5, 10]
    assert minilake.read_snapshot(spark, path).count() == 120

    # a fresh fold reads ONLY the commits after the newest checkpoint
    seen = []
    orig = minilake._read_commit

    def counting(p, v):
        seen.append(v)
        return orig(p, v)

    monkeypatch.setattr(minilake, "_read_commit", counting)
    state = minilake._fold_state(path)
    assert set(seen) == {11}
    monkeypatch.setattr(minilake, "_read_commit", orig)

    # the checkpointed fold equals a from-scratch fold
    monkeypatch.setattr(minilake, "_latest_checkpoint", lambda *a, **k: None)
    scratch = minilake._fold_state(path)
    assert state["live"] == scratch["live"]
    assert state["stream_batch_ids"] == scratch["stream_batch_ids"]
    monkeypatch.undo()
    monkeypatch.setattr(minilake, "_CHECKPOINT_EVERY", 5)

    # time travel to a version before any checkpoint still folds right
    assert minilake.read_snapshot(spark, path, version=3).count() == 40

    # a torn checkpoint is skipped, never fatal: readers fall back
    torn = os.path.join(ld, minilake._CKPT_FMT.format(11))
    with open(torn, "w") as f:
        f.write('{"version": 11')  # truncated json
    assert minilake._fold_state(path)["live"] == scratch["live"]
    assert minilake.read_snapshot(spark, path).count() == 120


def test_minilake_checkpoint_carries_stream_ids(spark, tmp_path, monkeypatch):
    """The exactly-once stream-batch id set survives checkpoint folding:
    a replayed micro-batch is still a no-op when its commit is only
    reachable through the checkpoint."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    monkeypatch.setattr(minilake, "_CHECKPOINT_EVERY", 5)
    path = str(tmp_path / "ck_stream_lake")
    df = spark.range(4).withColumn("v", F.lit(1))
    for b in range(6):
        assert minilake.commit_stream_batch(df, path, b) is not None
    assert os.path.exists(
        os.path.join(path, "_log", minilake._CKPT_FMT.format(5))
    )
    assert minilake.committed_stream_batches(path) == set(range(6))
    # batch 2's commit is inside the checkpointed prefix — replay no-ops
    assert minilake.commit_stream_batch(df, path, 2) is None
    assert minilake.read_snapshot(spark, path).count() == 24


def test_minilake_delete_where_prunes_files(spark, tmp_path):
    """File-pruned DELETE: only files whose key zone can contain the
    predicate are rewritten; the rest keep their names in the log.  The
    pre-delete snapshot stays time-travelable, incremental readers are
    told to re-sync, and a rewrite that comes back empty commits no
    zero-row parquet."""
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "del_lake")
    base = spark.range(1000).withColumn("v", F.col("id") % 7)
    minilake.commit_append(
        base.repartitionByRange(10, "id"), path, stat_cols=["id"]
    )
    before = minilake._live_files(path)

    minilake.delete_where(spark, path, "id", 100, 199)
    after = minilake._live_files(path)
    # zone maps proved most files untouched — byte-identical, same names
    assert len(before & after) >= 7
    snap = minilake.read_snapshot(spark, path)
    assert snap.count() == 900
    assert snap.filter(F.col("id").between(100, 199)).count() == 0
    # pre-delete snapshot still readable until vacuum
    assert minilake.read_snapshot(spark, path, version=0).count() == 1000
    # a delete is not an append: incremental consumers must re-sync
    with pytest.raises(ValueError, match="re-sync"):
        minilake.read_changes(spark, path, since_version=0)

    # deleting every remaining row commits add=[] (no zero-row files)
    v = minilake.delete_where(spark, path, "id", -1, 2000)
    h = minilake.history(path)[-1]
    assert h["mode"] == "delete" and h["n_added"] == 0 and h["version"] == v
    assert minilake.read_snapshot(spark, path).count() == 0

    # predicate outside every zone: provable no-op, version unchanged
    assert minilake.delete_where(spark, path, "id", 5000, 6000) == v


def test_minilake_optimize_zorder_upgrades_layout_in_place(spark, tmp_path):
    """OPTIMIZE ZORDER BY as a commit: a table appended linear-by-x
    (y unclustered → zero y-skipping) is rewritten along the Morton
    curve in place — the same 2-D box scan then skips most files, rows
    are unchanged, and the pre-optimize version stays travelable."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "zopt_lake")
    files = 16
    base = (
        spark.range(4000)
        .withColumn("x", (F.col("id") % 1000).cast("double"))
        .withColumn("y", F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double"))
        .drop("id")
    )
    minilake.commit_append(
        base.repartitionByRange(files, "x"), path, stat_cols=["x", "y"]
    )
    ybox = {"y": (0.0, 99.0)}
    lin_df, lin_read, lin_skip = minilake.scan_pruned_multi(spark, path, ybox)
    assert lin_skip == 0  # linear-by-x: every file spans all of y

    v = minilake.optimize_zorder(spark, path, "x", "y", n_files=files)
    z_df, z_read, z_skip = minilake.scan_pruned_multi(spark, path, ybox)
    assert z_skip > files // 2
    assert sorted(map(tuple, lin_df.collect())) == sorted(
        map(tuple, z_df.collect())
    )
    assert minilake.read_snapshot(spark, path).count() == 4000
    assert minilake.read_snapshot(spark, path, version=v - 1).count() == 4000
    assert z_read + z_skip == files
    assert minilake.history(path)[-1]["mode"] == "optimize"

    # 2-D box on the z layout touches a minority of files
    _, box_read, _ = minilake.scan_pruned_multi(
        spark, path, {"x": (0.0, 99.0), "y": (0.0, 99.0)}
    )
    assert box_read <= files // 2


def test_minilake_optimize_zorder_aborts_on_concurrent_commit(
    spark, tmp_path, monkeypatch
):
    """A commit that lands between OPTIMIZE's snapshot read and its
    claim must abort the rewrite (never silently drop the concurrent
    rows) and leave no orphan files in the log."""
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "zrace_lake")
    df = spark.range(100).withColumn("x", F.col("id").cast("double")).withColumn(
        "y", F.col("id").cast("double")
    ).drop("id")
    minilake.commit_append(df, path, stat_cols=["x", "y"])

    orig_land = minilake._land_data_files
    raced = {"done": False}

    def land_then_race(frame, p, *args, **kwargs):
        out = orig_land(frame, p, *args, **kwargs)
        if not raced["done"]:
            raced["done"] = True
            # a concurrent writer appends AFTER optimize read its snapshot
            monkeypatch.setattr(minilake, "_land_data_files", orig_land)
            minilake.commit_append(
                spark.range(5).withColumn("x", F.lit(0.0)).withColumn(
                    "y", F.lit(0.0)
                ).drop("id"),
                p,
            )
        return out

    monkeypatch.setattr(minilake, "_land_data_files", land_then_race)
    with pytest.raises(RuntimeError, match="lost a race"):
        minilake.optimize_zorder(spark, path, "x", "y", n_files=4)
    # the concurrent append survived; optimize committed nothing
    assert minilake.read_snapshot(spark, path).count() == 105
    assert [h["mode"] for h in minilake.history(path)] == ["append", "append"]


def test_minilake_restore_is_log_only_and_vacuum_aware(spark, tmp_path):
    """RESTORE TO VERSION: undoing an overwrite is a pure log commit —
    no data files are written or moved, zone maps ride along for the
    re-added files, the restore itself is travelable, and restoring to
    a vacuumed version fails loudly instead of returning a torn
    table."""
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "restore_lake")
    df1 = spark.range(100).withColumn("v", F.col("id") * 2)
    df2 = spark.range(100, 140).withColumn("v", F.col("id") * 2)
    minilake.commit_append(df1, path, stat_cols=["id"])
    v1 = minilake.commit_append(df2, path, stat_cols=["id"])
    minilake.commit_overwrite(spark.range(3).withColumn("v", F.lit(0).cast("long")), path)
    assert minilake.read_snapshot(spark, path).count() == 3

    n_data_files = len(os.listdir(os.path.join(path, "data")))
    rv = minilake.restore(path, v1)
    # log-only: not a single data file added
    assert len(os.listdir(os.path.join(path, "data"))) == n_data_files
    assert minilake.read_snapshot(spark, path).count() == 140
    assert minilake.history(path)[-1]["mode"] == "restore"
    # zone maps survive the round trip: pruned scan still skips
    _, n_read, n_skipped = minilake.scan_pruned(spark, path, "id", 0, 10)
    assert n_skipped > 0
    # the overwrite state is itself still travelable
    assert minilake.read_snapshot(spark, path, version=rv - 1).count() == 3

    # vacuum away history, then try to restore to it: loud failure
    minilake.commit_overwrite(spark.range(5).withColumn("v", F.lit(1).cast("long")), path)
    minilake.vacuum(path, retain_versions=0, min_age_s=0)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        minilake.restore(path, v1)
    assert minilake.read_snapshot(spark, path).count() == 5


def test_minilake_delete_where_keeps_nulls_and_nops_zero_match(spark, tmp_path):
    """Review hardening: NULL-keyed rows survive a range delete (SQL
    three-valued logic), a delete whose zones overlap but whose rows
    don't is a commit-free no-op, the table schema keeps evolved
    columns that live only in untouched files, and compact re-records
    zone maps / empty optimize is a no-op."""
    from pyspark.sql import types as T

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "del2_lake")
    base = spark.createDataFrame(
        [(10, "a"), (20, "b"), (None, "null-row"), (500, "far")],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("s", T.StringType()),
            ]
        ),
    )
    minilake.commit_append(base.coalesce(1), path, stat_cols=["k"])

    # zones overlap [12, 18] (file k-range [10, 500]) but no row matches:
    # commit-free no-op
    v = minilake.delete_where(spark, path, "k", 12, 18)
    assert v == minilake.versions(path)[-1]
    assert len(minilake.versions(path)) == 1
    assert minilake.read_snapshot(spark, path).count() == 4

    # NULL row survives a real delete over its file
    minilake.delete_where(spark, path, "k", 0, 99)
    rows = {r.s for r in minilake.read_snapshot(spark, path).collect()}
    assert rows == {"null-row", "far"}

    # schema keeps evolved column living only in an untouched file
    evolved = spark.createDataFrame(
        [(1000, "w-row", 7.5)], "k long, s string, w double"
    )
    minilake.commit_append(evolved, path, allow_evolution=True, stat_cols=["k"])
    minilake.delete_where(spark, path, "k", 400, 600)  # touches only 'far'
    import json as _json

    latest = minilake._read_commit(path, minilake.versions(path)[-1])
    assert latest["mode"] == "delete"
    names = [f["name"] for f in _json.loads(latest["schema"])["fields"]]
    assert "w" in names
    snap = minilake.read_snapshot(spark, path)
    assert {r.s for r in snap.collect()} == {"null-row", "w-row"}

    # compact re-records zone maps for previously-stat'd columns
    minilake.compact(spark, path, target_mb=512)
    zones = minilake._live_zones(path)
    assert zones and all(z and "k" in z["stats"] for z in zones.values())
    assert {r.s for r in minilake.read_snapshot(spark, path).collect()} == {
        "null-row", "w-row",
    }

    # delete everything, then optimize on the empty snapshot: clean no-op
    minilake.delete_where(spark, path, "k", -10**9, 10**9)
    # (NULL row survives even the full-range delete, per SQL semantics)
    assert {r.s for r in minilake.read_snapshot(spark, path).collect()} == {
        "null-row",
    }
    minilake.commit_overwrite(
        minilake.read_snapshot(spark, path).limit(0), path
    )
    v_now = minilake.versions(path)[-1]
    assert minilake.optimize_zorder(spark, path, "k", "k") == v_now


def test_minilake_delete_where_aborts_on_concurrent_rewrite(
    spark, tmp_path, monkeypatch
):
    """A compact that lands between delete_where's zone read and its
    claim must abort the delete — committing the stale remove list
    would resurrect deleted rows out of the compacted file."""
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "del_race_lake")
    base = spark.range(100).withColumn("v", F.col("id") % 5)
    minilake.commit_append(base.repartition(4), path, stat_cols=["id"])

    orig_land = minilake._land_data_files
    raced = {"done": False}

    def land_then_race(frame, p, *args, **kwargs):
        out = orig_land(frame, p, *args, **kwargs)
        if not raced["done"]:
            raced["done"] = True
            monkeypatch.setattr(minilake, "_land_data_files", orig_land)
            minilake.compact(spark, p, target_mb=512)
        return out

    monkeypatch.setattr(minilake, "_land_data_files", land_then_race)
    with pytest.raises(RuntimeError, match="lost a race"):
        minilake.delete_where(spark, path, "id", 0, 49)
    # nothing deleted, compacted table intact
    assert minilake.read_snapshot(spark, path).count() == 100
    assert minilake.history(path)[-1]["mode"] == "compact"


def test_minilake_concurrent_appends_all_win_distinct_versions(spark, tmp_path):
    """Optimistic concurrency under real contention: 8 threads append
    simultaneously; every commit must land under a DISTINCT version
    (the os.link put-if-absent makes losers retry at the next number)
    and the final snapshot holds every writer's rows exactly once."""
    import concurrent.futures

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    path = str(tmp_path / "conc_lake")
    n_writers = 8

    def append(i: int) -> int:
        df = spark.range(i * 100, (i + 1) * 100).withColumn(
            "writer", F.lit(i)
        )
        return minilake.commit_append(df.coalesce(1), path)

    with concurrent.futures.ThreadPoolExecutor(max_workers=n_writers) as ex:
        got = sorted(ex.map(append, range(n_writers)))

    assert got == list(range(n_writers))  # distinct, gapless versions
    assert minilake.versions(path) == got
    snap = minilake.read_snapshot(spark, path)
    assert snap.count() == n_writers * 100
    assert snap.select("id").distinct().count() == n_writers * 100
    per_writer = {
        r.writer: r.n
        for r in snap.groupBy("writer").agg(F.count("*").alias("n")).collect()
    }
    assert per_writer == {i: 100 for i in range(n_writers)}


def test_minilake_describe_detail_reads_only_the_log(spark, tmp_path, monkeypatch):
    """DESCRIBE DETAIL reports the operational vitals (files, bytes,
    versions, checkpoint, stream batches) from the log alone."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        minilake,
    )

    monkeypatch.setattr(minilake, "_CHECKPOINT_EVERY", 2)
    path = str(tmp_path / "detail_lake")
    df = spark.range(50).withColumn("v", F.col("id"))
    minilake.commit_append(df.coalesce(1), path)
    minilake.commit_append(df.coalesce(1), path)
    minilake.commit_stream_batch(df.coalesce(1), path, 0)

    d = minilake.describe_detail(path)
    assert d["version"] == 2 and d["num_commits"] == 3
    assert d["checkpoint_version"] == 2
    assert d["num_live_files"] == 3 and d["size_bytes"] > 0
    assert d["num_stream_batches"] == 1
    assert '"v"' in d["schema"]
