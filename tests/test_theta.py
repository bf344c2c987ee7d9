"""Theta-sketch NDV statistics (`apache-datasketches-theta-v1` Puffin
blobs + the Iceberg `statistics` registration).  Byte-parity with the
Java library is untestable offline (no datasketches wheel); these pin
the published v3 compact layout field-by-field, the estimator's
accuracy, the KMV merge identity the distributed scan relies on, and
the end-to-end register/read path."""

from __future__ import annotations

import os
import struct

import pytest

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    iceberg as ib,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    theta,
)


def test_murmur3_x64_128_determinism_and_spread():
    h1a = theta.murmur3_x64_128(b"hello", 0)
    assert h1a == theta.murmur3_x64_128(b"hello", 0)
    assert h1a != theta.murmur3_x64_128(b"hello", 1)
    assert h1a != theta.murmur3_x64_128(b"hellp", 0)
    # block + tail paths both covered
    long_msg = b"The quick brown fox jumps over the lazy dog"
    h = theta.murmur3_x64_128(long_msg, 9001)
    assert all(0 <= x < (1 << 64) for x in h)
    # 1-bit input flips cascade (avalanche sanity: >20 of 64 bits)
    a = theta.murmur3_x64_128(b"\x00" * 16, 0)[0]
    b = theta.murmur3_x64_128(b"\x01" + b"\x00" * 15, 0)[0]
    assert bin(a ^ b).count("1") > 20


def test_compact_layout_fields_pinned():
    """The serialized bytes follow the published v3 compact layout:
    preamble byte meanings, flags, seed hash, exact vs estimation
    preamble length, ascending retained hashes."""
    hs = [theta.hash63(struct.pack("<q", i)) for i in range(10)]
    buf = theta.serialize_compact(hs, k=4096)
    pre, ver, fam, _a, _b, flags, sh = struct.unpack_from("<BBBBBBH", buf, 0)
    assert (pre, ver, fam) == (2, 3, 3)  # exact mode, serv3, COMPACT
    assert flags == 2 | 8 | 16  # READ_ONLY | COMPACT | ORDERED
    assert sh == theta.seed_hash(9001)
    cur, p = struct.unpack_from("<if", buf, 8)
    assert cur == 10 and p == 1.0
    got = list(struct.unpack_from("<10Q", buf, 16))
    assert got == sorted(set(hs))
    # estimation mode: k+1th hash becomes theta, preamble grows
    many = [theta.hash63(struct.pack("<q", i)) for i in range(5000)]
    buf2 = theta.serialize_compact(many, k=64)
    pre2 = buf2[0]
    assert pre2 == 3
    (th,) = struct.unpack_from("<Q", buf2, 16)
    assert th == sorted(set(many))[64]
    sk = theta.deserialize_compact(buf2)
    assert len(sk["hashes"]) == 64 and max(sk["hashes"]) < sk["theta"]
    # empty sketch
    sk0 = theta.deserialize_compact(theta.serialize_compact([], k=64))
    assert sk0["empty"] and theta.estimate(theta.serialize_compact([])) == 0.0


def test_estimator_accuracy_and_merge():
    n = 100_000
    hs = [theta.hash63(struct.pack("<q", i)) for i in range(n)]
    buf = theta.serialize_compact(hs, k=4096)
    est = theta.estimate(buf)
    assert abs(est - n) / n < 0.06  # ~3.8 sigma at lgK=12
    # KMV merge identity: union of disjoint halves ~= whole
    h1 = [theta.hash63(struct.pack("<q", i)) for i in range(0, n, 2)]
    h2 = [theta.hash63(struct.pack("<q", i)) for i in range(1, n, 2)]
    m = theta.merge(
        [
            theta.serialize_compact(h1, k=4096),
            theta.serialize_compact(h2, k=4096),
        ],
        k=4096,
    )
    assert abs(theta.estimate(m) - n) / n < 0.08
    # the distributed-scan identity: global (k+1)-smallest is a subset
    # of the union of per-partition (k+1)-smallest
    parts = [hs[i::8] for i in range(8)]
    cand = set()
    for prt in parts:
        cand.update(sorted(set(prt))[: 4096 + 1])
    assert set(sorted(set(hs))[: 4096 + 1]) <= cand


def test_refusals():
    buf = bytearray(theta.serialize_compact([1, 2, 3]))
    buf[1] = 2  # serial version
    with pytest.raises(ValueError, match="serial version"):
        theta.deserialize_compact(bytes(buf))
    with pytest.raises(ValueError, match="seed hash"):
        theta.deserialize_compact(
            theta.serialize_compact([1, 2, 3]), seed=123
        )
    with pytest.raises(ValueError, match="hashes must be"):
        theta.serialize_compact([0])


def test_iceberg_table_stats_end_to_end(spark, tmp_path):
    """write_iceberg_table_stats + read_iceberg_ndv: low-cardinality
    columns estimate EXACTLY (below k the sketch is lossless),
    high-cardinality within the estimator's band; the registration
    replaces per snapshot, refuses stale serving, and unsupported
    column types refuse loudly."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "ndv")
    df = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("lang"),
        (F.col("id") % 100).alias("bucketed"),
    )
    ib.write_iceberg(df.repartition(8), path)
    rel = ib.write_iceberg_table_stats(spark, path)
    assert os.path.exists(os.path.join(path, rel))
    ndv = ib.read_iceberg_ndv(path)
    assert ndv["lang"] == 7
    assert ndv["bucketed"] == 100
    assert abs(ndv["doc_id"] - 20000) / 20000 < 0.06
    # registration is per snapshot: a new append invalidates serving
    ib.write_iceberg(
        df.withColumn("doc_id", F.col("doc_id") + 20000), path,
        mode="append",
    )
    with pytest.raises(ValueError, match="no statistics registered"):
        ib.read_iceberg_ndv(path)
    ib.write_iceberg_table_stats(spark, path)
    ndv2 = ib.read_iceberg_ndv(path)
    assert abs(ndv2["doc_id"] - 40000) / 40000 < 0.06
    meta = ib.current_metadata(path)
    regs = meta.get("statistics") or []
    assert len(regs) == 2  # one per snapshot, replaced not duplicated
    blob_meta = regs[-1]["blob-metadata"]
    assert all(
        b["type"] == "apache-datasketches-theta-v1" for b in blob_meta
    )
    assert all("ndv" in (b.get("properties") or {}) for b in blob_meta)
    with pytest.raises(ValueError, match="no column"):
        ib.write_iceberg_table_stats(spark, path, columns=["missing"])
    # unsupported canonicalization refuses loudly
    p2 = str(tmp_path / "dbl")
    ib.write_iceberg(
        df.withColumn("score", F.col("doc_id") * 1.5).select(
            "doc_id", "score"
        ),
        p2,
    )
    with pytest.raises(ValueError, match="theta NDV tier"):
        ib.write_iceberg_table_stats(spark, p2, columns=["score"])
    # default column pick skips the double silently
    ib.write_iceberg_table_stats(spark, p2)
    assert set(ib.read_iceberg_ndv(p2)) == {"doc_id"}


def test_iceberg_table_stats_date_column(spark, tmp_path):
    """Date columns are in _THETA_TYPES (auto-selected by default) and
    canonicalize to the documented days-since-epoch int — Arrow hands
    DateType back as datetime.date, which int() cannot take, so this
    used to crash the mapInPandas worker on ANY table with a date."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "ndv_date")
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.date_add(
            F.lit("2020-01-01").cast("date"), (F.col("id") % 31).cast("int")
        ).alias("day"),
    )
    ib.write_iceberg(df.repartition(4), path)
    ib.write_iceberg_table_stats(spark, path)
    ndv = ib.read_iceberg_ndv(path)
    assert ndv["day"] == 31  # below k: lossless
    assert ndv["doc_id"] == 500
    # the canonical form is the days-int: the registered sketch holds
    # exactly the hashes of struct.pack('<q', days)
    import datetime as _dt

    expect = {
        theta.hash63(
            struct.pack(
                "<q",
                (_dt.date(2020, 1, 1) - _dt.date(1970, 1, 1)).days + i,
            )
        )
        for i in range(31)
    }
    meta = ib.current_metadata(path)
    reg = (meta.get("statistics") or [])[-1]
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        puffin,
    )

    fields = {f["name"]: f["id"] for f in ib._schema_of(meta)}
    local = os.path.join(path, "metadata", os.path.basename(
        reg["statistics-path"]
    ))
    footer = puffin.read_puffin_footer(local)
    bm = [
        b for b in footer["blobs"] if b["fields"] == [fields["day"]]
    ][0]
    sk = theta.deserialize_compact(
        puffin.read_blob(local, bm["offset"], bm["length"])
    )
    assert set(sk["hashes"]) == expect


def test_iceberg_table_stats_decimal_column(spark, tmp_path):
    """Decimal columns join the NDV tier (r13): canonicalized as the
    minimal two's-complement unscaled bytes (Appendix B's bucket form),
    auto-selected by default, exact below k."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    path = str(tmp_path / "ndv_dec")
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") % 40) / 4).cast("decimal(8,2)").alias("amt"),
    )
    ib.write_iceberg(df.repartition(4), path)
    ib.write_iceberg_table_stats(spark, path)
    ndv = ib.read_iceberg_ndv(path)
    assert ndv["amt"] == 40
    assert ndv["doc_id"] == 2000
    # the canonical hash form is pinned: unscaled minimal bytes
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        avrotiny,
        puffin,
    )

    meta = ib.current_metadata(path)
    reg = (meta.get("statistics") or [])[-1]
    fields = {f["name"]: f["id"] for f in ib._schema_of(meta)}
    local = os.path.join(
        path, "metadata", os.path.basename(reg["statistics-path"])
    )
    footer = puffin.read_puffin_footer(local)
    bm = [b for b in footer["blobs"] if b["fields"] == [fields["amt"]]][0]
    sk = theta.deserialize_compact(
        puffin.read_blob(local, bm["offset"], bm["length"])
    )
    expect = {
        theta.hash63(
            avrotiny.min_signed_bytes(
                int(Decimal(i % 40).scaleb(2) / 4)
            )
        )
        for i in range(40)
    }
    assert set(sk["hashes"]) == expect


def test_incremental_ndv_maintenance(spark, tmp_path):
    """update_iceberg_table_stats refreshes stats by scanning ONLY the
    appended files and unioning sketches — the result is IDENTICAL to
    a from-scratch rebuild (the KMV union retains exactly the hashes
    the rebuild would), and non-append history refuses loudly."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "incndv")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("doc_id"),
        (F.col("id") % 50).cast("string").alias("lang"),
    )
    ib.write_iceberg(mk(0, 30000).repartition(4), path)
    ib.write_iceberg_table_stats(spark, path)
    # two appends: overlapping + fresh values
    ib.write_iceberg(mk(20000, 45000).repartition(4), path, mode="append")
    ib.write_iceberg(mk(45000, 60000).repartition(4), path, mode="append")
    rel = ib.update_iceberg_table_stats(spark, path)
    assert os.path.exists(os.path.join(path, rel))
    inc = ib.read_iceberg_ndv(path)
    assert inc["lang"] == 50  # below k: lossless through the union
    # pinned EQUAL to the from-scratch rebuild, not merely within band
    rel_full = ib.write_iceberg_table_stats(spark, path)
    full = ib.read_iceberg_ndv(path)
    assert inc == full
    assert abs(inc["doc_id"] - 60000) / 60000 < 0.06
    # no-op when stats already cover the current snapshot: returns the
    # existing registration instead of rescanning
    rel2 = ib.update_iceberg_table_stats(spark, path)
    assert rel2 == rel_full
    # a DELETE in between makes union maintenance wrong — refuse
    ib.delete_where_iceberg(spark, path, "doc_id", 0, 99)
    with pytest.raises(ValueError, match="cannot shrink"):
        ib.update_iceberg_table_stats(spark, path)
    # rebuild clears the staleness; further appends update again
    ib.write_iceberg_table_stats(spark, path)
    ib.write_iceberg(mk(60000, 61000).repartition(2), path, mode="append")
    ib.update_iceberg_table_stats(spark, path)
    ndv = ib.read_iceberg_ndv(path)
    assert abs(ndv["doc_id"] - 60900) / 60900 < 0.06
    # no registration at all → refuse toward the full build
    p2 = str(tmp_path / "nostats")
    ib.write_iceberg(mk(0, 10), p2)
    with pytest.raises(ValueError, match="no statistics registered"):
        ib.update_iceberg_table_stats(spark, p2)


def test_merge_keeps_estimation_theta():
    """Union of an estimation-mode sketch with a tiny exact one stays
    in estimation mode under the pooled minimum theta — few surviving
    hashes must not silently reset theta to 2^63 (that would
    overestimate confidence and underestimate NDV error)."""
    big = theta.serialize_compact(
        [theta.hash63(struct.pack("<q", i)) for i in range(50_000)], k=64
    )
    small = theta.serialize_compact(
        [theta.hash63(struct.pack("<q", i)) for i in range(3)], k=64
    )
    m = theta.merge([big, small], k=64)
    sk = theta.deserialize_compact(m)
    assert sk["theta"] <= theta.deserialize_compact(big)["theta"]
    assert sk["theta"] <= theta._MAX63
    est = theta.estimate(m)
    assert abs(est - 50_000) / 50_000 < 0.5  # lgK=6 is coarse; sane band
