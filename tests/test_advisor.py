"""Statistics-driven join planning (sources/advisor.py): the r13
"consume the statistics" tier — registered NDV sketches, Iceberg
manifest record counts, and Delta add-action stats read BACK into a
broadcast-vs-shuffle decision, with the evidence attached so a plan
review can audit why."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    advisor,
    deltaproto as dp,
    iceberg as ib,
)


def _plan(df) -> str:
    df.collect()  # AQE: final plan only exists after an action
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def fact_dim(spark, tmp_path):
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    ib.write_iceberg(
        spark.range(50_000)
        .select(
            F.col("id").alias("row_id"),
            (F.col("id") % 20).alias("dim_id"),
            (F.col("id") * 3).alias("v"),
        )
        .repartition(4),
        fact,
    )
    ib.write_iceberg(
        spark.range(20).select(
            F.col("id").alias("dim_id"),
            F.concat(F.lit("name_"), F.col("id")).alias("name"),
        ),
        dim,
    )
    ib.write_iceberg_table_stats(spark, fact)
    ib.write_iceberg_table_stats(spark, dim)
    return fact, dim


def test_lake_table_stats_metadata_only(spark, fact_dim):
    fact, dim = fact_dim
    st = advisor.lake_table_stats(spark, fact)
    assert st["format"] == "iceberg"
    assert st["rows"] == 50_000  # manifest record counts, no scan
    assert st["bytes"] > 0
    assert st["ndv"]["dim_id"] == 20  # the registered theta sketch
    assert "iceberg:statistics(theta-ndv)" in st["sources"]
    # a new append stales the NDV registration — size tier still serves
    ib.write_iceberg(
        spark.range(5).select(
            F.col("id").alias("row_id"),
            F.lit(0).alias("dim_id"),
            F.lit(0).alias("v"),
        ),
        fact,
        mode="append",
    )
    st2 = advisor.lake_table_stats(spark, fact)
    assert st2["rows"] == 50_005
    assert st2["ndv"] == {}
    assert "iceberg:statistics(theta-ndv)" not in st2["sources"]


def test_advised_join_broadcasts_where_spark_shuffled(spark, fact_dim):
    """THE point of the advisor: with Spark's own auto-broadcast
    unavailable (at 100 TB the lake read plan's sizeInBytes estimate
    exceeds the ceiling), the plain join sort-merges — two full
    shuffles — while the advised join reads the manifest byte counts
    and broadcasts the dimension."""
    fact, dim = fact_dim
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = ib.read_iceberg(spark, fact).join(
            ib.read_iceberg(spark, dim), on="dim_id"
        )
        assert "SortMergeJoin" in _plan(plain)
        joined, dec = advisor.lake_join(spark, fact, dim, on="dim_id")
        assert dec["broadcast"] == "right"
        assert "BroadcastHashJoin" in _plan(joined)
        assert joined.count() == 50_000
        # the decision is TRACED to the stats it read
        ev = dec["evidence"]
        assert ev["right"]["rows"] == 20
        assert ev["right"]["bytes"] > 0
        assert "iceberg:manifest-entries" in ev["right"]["sources"]
        assert ev["right_key_ndv"] == 20
        assert str(ev["right"]["bytes"]) in dec["reason"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_advise_join_shuffle_and_skew_flag(spark, fact_dim):
    fact, dim = fact_dim
    fs = advisor.lake_table_stats(spark, fact)
    ds = advisor.lake_table_stats(spark, dim)
    # neither fits a 1-byte threshold: shuffle; the fact side's key NDV
    # (20) is tiny vs its 50k rows -> hot-key skew flag
    dec = advisor.advise_join(fs, ds, "dim_id", broadcast_threshold_bytes=1)
    assert dec["broadcast"] is None
    assert dec["skew_risk"] is True
    assert "SALT" in dec["reason"]
    # both fit: the smaller side broadcasts
    dec2 = advisor.advise_join(
        fs, ds, "dim_id", broadcast_threshold_bytes=1 << 40
    )
    assert dec2["broadcast"] == "right"


def test_lake_join_delta_side(spark, tmp_path):
    """The advisor reads Delta add-action stats too: an Iceberg fact
    joined to a small Delta dimension broadcasts on Delta metadata."""
    fact = str(tmp_path / "ifact")
    dim = str(tmp_path / "ddim")
    ib.write_iceberg(
        spark.range(10_000)
        .select(
            F.col("id").alias("row_id"), (F.col("id") % 7).alias("dim_id")
        )
        .repartition(2),
        fact,
    )
    dp.write_delta(
        spark.range(7)
        .select(
            F.col("id").alias("dim_id"),
            F.concat(F.lit("d"), F.col("id")).alias("name"),
        )
        .coalesce(1),
        dim,
    )
    st = advisor.lake_table_stats(spark, dim)
    assert st["format"] == "delta"
    assert st["rows"] == 7  # from the add-action stats JSON, no scan
    assert "delta:add-stats" in st["sources"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined, dec = advisor.lake_join(spark, fact, dim, on="dim_id")
        assert dec["broadcast"] == "right"
        assert "BroadcastHashJoin" in _plan(joined)
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_not_a_lake_table_refuses(spark, tmp_path):
    with pytest.raises(ValueError, match="neither an Iceberg nor a Delta"):
        advisor.lake_table_stats(spark, str(tmp_path / "nope"))


def test_skew_advice_executes_salted_join(spark, fact_dim):
    """r13: the skew flag is EXECUTED, not just reported — with no
    broadcastable side, the skewed fact salts into deterministic
    sub-keys and the dimension replicates across them; the result is
    row-exact vs a plain join and the shuffle keys on (key, salt)."""
    fact, dim = fact_dim
    plain = (
        advisor._read_lake(spark, fact)
        .join(advisor._read_lake(spark, dim), on="dim_id", how="inner")
    )
    expected = sorted(
        (r["row_id"], r["name"]) for r in plain.collect()
    )
    joined, dec = advisor.lake_join(
        spark, fact, dim, on="dim_id", broadcast_threshold_bytes=1,
        salt_buckets=8,
    )
    assert dec["broadcast"] is None
    assert dec["skew_risk"] is True
    assert dec["salted"] == 8 and dec["salted_side"] == "left"
    got = sorted((r["row_id"], r["name"]) for r in joined.collect())
    assert got == expected
    assert "_ib_salt" not in joined.columns
    plan = _plan(joined)
    assert "_ib_salt" in plan  # the shuffle keys carry the salt


def test_salted_left_join_preserved_side_row_exact(spark, fact_dim):
    """r14: a LEFT join whose preserved side is the skewed probe
    EXECUTES the salting — pinned row-exact against the plain left
    join (unmatched probe rows null-extend exactly once, matched ones
    meet each build row exactly once)."""
    fact, dim = fact_dim
    left = advisor._read_lake(spark, fact).withColumn(
        "dim_id",
        F.when(F.col("row_id") % 100 == 0, F.lit(9999)).otherwise(
            F.col("dim_id")
        ),
    )
    # rebuild the fixture with unmatched keys so the outer side matters
    import os

    fact2 = os.path.join(os.path.dirname(fact), "fact2")
    ib.write_iceberg(left.repartition(4), fact2)
    ib.write_iceberg_table_stats(spark, fact2)
    plain = sorted(
        tuple(r)
        for r in advisor._read_lake(spark, fact2)
        .join(advisor._read_lake(spark, dim), on="dim_id", how="left")
        .collect()
    )
    joined, dec = advisor.lake_join(
        spark, fact2, dim, on="dim_id", how="left",
        broadcast_threshold_bytes=1, salt_buckets=8,
    )
    assert dec["salted"] == 8 and dec["salted_side"] == "left"
    assert "EXECUTED (left)" in dec["reason"]
    got = sorted(tuple(r) for r in joined.collect())
    assert got == plain
    assert joined.filter(F.col("name").isNull()).count() == 500
    # a left join with skew on the NON-preserved side falls back with
    # the preserved-side rule recorded, still row-exact
    j2, dec2 = advisor.lake_join(
        spark, dim, fact2, on="dim_id", how="left",
        broadcast_threshold_bytes=1,
    )
    assert dec2["salted"] == 0 and "preserved side" in dec2["reason"]
    assert j2.count() == 49_500


def test_composite_key_advice_and_salted_join(spark, tmp_path):
    """r14 composite keys: NDV judges on the max per-column sketch (a
    tuple-NDV lower bound, recorded in the evidence) and the salted
    join keys on the full tuple — row-exact vs the plain join."""
    fact = str(tmp_path / "cfact")
    dim = str(tmp_path / "cdim")
    ib.write_iceberg(
        spark.range(40_000)
        .select(
            F.col("id").alias("row_id"),
            (F.col("id") % 4).alias("k1"),
            (F.col("id") % 5).alias("k2"),
        )
        .repartition(4),
        fact,
    )
    ib.write_iceberg(
        spark.range(20).select(
            (F.col("id") % 4).alias("k1"),
            (F.col("id") % 5).alias("k2"),
            F.concat(F.lit("d"), F.col("id")).alias("name"),
        ),
        dim,
    )
    for p in (fact, dim):
        ib.write_iceberg_table_stats(spark, p)
    fs = advisor.lake_table_stats(spark, fact)
    ds = advisor.lake_table_stats(spark, dim)
    dec = advisor.advise_join(
        fs, ds, ["k1", "k2"], broadcast_threshold_bytes=1
    )
    assert dec["broadcast"] is None and dec["skew_risk"] is True
    assert dec["evidence"]["key_ndv_is_lower_bound"] is True
    assert dec["evidence"]["left_key_ndv"] == 5  # max(ndv k1, ndv k2)
    plain = sorted(
        tuple(r)
        for r in advisor._read_lake(spark, fact)
        .join(advisor._read_lake(spark, dim), on=["k1", "k2"])
        .collect()
    )
    joined, jdec = advisor.lake_join(
        spark, fact, dim, on=["k1", "k2"], broadcast_threshold_bytes=1,
        salt_buckets=4,
    )
    assert jdec["salted"] == 4
    assert sorted(tuple(r) for r in joined.collect()) == plain
