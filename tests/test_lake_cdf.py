"""Change-data-feed across rewrites (minilake.read_changes):

- plain row feed and the format('minilake') stream source SKIP pure
  rewrites (compact/optimize) — routine maintenance no longer breaks
  incremental consumers;
- change_feed=True emits exact insert/delete rows for append, DELETE
  (via the commit's recorded predicate), RESTORE, and OVERWRITE —
  verified by APPLYING the feed and comparing with the real snapshot;
- MERGE commits still raise (not row-splittable from the log).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    minilake,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.streaming import (
    jobs,
)


def _df(spark, lo, hi, tag=0):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") * 10 + tag).cast("bigint").alias("v"),
    )


def _apply_feed(feed_df):
    """Replay a CDF feed in commit order onto an empty multiset."""
    rows = [
        ((r["doc_id"], r["v"]), r["_change_type"], r["_commit_version"])
        for r in feed_df.collect()
    ]
    state: list = []
    for key, ctype, _v in sorted(rows, key=lambda t: t[2]):
        if ctype == "insert":
            state.append(key)
        else:
            state.remove(key)
    return sorted(state)


def test_plain_feed_skips_compaction(spark, tmp_path):
    path = str(tmp_path / "lake")
    minilake.commit_append(_df(spark, 0, 50), path)
    v1 = minilake.commit_append(_df(spark, 50, 80), path)
    minilake.compact(spark, path)
    minilake.commit_append(_df(spark, 80, 90), path)
    # consumer synced through v1: sees ONLY the post-compact append
    got = sorted(
        r["doc_id"]
        for r in minilake.read_changes(spark, path, since_version=v1).collect()
    )
    assert got == list(range(80, 90))
    # a full-history plain feed over appends+compact = all appended rows
    allrows = minilake.read_changes(spark, path, since_version=-1)
    assert allrows.count() == 90


def test_change_feed_apply_parity_delete_restore_overwrite(spark, tmp_path):
    """The acid test: replaying the feed reproduces the live snapshot
    exactly through append → delete → compact → overwrite → restore."""
    path = str(tmp_path / "lake")
    minilake.commit_append(
        _df(spark, 0, 100).repartitionByRange(4, "doc_id"),
        path,
        stat_cols=["doc_id"],
    )
    minilake.delete_where(spark, path, "doc_id", 20, 39)
    minilake.compact(spark, path)
    v_pre_over = minilake.versions(path)[-1]
    minilake.commit_overwrite(_df(spark, 500, 520, tag=1), path)
    minilake.restore(path, v_pre_over)

    feed = minilake.read_changes(spark, path, since_version=-1, change_feed=True)
    applied = _apply_feed(feed)
    snap = sorted(
        (r["doc_id"], r["v"])
        for r in minilake.read_snapshot(spark, path).collect()
    )
    assert applied == snap
    # the delete leg is exactly the predicate rows, tagged per commit
    deletes = feed.filter(
        (F.col("_change_type") == "delete") & (F.col("_commit_version") == 1)
    )
    assert sorted(r["doc_id"] for r in deletes.collect()) == list(range(20, 40))
    # compaction contributed nothing
    compact_vs = [
        h["version"] for h in minilake.history(path) if h["mode"] == "compact"
    ]
    assert compact_vs and feed.filter(
        F.col("_commit_version").isin(compact_vs)
    ).count() == 0


def test_change_feed_merge_still_raises(spark, tmp_path):
    path = str(tmp_path / "lake")
    minilake.commit_append(_df(spark, 0, 50), path, stat_cols=["doc_id"])
    minilake.merge_upsert_lake(spark, _df(spark, 10, 15, tag=3), path, "doc_id")
    with pytest.raises(ValueError, match="merge"):
        minilake.read_changes(
            spark, path, since_version=-1, change_feed=True
        ).collect()


def test_stream_source_survives_interleaved_optimize(spark, sf_dir, tmp_path):
    """format('minilake') stream: append → drain → OPTIMIZE/compact →
    append → drain again.  The second drain skips the rewrite commits
    and delivers ONLY the new append — parity with the batch rows,
    registry ingest keeps working (the r7 cross-quadrant pipeline no
    longer breaks on routine maintenance)."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        lakesource,
    )

    lakesource.register(spark)
    path = str(tmp_path / "lake")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    minilake.commit_append(_df(spark, 0, 40), path, stat_cols=["doc_id"])

    def drain():
        q = (
            spark.readStream.format("minilake")
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

    minilake.compact(spark, path)
    minilake.optimize_zorder(spark, path, "doc_id", "v", n_files=2)
    minilake.commit_append(_df(spark, 40, 55), path)
    drain()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(55))  # new rows once, rewrites never re-sent


def test_registry_ingest_survives_optimize(spark, sf_dir, tmp_path):
    """The incremental dedup registry fed from a minilake stream keeps
    exactly-once row delivery when an OPTIMIZE lands between drains."""
    import glob

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        lakesource,
        load_table,
    )

    lakesource.register(spark)
    path = str(tmp_path / "lake")
    reg = str(tmp_path / "registry")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    minilake.commit_append(half, path, stat_cols=["doc_id"])

    def drain():
        stream = spark.readStream.format("minilake").load(path)
        q = (
            stream.writeStream.foreachBatch(
                lambda b, bid: b.write.mode("overwrite").parquet(
                    f"{reg}/batch={bid}"
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    minilake.compact(spark, path)
    minilake.commit_append(rest, path)
    drain()  # must not raise on the compact commit
    landed = spark.read.parquet(*sorted(glob.glob(f"{reg}/batch=*")))
    assert landed.count() == docs.count()
    assert landed.select("doc_id").distinct().count() == docs.count()


def test_stream_change_feed_option(spark, tmp_path):
    """format('minilake') with readChangeFeed=true streams the CHANGE
    FEED: inserts for appends, exact delete rows for DV and predicate
    deletes, nothing for compaction — exactly-once across drains with
    a persistent checkpoint."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        lakesource,
    )

    lakesource.register(spark)
    path = str(tmp_path / "lake")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    minilake.commit_append(
        _df(spark, 0, 60).repartitionByRange(3, "doc_id"),
        path,
        stat_cols=["doc_id"],
    )

    def drain():
        q = (
            spark.readStream.format("minilake")
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

    minilake.delete_where(spark, path, "doc_id", 10, 19, strategy="dv")
    minilake.delete_where(spark, path, "doc_id", 40, 44)  # rewrite path
    minilake.compact(spark, path)
    drain()
    feed = spark.read.parquet(out)
    deletes = feed.filter(F.col("_change_type") == "delete")
    assert sorted(r["doc_id"] for r in deletes.collect()) == list(
        range(10, 20)
    ) + list(range(40, 45))
    # compaction contributed nothing; replay state matches the snapshot
    inserts = feed.filter(F.col("_change_type") == "insert")
    assert inserts.count() == 60
    net = {r["doc_id"] for r in inserts.collect()} - {
        r["doc_id"] for r in deletes.collect()
    }
    snap_ids = {
        r["doc_id"] for r in minilake.read_snapshot(spark, path).collect()
    }
    assert net == snap_ids
    # third drain with nothing new: no extra rows
    n = feed.count()
    drain()
    assert spark.read.parquet(out).count() == n
