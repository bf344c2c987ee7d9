"""Concurrency-conflict tests for the minilake commit log.

The optimistic-concurrency windows are deterministic here: every
rewrite op reads its snapshot, lands files, then claims a version with
a claim-time refresh callback.  These tests inject a RACING commit
inside that window (by wrapping `_land_data_files` / `_claim_version`)
and assert the documented conflict rules:

- compact vs delete/overwrite  → compact ABORTS, no resurrection or
  duplication, its orphaned rewrite is unlinked;
- compact vs append            → commutes (the appended file survives);
- merge vs compact             → merge ABORTS (stale remove list);
- restore vs append            → restore's claim-time delta refresh
  removes the racing append, postcondition holds exactly;
- stream sink across drains    → a persisted checkpoint makes a grown
  source deliver NEW batch ids (no silent skip / data loss);
- stream batch schema          → divergent schema rejected at commit.

The 8-writer append stress test (`test_streaming.py`) covers the
append-append race; appends never conflict, so these rewrites are the
cases it cannot reach.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    minilake,
)


def _seed(spark, path, n=200, files=4):
    df = spark.range(n).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") * 7).cast("bigint").alias("v"),
    )
    minilake.commit_append(
        df.repartitionByRange(files, "doc_id"), path, stat_cols=["doc_id"]
    )
    return df


def _rows(spark, path):
    return sorted(
        (r["doc_id"], r["v"])
        for r in minilake.read_snapshot(spark, path).collect()
    )


def test_compact_aborts_on_racing_delete(spark, tmp_path, monkeypatch):
    """A delete that commits inside compact's land→claim window must
    abort the compaction: committing the stale remove list would
    resurrect the deleted rows AND double the kept rows of the file
    the delete rewrote."""
    path = str(tmp_path / "lake")
    _seed(spark, path)

    orig_land = minilake._land_data_files
    raced = {"done": False}

    def racing_land(df, p, *args, **kwargs):
        out = orig_land(df, p, *args, **kwargs)
        if not raced["done"]:
            raced["done"] = True  # guard: delete_where lands files too
            minilake.delete_where(spark, p, "doc_id", 50, 99)
        return out

    monkeypatch.setattr(minilake, "_land_data_files", racing_land)
    with pytest.raises(RuntimeError, match="compact lost a race"):
        minilake.compact(spark, path)
    monkeypatch.setattr(minilake, "_land_data_files", orig_land)

    got = _rows(spark, path)
    want = [(i, i * 7) for i in range(200) if not 50 <= i <= 99]
    assert got == want  # no resurrection, no duplication
    # compact's orphaned rewrite was unlinked, not left for vacuum:
    # every file still on disk is referenced by SOME version (removed
    # files legitimately remain for time travel; true orphans don't)
    referenced = set()
    for v in minilake.versions(path):
        referenced |= minilake._live_files(path, as_of=v)
    on_disk = set(os.listdir(minilake._data_dir(path)))
    assert on_disk == referenced
    # and a clean re-run against the new snapshot succeeds
    minilake.compact(spark, path)
    assert _rows(spark, path) == want


def test_compact_commutes_with_racing_append(spark, tmp_path, monkeypatch):
    """A concurrent APPEND is not a conflict: its file is not in
    compact's remove list, so both commits land and every row survives
    exactly once."""
    path = str(tmp_path / "lake")
    _seed(spark, path)
    extra = spark.range(200, 230).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.col("id") * 7).cast("bigint").alias("v"),
    )

    orig_claim = minilake._claim_version
    raced = {"done": False}

    def racing_claim(p, commit, refresh=None):
        if commit.get("mode") == "compact" and not raced["done"]:
            raced["done"] = True
            minilake.commit_append(extra, p)
        return orig_claim(p, commit, refresh)

    monkeypatch.setattr(minilake, "_claim_version", racing_claim)
    minilake.compact(spark, path)
    monkeypatch.setattr(minilake, "_claim_version", orig_claim)

    assert _rows(spark, path) == [(i, i * 7) for i in range(230)]
    assert minilake.history(path)[-1]["mode"] == "compact"


def test_merge_aborts_on_racing_compact(spark, tmp_path, monkeypatch):
    """merge_upsert_lake computes its touched-file list from a
    pre-claim snapshot; a compaction that commits first invalidates
    every name in it, so the merge must abort instead of committing
    stale removes."""
    path = str(tmp_path / "lake")
    _seed(spark, path)
    updates = spark.range(10, 20).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.lit(-1).cast("bigint").alias("v"),
    )

    orig_claim = minilake._claim_version
    raced = {"done": False}

    def racing_claim(p, commit, refresh=None):
        if commit.get("mode") == "merge" and not raced["done"]:
            raced["done"] = True
            minilake.compact(spark, p)
        return orig_claim(p, commit, refresh)

    monkeypatch.setattr(minilake, "_claim_version", racing_claim)
    with pytest.raises(RuntimeError, match="merge_upsert_lake lost a race"):
        minilake.merge_upsert_lake(spark, updates, path, "doc_id")
    monkeypatch.setattr(minilake, "_claim_version", orig_claim)

    # table is exactly the compacted seed — the merge left no trace
    assert _rows(spark, path) == [(i, i * 7) for i in range(200)]
    referenced = set()
    for v in minilake.versions(path):
        referenced |= minilake._live_files(path, as_of=v)
    assert set(os.listdir(minilake._data_dir(path))) == referenced
    # retry succeeds against the new snapshot
    minilake.merge_upsert_lake(spark, updates, path, "doc_id")
    want = [(i, -1 if 10 <= i <= 19 else i * 7) for i in range(200)]
    assert _rows(spark, path) == want


def test_restore_accounts_for_racing_append(spark, tmp_path, monkeypatch):
    """restore's postcondition is 'the live set becomes exactly the
    target version's'.  Its add/remove deltas are recomputed at claim
    time, so an append that lands between the fold and the claim is
    removed by the restore commit rather than silently surviving."""
    path = str(tmp_path / "lake")
    _seed(spark, path)
    v0 = minilake.versions(path)[-1]
    minilake.commit_append(
        spark.range(500, 510).select(
            F.col("id").cast("bigint").alias("doc_id"),
            F.lit(0).cast("bigint").alias("v"),
        ),
        path,
    )
    extra = spark.range(600, 610).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.lit(1).cast("bigint").alias("v"),
    )

    orig_claim = minilake._claim_version
    raced = {"done": False}

    def racing_claim(p, commit, refresh=None):
        if commit.get("mode") == "restore" and not raced["done"]:
            raced["done"] = True
            minilake.commit_append(extra, p)
        return orig_claim(p, commit, refresh)

    monkeypatch.setattr(minilake, "_claim_version", racing_claim)
    minilake.restore(path, v0)
    monkeypatch.setattr(minilake, "_claim_version", orig_claim)

    assert minilake._live_files(path) == minilake._live_files(path, as_of=v0)
    assert _rows(spark, path) == [(i, i * 7) for i in range(200)]


def test_stream_sink_persisted_checkpoint_survives_source_growth(
    spark, tmp_path
):
    """Exactly-once ACROSS drains: with the checkpoint persisted next
    to the table, a second drain of a GROWN source delivers only the
    new rows under fresh batch ids.  (A throwaway per-drain checkpoint
    restarts ids at 0 — the default single-batch trigger would then
    replay ALL files as an already-committed batch 0 and silently drop
    the new file: data loss.)"""
    src = tmp_path / "src"
    src.mkdir()
    path = str(tmp_path / "lake")
    df1 = spark.range(100).select(F.col("id").alias("doc_id"))
    df1.coalesce(1).write.mode("append").parquet(str(src))

    def drain():
        stream = spark.readStream.schema("doc_id bigint").parquet(str(src))
        minilake.lake_stream_sink(stream, path, timeout_s=120)

    drain()
    assert minilake.read_snapshot(spark, path).count() == 100

    spark.range(100, 130).select(F.col("id").alias("doc_id")).coalesce(
        1
    ).write.mode("append").parquet(str(src))
    drain()
    got = sorted(
        r["doc_id"] for r in minilake.read_snapshot(spark, path).collect()
    )
    assert got == list(range(130))  # the new file was NOT skipped
    # and batch ids are monotonic — the second drain used a fresh id
    assert len(minilake.committed_stream_batches(path)) >= 2

    # unchanged source: a third drain is a pure no-op
    n_versions = len(minilake.versions(path))
    drain()
    assert len(minilake.versions(path)) == n_versions


def test_commit_stream_batch_enforces_schema(spark, tmp_path):
    """foreachBatch streaming commits honor the same write-time schema
    contract as batch appends — a divergent frame is rejected, not
    silently committed into the log."""
    path = str(tmp_path / "lake")
    _seed(spark, path)
    bad = spark.range(5).select(F.col("id").alias("doc_id"))  # missing v
    with pytest.raises(ValueError, match="missing table columns"):
        minilake.commit_stream_batch(bad, path, batch_id=999)
    # nothing landed, nothing committed
    assert 999 not in minilake.committed_stream_batches(path)


def test_vacuum_single_forward_fold(tmp_path, monkeypatch):
    """vacuum builds the referenced set in ONE forward fold: the commit
    log is read O(tail) times total, never O(retained × tail).  Pure
    log-level test — commits are hand-written JSON, data files are
    empty placeholders (vacuum only stats/unlinks them)."""
    path = str(tmp_path / "lake")
    os.makedirs(minilake._data_dir(path))
    monkeypatch.setattr(minilake, "_CHECKPOINT_EVERY", 0)

    def touch(name):
        open(os.path.join(minilake._data_dir(path), name), "w").close()

    live: list[str] = []
    n_commits = 24
    for i in range(n_commits):
        name = f"{uuid.uuid4().hex}.parquet"
        touch(name)
        commit = {"mode": "append", "add": [name], "remove": [], "schema": "{}"}
        if i % 3 == 2 and live:  # periodically rewrite the oldest file
            commit["mode"] = "delete"
            commit["remove"] = [live.pop(0)]
        minilake._claim_version(path, commit)
        live.append(name)

    calls = {"n": 0}
    orig = minilake._read_commit

    def counting(p, v):
        calls["n"] += 1
        return orig(p, v)

    monkeypatch.setattr(minilake, "_read_commit", counting)
    deleted = minilake.vacuum(path, retain_versions=12, min_age_s=0.0)
    assert calls["n"] <= n_commits  # one pass over the log, not per-version
    # correctness: every file live in any retained version survives
    vs = minilake.versions(path)
    referenced = set()
    for v in vs[-13:]:
        referenced |= minilake._live_files(path, as_of=v)
    on_disk = set(os.listdir(minilake._data_dir(path)))
    assert on_disk == referenced
    assert deleted == n_commits - len(referenced)
