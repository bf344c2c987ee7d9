"""Table sinks (operators S4/S5, SURVEY.md §2.1): managed-table write
with Delta when available, parquet fallback — same `saveAsTable` /
`spark.table` API shape as the reference (ING:211, 218).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.Class.forName("org.apache.spark.sql.delta.DeltaLog")  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def save_as_table(df: DataFrame, name: str, mode: str = "overwrite") -> str:
    """Write a managed catalog table; returns the format used.

    Overwrite mode keeps the ingest idempotent (re-runs replace, never
    duplicate — ING:209-211)."""
    spark = df.sparkSession
    fmt = "delta" if delta_available(spark) else "parquet"
    df.write.format(fmt).mode(mode).saveAsTable(name)
    return fmt


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout (`col=value/` dirs).

    At 100 TB this is the first line of defense: a filter on the
    partition column prunes whole directories at planning time
    (PartitionFilters in the scan, zero bytes read for pruned values) —
    asserted in tests/test_ingestion.py. Natural partition columns here:
    `first_letter` for medications, date for events."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def read_back_verified(spark: SparkSession, name: str, expected_rows: int) -> DataFrame:
    """Catalog round-trip check (parity with ING:217-224): read the
    table back and assert the row count survived the write."""
    saved = spark.table(name)
    got = saved.count()
    if got != expected_rows:
        raise AssertionError(
            f"catalog round-trip lost rows: wrote {expected_rows}, read {got}"
        )
    return saved


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> None:
    """Delta `MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`
    semantics on a plain parquet directory — the CDC-apply core without
    the table-format dependency.

    Default (`order_col=None`): rows kept = (target ANTI-JOIN updates
    on keys) ∪ updates — matched target rows are replaced wholesale,
    unmatched updates insert, untouched rows carry over.  Mirrors
    Delta's duplicate-match rule: an updates frame with two rows for
    one key is rejected up front (which row wins would be
    nondeterministic).

    With `order_col` (the `WHEN MATCHED AND s.v > t.v` variant): the
    HIGHEST-order row per key wins across target ∪ updates, so a
    late-arriving OLDER change cannot clobber newer state — the rule a
    CDC apply needs when batches aren't in commit order.  Duplicate
    keys in updates are then legal (resolved by the same rule; ties
    break on the remaining columns for determinism).

    The rewrite lands in a `_merge_tmp` sibling first and swaps in via
    rename, so a crash mid-write leaves the old target intact (readers
    ignore `_`-prefixed dirs).  At 100 TB the anti-join / win-per-key
    window is one shuffle on the key — or zero with co-bucketed
    layouts (functions/scale.py) — and a real deployment partitions
    the target so only touched partitions rewrite; at Delta/Iceberg
    tier the swap becomes a transaction-log commit.  Idempotent:
    re-applying the same updates reproduces the same target."""
    import glob as g
    import os
    import shutil

    from pyspark.sql import Window, functions as F

    if order_col is None:
        dup = (
            updates.groupBy(*keys).count().filter("count > 1").limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"merge_upsert: updates contain multiple rows for key "
                f"{tuple(dup[0][k] for k in keys)} — resolve to one row per key "
                f"before merging (Delta MERGE rejects this for the same reason), "
                f"or pass order_col to resolve by recency."
            )
    exists = g.glob(os.path.join(target_dir, "part-*.parquet")) or g.glob(
        os.path.join(target_dir, "*.parquet")
    )
    if exists:
        target = spark.read.parquet(target_dir)
        if order_col is None:
            merged = target.join(updates, keys, "left_anti").unionByName(updates)
        else:
            both = target.unionByName(updates)
            tiebreak = [
                F.desc(c) for c in both.columns if c not in keys and c != order_col
            ]
            w = Window.partitionBy(*keys).orderBy(F.desc(order_col), *tiebreak)
            merged = (
                both.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
    elif order_col is not None:
        tiebreak = [
            F.desc(c) for c in updates.columns if c not in keys and c != order_col
        ]
        w = Window.partitionBy(*keys).orderBy(F.desc(order_col), *tiebreak)
        merged = (
            updates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        merged = updates
    parent = os.path.dirname(target_dir.rstrip("/"))
    tmp = os.path.join(parent or ".", "_merge_tmp")
    merged.write.mode("overwrite").parquet(tmp)
    old = os.path.join(parent or ".", "_merge_old")
    if os.path.exists(target_dir):
        os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    if os.path.exists(old):
        shutil.rmtree(old)
