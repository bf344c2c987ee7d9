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
