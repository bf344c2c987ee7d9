"""Scale-path utilities: skew salting and bucketed co-located joins.

These are the two knobs the built-in planner can't always pull for you
at 100 TB:

- **Salting** spreads a hot aggregation/join key over N synthetic
  sub-keys so no single task owns the whole key. AQE's skew-join split
  handles read-side skew, but a pathological agg key (one user with
  10% of all events) still funnels into one reducer — the two-phase
  salted aggregate keeps every task bounded.
- **Bucketing** pre-shuffles a table ON WRITE (`bucketBy` +
  `saveAsTable`); two tables bucketed on the same key join with zero
  exchange at read time. At 100 TB that turns every recurring
  fact⋈fact join from a full network shuffle into a local zip of
  co-numbered buckets. tests/test_plans.py asserts the no-Exchange
  plan property.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

DEFAULT_SALT_BUCKETS = 16


def with_salt(df: DataFrame, n_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Add a `_salt` column in [0, n_buckets), hashing the row's
    columns TOGETHER WITH a per-row monotonic id: identical rows of a
    hot key must land in different buckets (hashing values alone would
    funnel a million copies of one row into one reducer — the exact
    skew this exists to break). The id is stable for a fixed input
    partitioning; salt placement does not affect any aggregate result,
    only load balance."""
    return df.withColumn(
        "_salt",
        F.pmod(
            F.hash(F.monotonically_increasing_id(), *[F.col(c) for c in df.columns]),
            F.lit(n_buckets),
        ),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    `aggs` maps output name -> (phase1 partial expr, phase2 merge expr
    over the phase-1 column named `name`). Example (count + sum):

        salted_agg(ev, ["user_id"], {
            "events": (F.count("*"), F.sum("events")),
            "total":  (F.sum("value"), F.sum("total")),
        })

    Phase 1 aggregates on (keys + salt): the hot key's rows split over
    n_buckets reducers, each seeing ~1/n of it. Phase 2 merges the tiny
    per-salt partials (≤ n_buckets rows per key) by key alone. Results
    are identical to the direct groupBy for decomposable aggregates
    (count/sum/min/max); non-decomposable ones (exact median) don't fit
    this helper by construction.
    """
    salted = with_salt(df, n_buckets)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr1.alias(name) for name, (expr1, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[expr2.alias(name) for name, (_, expr2) in aggs.items()]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Materialize a table hash-bucketed (and optionally sorted) by the
    join key. Parquet managed table — the bucketing metadata lives in
    the catalog, which is what lets the planner elide the exchange."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-key bucketed catalog tables. With matching bucket
    counts the physical plan has NO ShuffleExchange on either side
    (SortMergeJoin directly over the bucketed scans)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
