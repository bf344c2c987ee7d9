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


# --------------------------------------------------------------------------
# Runtime Bloom-filter join pruning (semi-join reduction for fact⋈fact)
# --------------------------------------------------------------------------

#: Conf set that makes Catalyst inject a Bloom filter built from the
#: SELECTIVE side of a shuffle join into the scan pipeline of the big
#: side (`bloom_filter_agg` → `might_contain` in the plan): rows whose
#: key cannot match are dropped AT THE SCAN, before the shuffle — the
#: semi-join reduction every distributed engine applies to selective
#: fact⋈fact joins.  Spark ships it ON but gated by size thresholds
#: tuned for clusters (application side must scan ≥10GB); these
#: arguments surface the gates so a deployment can size them to its
#: tables.  Test-scale demos set application_side_min="0".
_BLOOM_CONF_KEYS = (
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
    "spark.sql.autoBroadcastJoinThreshold",
)


def set_runtime_bloom(
    spark: SparkSession,
    application_side_min: str = "10GB",
    creation_side_max: str = "100MB",
    disable_broadcast: bool = False,
) -> dict[str, str | None]:
    """Enable runtime Bloom-filter injection with explicit size gates;
    returns the prior conf values for `restore_confs`.  Broadcast
    disabling exists only so small-scale tests exercise the shuffle-
    join path the filter targets (at real scale the big side never
    broadcasts anyway)."""
    old: dict[str, str | None] = {}
    for k in _BLOOM_CONF_KEYS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        application_side_min,
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_max,
    )
    if disable_broadcast:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return old


def restore_confs(spark: SparkSession, old: dict[str, str | None]) -> None:
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo shape for the runtime filter: a selective order slice
    (1-URGENT, ~20% of orders) joined to the full lineitem fact.  With
    the Bloom gates open, lineitem rows whose l_orderkey can't match
    any urgent order die at the scan; only survivors shuffle."""
    from ..sources import load_table

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.count_distinct("o_orderkey").alias("n_orders"),
        )
    )
