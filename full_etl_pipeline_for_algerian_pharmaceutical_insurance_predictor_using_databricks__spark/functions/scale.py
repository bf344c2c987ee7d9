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

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

DEFAULT_SALT_BUCKETS = 16


def checkpoint_df(df: DataFrame) -> DataFrame:
    """Eagerly materialize a DataFrame with lineage truncation — the
    engine's single knob for every heavy intermediate (LSH candidate
    lists, contracted pair graphs, CC loop state).

    Default storage is localCheckpoint's MEMORY_AND_DISK — right on a
    real cluster where blocks spread across executors.  In single-JVM
    local mode EVERY block lives in the one driver heap, so a ×10
    scale sweep (61.6 M minhash candidate pairs) used to need
    SPARK_DRIVER_MEM=48g; set SPARK_GRAFT_CHECKPOINT_STORAGE=DISK_ONLY
    (or any StorageLevel name) to keep materializations off-heap and
    run the sweep at the default 8 GiB heap.  A bad level name fails
    fast with the valid choices."""
    name = os.environ.get("SPARK_GRAFT_CHECKPOINT_STORAGE")
    if not name:
        return df.localCheckpoint()
    from pyspark import StorageLevel

    level = getattr(StorageLevel, name, None)
    if not isinstance(level, StorageLevel):
        valid = [
            k for k, v in vars(StorageLevel).items()
            if isinstance(v, StorageLevel)
        ]
        raise ValueError(
            f"SPARK_GRAFT_CHECKPOINT_STORAGE={name!r} is not a "
            f"StorageLevel; choose one of {sorted(valid)}"
        )
    return df.localCheckpoint(eager=True, storageLevel=level)


#: Conservative per-row overhead (bytes) of a broadcast hash relation
#: beyond the raw column payload — keys, pointers, padding.
BCAST_ROW_OVERHEAD = 64


def broadcast_threshold_bytes(spark: SparkSession) -> int:
    """The session's autoBroadcastJoinThreshold in bytes (-1 = off).
    Spark stores it as either a bare byte count or a size string."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    mult = 1
    # "tb"/"t" before the bare-"b" fallthrough: endswith("b") would
    # otherwise strip just the b from "1tb" and misparse
    for suffix, m in (("kb", 1 << 10), ("k", 1 << 10), ("mb", 1 << 20),
                      ("m", 1 << 20), ("gb", 1 << 30), ("g", 1 << 30),
                      ("tb", 1 << 40), ("t", 1 << 40), ("b", 1)):
        if raw.endswith(suffix):
            raw = raw[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(raw)) * mult
    except ValueError:
        # fall back to Spark's default in the SAFE direction (fewer
        # broadcasts), but say so — a silent substitution masks typos
        import warnings

        warnings.warn(
            f"unparseable spark.sql.autoBroadcastJoinThreshold {raw!r}; "
            "assuming the 10MB default for build-side planning",
            stacklevel=2,
        )
        return 10 << 20


def adaptive_build_side(df: DataFrame, est_bytes: int | None) -> DataFrame:
    """Deliberate join-strategy choice for a known-size build side
    (optimization guide §3.1): BROADCAST when the estimated in-memory
    relation fits the session broadcast threshold — the probe side
    (often a large stats-less intermediate the planner would otherwise
    exchange or even sort) then never shuffles at all — else the
    SHUFFLED-HASH hint (never sort-merge: sorting pair/posting frames
    on a join key is pure waste).  Callers derive `est_bytes` from
    exact counts over materialized intermediates, so the decision
    inverts automatically at scale: a 100-TB corpus's member/posting/
    length tables blow past any sane threshold and keep the shuffled
    plan.  `est_bytes=None` means "unknown" and keeps shuffled-hash."""
    if est_bytes is not None:
        thr = broadcast_threshold_bytes(df.sparkSession)
        if 0 < est_bytes <= thr:
            return F.broadcast(df)
    return df.hint("shuffle_hash")


def default_index_dir(kind: str, version: int, sf_dir: str) -> str:
    """Canonical on-disk location for a frozen serving index:
    <repo>/spark-warehouse/<kind>_index_v<version>_<sf tag>.  One
    definition for every build/serve split (IVF-PQ, topic model, PCA)
    so the layout and versioning scheme can only change in one place."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return os.path.join(
        repo_root, "spark-warehouse", f"{kind}_index_v{version}_{tag}"
    )


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


# --------------------------------------------------------------------------
# Z-order layout (multi-dimensional data skipping)
# --------------------------------------------------------------------------

ZORDER_BITS = 8  # per-dimension resolution: 256 cells → 16-bit z-value


def zorder_key_2d(
    x: Column,
    y: Column,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    bits: int = ZORDER_BITS,
) -> Column:
    """Morton (Z-curve) key for two numeric columns: each value maps to
    a `bits`-bit cell index over [min, max] (uniform cells;
    NULL/out-of-range clamps to the edge), and the two indices
    bit-interleave (x in the odd positions).  Rows close in BOTH
    dimensions get close z-values, so a range-partitioned sort by z
    gives every output file a tight bounding box in both columns at
    once — the layout lever behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
    expressed as a plain column so any writer can use it.

    Pure unrolled shift/mask arithmetic — whole-stage codegen, no UDF,
    no SQL-string round trip.  Min/max arrive as arguments (one tiny
    driver-side agg) because the normalization must be identical for
    every row regardless of partitioning."""

    def cell(c: Column, lo: float, hi: float) -> Column:
        span = float(hi) - float(lo)
        if span <= 0:
            return F.lit(0).cast("long")
        idx = F.floor(
            (c.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(2**bits)
        )
        return F.least(
            F.lit(2**bits - 1), F.greatest(F.lit(0), F.coalesce(idx, F.lit(0)))
        ).cast("long")

    cx, cy = cell(x, x_min, x_max), cell(y, y_min, y_max)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
) -> None:
    """Write `df` as parquet laid out along the 2-D Z-curve of
    (x_col, y_col): range-partition on the z-key into `n_files` splits,
    sort within each, drop the key.  Every output file then covers a
    compact z-range ⇒ a tight (x, y) bounding box, so parquet
    footer min/max stats prune files for predicates on EITHER or BOTH
    columns — where a linear sort prunes only its leading column.  At
    100 TB this is the recurring-maintenance pass (Delta OPTIMIZE
    ZORDER) that keeps multi-dimensional scans sub-linear."""
    lo_hi = df.agg(
        F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
    ).collect()[0]
    z = zorder_key_2d(
        F.col(x_col), F.col(y_col), lo_hi[0], lo_hi[1], lo_hi[2], lo_hi[3]
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


# --------------------------------------------------------------------------
# Cost-based optimization (table/column statistics → join reorder)
# --------------------------------------------------------------------------

_CBO_CONF_KEYS = (
    "spark.sql.cbo.enabled",
    "spark.sql.cbo.joinReorder.enabled",
)


def enable_cbo(spark: SparkSession) -> dict[str, str | None]:
    """Turn on the cost-based optimizer + stats-driven join reorder;
    returns prior conf values for `restore_confs`.  CBO only acts on
    CATALOG tables with ANALYZE'd statistics (`analyze_for_cbo`) —
    plain file scans keep the size-only estimates.  At 100 TB this is
    the difference between joining two facts first (a disaster the
    left-to-right planner can write) and starting from the most
    selective dimension."""
    old: dict[str, str | None] = {}
    for k in _CBO_CONF_KEYS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    for k in _CBO_CONF_KEYS:
        spark.conf.set(k, "true")
    return old


def analyze_for_cbo(
    spark: SparkSession, tables: dict[str, DataFrame], columns: bool = True
) -> None:
    """Materialize each frame as a catalog table and ANALYZE it —
    row counts + (optionally) per-column NDV/min/max histogramless
    stats, the inputs the CBO costs joins with.  This is the recurring
    maintenance step a warehouse schedules after loads (Delta collects
    the same stats at write time)."""
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    for name, df in tables.items():
        # a crashed previous run can leave the managed location behind
        # with no catalog entry — saveAsTable then refuses the name.
        # Only clear the location when no live catalog table owns it:
        # dropping + rmtree'ing an unrelated pre-existing table here
        # would be destructive (resolve the real warehouse dir, never a
        # hard-coded relative path).
        if not spark.catalog.tableExists(name):
            loc = os.path.join(warehouse, name)
            if os.path.isdir(loc):
                shutil.rmtree(loc)
        df.write.mode("overwrite").saveAsTable(name)
        suffix = " FOR ALL COLUMNS" if columns else ""
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS{suffix}")


def catalog_row_count_stat(spark: SparkSession, table: str) -> int | None:
    """The optimizer-visible row count for an ANALYZE'd table (None if
    no stats) — what the CBO actually costs with."""
    plan = spark.table(table)._jdf.queryExecution().optimizedPlan()
    opt = plan.stats().rowCount()
    return int(str(opt.get())) if not opt.isEmpty() else None
