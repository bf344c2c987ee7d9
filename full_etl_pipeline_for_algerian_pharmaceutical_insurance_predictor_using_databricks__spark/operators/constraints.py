"""Declarative data-quality constraints — the expectations layer
(dbt tests / Delta constraints / Great Expectations) a production
pipeline runs after every load, expressed Spark-first:

Every check compiles to a CONDITIONAL AGGREGATE over one scan — the
whole suite is a single job with map-side partials, never one pass per
rule (the trap naive validators hit at 100 TB).  Uniqueness and
referential integrity need their own shuffles by nature (group-by key /
anti-join), but both aggregate BEFORE counting, so the exchanges carry
key-level rows only.

`audit_orders` is the oracle-checked showcase over the fixture: row
rules (not-null, range, set-membership), a key-uniqueness rule, and a
referential-integrity rule (orders → customer), all reported as one
violation-count row — the artifact a load pipeline gates on.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources import load_table


@dataclass(frozen=True)
class RowRule:
    """A per-row predicate that must hold; violations = rows where it
    doesn't (NULL predicate counts as a violation — unknown is not
    pass)."""

    name: str
    predicate: Column


def _violations(rule: RowRule) -> Column:
    ok = F.coalesce(rule.predicate.cast("boolean"), F.lit(False))
    return F.sum(F.when(ok, 0).otherwise(1)).cast("bigint").alias(rule.name)


def check_rows(df: DataFrame, rules: list[RowRule]) -> DataFrame:
    """All row rules in ONE aggregate over one scan: a 1-row frame of
    violation counts."""
    return df.agg(*[_violations(r) for r in rules])


def count_duplicate_keys(df: DataFrame, keys: list[str]) -> int:
    """Rows beyond the first per key (0 ⇔ key is unique).  groupBy
    shuffles key-level partial counts only.  Eager: triggers a job and
    returns the scalar (like count_orphans), not a lazy Column."""
    per_key = df.groupBy(*keys).agg(F.count("*").alias("n"))
    return per_key.agg(
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("bigint")
    ).first()[0]


def count_orphans(df: DataFrame, parent: DataFrame, fk: str, pk: str) -> int:
    """Referential integrity: child rows whose foreign key has no
    parent (NULL fk is orphaned — use a row rule to allow NULLs).
    Anti-join; the parent side aggregates to distinct keys first."""
    parents = parent.select(F.col(pk).alias(fk)).distinct()
    return df.select(fk).join(parents, fk, "left_anti").count()


def audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture's load-gate audit as one row of violation counts.
    Clean fixture ⇒ all zeros except the deliberately-tight range rule
    (o_totalprice ≤ 400k), which demonstrates a firing rule with a
    nonzero count."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    row_counts = check_rows(
        orders,
        [
            RowRule("null_orderkey", F.col("o_orderkey").isNotNull()),
            RowRule("null_custkey", F.col("o_custkey").isNotNull()),
            RowRule(
                "bad_status", F.col("o_orderstatus").isin("F", "O", "P")
            ),
            RowRule("nonpositive_price", F.col("o_totalprice") > 0),
            RowRule("price_above_400k", F.col("o_totalprice") <= 400000),
        ],
    )
    dup = count_duplicate_keys(orders, ["o_orderkey"])
    orphans = count_orphans(orders, customer, "o_custkey", "c_custkey")
    return row_counts.withColumns(
        {
            "duplicate_orderkeys": F.lit(dup).cast("bigint"),
            "orphan_custkeys": F.lit(orphans).cast("bigint"),
        }
    )


_AUDIT_SQL = """
SELECT
    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS null_orderkey,
    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS null_custkey,
    CAST(SUM(CASE WHEN COALESCE(o_orderstatus IN ('F', 'O', 'P'), FALSE)
                  THEN 0 ELSE 1 END) AS BIGINT) AS bad_status,
    CAST(SUM(CASE WHEN COALESCE(o_totalprice > 0, FALSE) THEN 0 ELSE 1 END)
        AS BIGINT) AS nonpositive_price,
    CAST(SUM(CASE WHEN COALESCE(o_totalprice <= 400000, FALSE) THEN 0 ELSE 1 END)
        AS BIGINT) AS price_above_400k,
    (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
     FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey))
        AS duplicate_orderkeys,
    (SELECT CAST(count(*) AS BIGINT) FROM orders o
     WHERE NOT EXISTS (SELECT 1 FROM customer c
                       WHERE c.c_custkey = o.o_custkey))
        AS orphan_custkeys
FROM orders
"""


def events_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit (PSI, Population Stability Index —
    the standard model-monitoring statistic): split the events table
    into two periods at the midpoint of its time range and compare the
    event-type distributions.  Per-type PSI terms
    (p_a − p_b)·ln(p_a/p_b) are emitted per bin (sum = the PSI; > 0.2
    is the conventional "significant drift" alarm).

    Cross-engine determinism: the split point is exact integer epoch
    arithmetic ((min+max) DIV 2), counts are exact, and the only
    double math is the identical p/ln expression on identical integers.
    One scan + one tiny per-type aggregate — the nightly drift check
    costs one pass at any scale."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    bounds = ev.agg(
        F.min(epoch).alias("lo"), F.max(epoch).alias("hi")
    ).first()
    mid = (bounds.lo + bounds.hi) // 2
    per_type = ev.groupBy("event_type").agg(
        F.sum(F.when(epoch <= mid, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(epoch > mid, 1).otherwise(0)).cast("bigint").alias("n_b"),
    )
    tot = per_type.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    ).first()
    p_a = F.col("n_a") / F.lit(tot.ta)
    p_b = F.col("n_b") / F.lit(tot.tb)
    psi = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0), (p_a - p_b) * F.log(p_a / p_b)
    )
    return per_type.select(
        "event_type",
        "n_a",
        "n_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        psi.alias("psi_term"),
    )


_DRIFT_SQL = """
WITH bounds AS (
    SELECT CAST(FLOOR(MIN(EXTRACT(epoch FROM ts))) AS BIGINT) AS lo,
           CAST(FLOOR(MAX(EXTRACT(epoch FROM ts))) AS BIGINT) AS hi
    FROM events
),
per_type AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT)
                              <= (SELECT (lo + hi) // 2 FROM bounds)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT)
                              > (SELECT (lo + hi) // 2 FROM bounds)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_b
    FROM events
    GROUP BY event_type
),
tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM per_type)
SELECT event_type,
       n_a,
       n_b,
       n_a / (SELECT ta FROM tot) AS p_a,
       n_b / (SELECT tb FROM tot) AS p_b,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN (n_a / (SELECT ta FROM tot) - n_b / (SELECT tb FROM tot))
                 * ln((n_a / (SELECT ta FROM tot)) / (n_b / (SELECT tb FROM tot)))
       END AS psi_term
FROM per_type
"""


QUERIES = {
    "dq_orders_audit": audit_orders,
    "dq_events_drift": events_drift,
}

ORACLES = {
    "dq_orders_audit": _AUDIT_SQL,
    "dq_events_drift": _DRIFT_SQL,
}
