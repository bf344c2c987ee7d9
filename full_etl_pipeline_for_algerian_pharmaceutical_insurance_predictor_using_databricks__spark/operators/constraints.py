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


def count_duplicate_keys(df: DataFrame, keys: list[str]) -> Column:
    """Rows beyond the first per key (0 ⇔ key is unique).  groupBy
    shuffles key-level partial counts only."""
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


QUERIES = {
    "dq_orders_audit": audit_orders,
}

ORACLES = {
    "dq_orders_audit": _AUDIT_SQL,
}
