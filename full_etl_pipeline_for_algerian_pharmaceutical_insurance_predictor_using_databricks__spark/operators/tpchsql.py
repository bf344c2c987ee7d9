"""The ENTIRE relational tier as literal SQL text through
``spark.sql()`` — all 22 TPC-H query shapes executed by the SQL front
end over registered views, pinned row-for-row against their DataFrame
builders (tests/test_tpch_sql.py).

Why this matters: `operators/sqlfront.py` proved the reference's own
14 dashboard statements run through the front end; this module proves
the front end serves the FULL relational surface a real user would
type — correlated EXISTS/NOT EXISTS (Q4/Q21/Q22), scalar subqueries
(Q11/Q14/Q15/Q17/Q22), CTE-derived relations (the partsupp family
Q2/Q11/Q16/Q20), multi-way joins with residual conditions, and the
decimal-exact aggregate convention — and that Catalyst plans the TEXT
the same way it plans the DataFrame chain (a temp view is metadata
only; the logical plans converge after analysis).

The statements are the same ANSI texts the DuckDB oracles run
(`relational._Qn_SQL`), executed VERBATIM — one text, three
consumers: the Spark front end, the Spark DataFrame parity pin, and
the cross-engine oracle.  Any statement needing a Spark-specific
adaptation would go in `SPARK_OVERRIDES` with the delta documented;
the set is currently EMPTY — every one of the 22 parses and runs
unmodified.

Reference parity note: the reference's SQL lifecycle is
`pharmaceutical_dashboard_queries.sql` over one catalog table
(SURVEY §3.2); joins/subqueries are the driver-mandated extension
surface (SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from . import relational as rel

#: Base tables every statement may reference (partsupp is a CTE in
#: the four statements that need it — same text DuckDB runs).
_TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

#: n → (SQL text, DataFrame builder) — the full 22-query surface.
TPCH_SQL: dict[int, tuple[str, object]] = {
    1: (rel._Q1_SQL, rel.q1_pricing_summary),
    2: (rel._Q2_SQL, rel.q2_min_cost_supplier),
    3: (rel._Q3_SQL, rel.q3_shipping_priority),
    4: (rel._Q4_SQL, rel.q4_order_priority_check),
    5: (rel._Q5_SQL, rel.q5_region_revenue),
    6: (rel._Q6_SQL, rel.q6_forecast_revenue),
    7: (rel._Q7_SQL, rel.q7_volume_shipping),
    8: (rel._Q8_SQL, rel.q8_market_share),
    9: (rel._Q9_SQL, rel.q9_product_profit),
    10: (rel._Q10_SQL, rel.q10_returned_items),
    11: (rel._Q11_SQL, rel.q11_important_stock),
    12: (rel._Q12_SQL, rel.q12_late_shipment_priority),
    13: (rel._Q13_SQL, rel.q13_customer_distribution),
    14: (rel._Q14_SQL, rel.q14_promo_revenue),
    15: (rel._Q15_SQL, rel.q15_top_supplier),
    16: (rel._Q16_SQL, rel.q16_supplier_part_counts),
    17: (rel._Q17_SQL, rel.q17_small_quantity_revenue),
    18: (rel._Q18_SQL, rel.q18_large_volume_customers),
    19: (rel._Q19_SQL, rel.q19_banded_revenue),
    20: (rel._Q20_SQL, rel.q20_surplus_suppliers),
    21: (rel._Q21_SQL, rel.q21_waiting_suppliers),
    22: (rel._Q22_SQL, rel.q22_idle_customers),
}

#: Spark-dialect adaptations, keyed by query number, each with the
#: documented delta.  EMPTY: all 22 oracle texts run verbatim.
SPARK_OVERRIDES: dict[int, str] = {}


def register_tpch_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the seven base tables as temp views under their TPC-H
    names.  Metadata-only: Catalyst inlines the scans at analysis
    time, so text queries get the same pushdown/pruning as the
    DataFrame chains."""
    for t in _TPCH_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_tpch_sql(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """Execute TPC-H statement ``n`` (1-22) as SQL text through the
    front end."""
    if n not in TPCH_SQL:
        raise ValueError(f"no TPC-H statement {n}")
    register_tpch_views(spark, sf_dir)
    return spark.sql(SPARK_OVERRIDES.get(n) or TPCH_SQL[n][0])


def tpch_q1_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 as SQL TEXT through ``spark.sql()`` — the canonical
    wide-aggregate statement (8 aggregates, decimal-exact sums,
    GROUP BY + ORDER BY) through the front end; the driver
    hash-compares it against DuckDB running the IDENTICAL text."""
    return run_tpch_sql(spark, sf_dir, 1)


def tpch_q18_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 as SQL TEXT — the large-volume-customers shape: an
    aggregated HAVING subquery feeding a semi-filtered 3-way join,
    the classic decorrelation workout for a SQL front end."""
    return run_tpch_sql(spark, sf_dir, 18)


QUERIES = {
    "tpch_q1_sql_frontend": tpch_q1_sql_frontend,
    "tpch_q18_sql_frontend": tpch_q18_sql_frontend,
}

ORACLES = {
    "tpch_q1_sql_frontend": rel._Q1_SQL,
    "tpch_q18_sql_frontend": rel._Q18_SQL,
}
