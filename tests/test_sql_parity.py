"""The reference's 14 dashboard SQL statements, executed AS SQL.

SURVEY §3.2: the reference's second lifecycle is literal SQL text run
through the engine's SQL front end over a table named ``medications``
(pharmaceutical_dashboard_queries.sql:6-251).  These tests push each
statement through ``spark.sql()`` — over a temp view AND once through a
``saveAsTable`` → catalog-table chain — and pin row-for-row equality
with the DataFrame builders that the driver's oracle gate already
value-checks against DuckDB.  Dialect deltas are asserted, not papered
over (pct-of-total columns come back DECIMAL because Spark parses
``100.0`` as a DECIMAL literal; the builders produce DOUBLE).
"""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    dashboard,
    sqlfront,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators.medications import (
    medications,
)

SF_CORRECT = "/root/testdata/sf0.01"

#: pct-of-total columns whose Spark-SQL type is DECIMAL (the reference's
#: `100.0` literal) while the builder emits DOUBLE — the one documented
#: dialect delta (sqlfront.py module docstring).
_DECIMAL_DELTA_COLS = {
    4: {"market_pct"},
    5: {"market_pct"},
    7: {"affordable_drugs_pct", "premium_drugs_pct"},
    12: {"percentage"},
    14: {"percentage"},
}

#: Q2's ROUND(MIN/MAX(price), 0) stays INT in Spark (price is int; Spark
#: round(int, 0) is int) while the builder casts to DOUBLE for DuckDB
#: comparability — same values, documented integer delta.
_INT_DELTA_COLS = {
    2: {"min_price_DA", "max_price_DA"},
}


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    return v


def _rows(df, *, sort: bool) -> list[tuple]:
    out = [tuple(_norm(v) for v in row) for row in df.collect()]
    if sort:
        out.sort(key=lambda r: tuple((v is None, str(v)) for v in r))
    return out


def _assert_rows_equal(got: list[tuple], want: list[tuple], ctx: str) -> None:
    assert len(got) == len(want), f"{ctx}: {len(got)} rows vs {len(want)}"
    for i, (g, w) in enumerate(zip(got, want)):
        assert len(g) == len(w), f"{ctx} row {i}: arity {len(g)} vs {len(w)}"
        for j, (a, b) in enumerate(zip(g, w)):
            if isinstance(a, float) and isinstance(b, float):
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{ctx} row {i} col {j}: {a!r} != {b!r}"
                )
            else:
                assert a == b, f"{ctx} row {i} col {j}: {a!r} != {b!r}"


@pytest.mark.parametrize("n", sorted(sqlfront.REFERENCE_STATEMENTS))
def test_reference_sql_matches_builder(spark, n):
    """Each reference statement, through spark.sql over a temp view,
    equals its DataFrame builder row-for-row (ordered where the
    statement pins order via LIMIT + tie-break, as a multiset where
    the reference leaves ties free)."""
    sql_df = sqlfront.run_reference_sql(spark, SF_CORRECT, n)
    builder = dashboard.QUERIES[sqlfront.BUILDER_FOR[n]]
    builder_df = builder(spark, SF_CORRECT)

    assert sql_df.columns == builder_df.columns, (
        f"Q{n}: SQL columns {sql_df.columns} vs builder {builder_df.columns}"
    )

    # the documented DECIMAL-vs-DOUBLE literal delta — and nothing else
    sql_types = dict(sql_df.dtypes)
    builder_types = dict(builder_df.dtypes)
    for col in sql_df.columns:
        if col in _DECIMAL_DELTA_COLS.get(n, set()):
            assert sql_types[col].startswith("decimal"), (
                f"Q{n}.{col}: expected the documented decimal delta, got {sql_types[col]}"
            )
            assert builder_types[col] == "double"
        elif col in _INT_DELTA_COLS.get(n, set()):
            assert sql_types[col] == "int" and builder_types[col] == "double", (
                f"Q{n}.{col}: {sql_types[col]} vs builder {builder_types[col]}"
            )
        else:
            assert sql_types[col] == builder_types[col], (
                f"Q{n}.{col}: {sql_types[col]} vs builder {builder_types[col]}"
            )

    ordered = n in sqlfront.ORDER_PINNED
    got = _rows(sql_df, sort=not ordered)
    want = _rows(builder_df, sort=not ordered)
    _assert_rows_equal(got, want, f"Q{n}")


def test_reference_sql_runs_on_smoke_fixture(spark):
    """Every statement parses and executes on the sf0.001 smoke fixture
    too (Q2's HAVING 30 legitimately returns 0 rows there)."""
    for n in sorted(sqlfront.REFERENCE_STATEMENTS):
        df = sqlfront.run_reference_sql(spark, "/root/testdata/sf0.001", n)
        df.collect()  # must execute, row count free to differ by SF


def test_sql_over_catalog_table(spark):
    """The saveAsTable → spark.table lifecycle: land the cleaned
    medications table in the catalog, run reference SQL against the
    CATALOG table (temp view dropped so it can't shadow), compare with
    the builder."""
    spark.catalog.dropTempView("medications")  # must not shadow the table
    spark.sql("CREATE DATABASE IF NOT EXISTS sql_parity")
    try:
        med = medications(spark, SF_CORRECT)
        med.write.mode("overwrite").saveAsTable("sql_parity.medications")
        spark.catalog.setCurrentDatabase("sql_parity")
        try:
            got = _rows(spark.sql(sqlfront.REFERENCE_STATEMENTS[1]), sort=True)
            got3 = _rows(spark.sql(sqlfront.REFERENCE_STATEMENTS[3]), sort=False)
        finally:
            spark.catalog.setCurrentDatabase("default")
        want = _rows(
            dashboard.QUERIES["med_q01_overview"](spark, SF_CORRECT), sort=True
        )
        want3 = _rows(
            dashboard.QUERIES["med_q03_top_manufacturers"](spark, SF_CORRECT),
            sort=False,
        )
        _assert_rows_equal(got, want, "catalog Q1")
        _assert_rows_equal(got3, want3, "catalog Q3")
    finally:
        spark.sql("DROP TABLE IF EXISTS sql_parity.medications")
        spark.sql("DROP DATABASE IF EXISTS sql_parity")


def test_sql_frontend_plan_quality(spark):
    """The SQL text gets the same physical treatment as the builder:
    top-k LIMIT+ORDER BY compiles to TakeOrderedAndProject (no global
    sort) and Q2's IS NOT NULL filter pushes into the parquet scan."""
    q6 = sqlfront.run_reference_sql(spark, SF_CORRECT, 6)
    plan6 = q6._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan6, plan6

    # medications is a DERIVED view (every column computed from `part`),
    # so filters sit on computed exprs and cannot reach parquet as
    # PushedFilters — the right pin is column pruning: the scan must
    # read only the 3 base columns Q2's exprs need (of part's 6).
    q2 = sqlfront.run_reference_sql(spark, SF_CORRECT, 2)
    plan2 = q2._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<p_partkey:bigint,p_type:string,p_size:int>" in plan2, (
        plan2
    )


def test_raw_price_order_sql_twin(spark):
    """DESC NULLS LAST through the SQL front end equals the
    desc_nulls_last builder (med_raw_price_order) row-for-row."""
    got = _rows(sqlfront.raw_price_order_sql(spark, SF_CORRECT), sort=False)
    want = _rows(
        dashboard.QUERIES["med_raw_price_order"](spark, SF_CORRECT), sort=False
    )
    _assert_rows_equal(got, want, "raw_price_order")


def test_sql_frontend_entry_matches_builder_entry(spark):
    """The driver-graded `med_q02_sql_frontend` entry equals the
    driver-graded `med_q02_price_by_disease_area` entry exactly —
    the two roads into the engine agree."""
    got = _rows(sqlfront.q02_sql_frontend(spark, SF_CORRECT), sort=False)
    want = _rows(
        dashboard.QUERIES["med_q02_price_by_disease_area"](spark, SF_CORRECT),
        sort=False,
    )
    _assert_rows_equal(got, want, "q02 sql-frontend entry")
