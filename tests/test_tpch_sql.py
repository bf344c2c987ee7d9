"""SQL-front-end parity for the ENTIRE relational tier: all 22 TPC-H
query shapes executed as literal SQL text through ``spark.sql()``
(operators/tpchsql.py) must return exactly the rows their DataFrame
builders return — same columns, same values, bit-for-bit on the
decimal-exact aggregate columns.

This is the relational twin of tests/test_sql_parity.py (the
reference's 14 dashboard statements): together they prove a user can
type EVERY query this engine implements as SQL text and get the
DataFrame tier's answers."""

from __future__ import annotations

import math

import pytest

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    tpchsql,
)

SF = "/root/testdata/sf0.001"


def _canon(df):
    """(sorted column names, multiset of rows in that column order) —
    column-name-aligned, order-insensitive comparison form."""
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=lambda t: tuple(map(str, t)))


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        # the decimal-exact convention should make these bit-equal;
        # isclose only forgives the final-ulp double-rounding seam
        return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
    return a == b


@pytest.mark.parametrize("n", sorted(tpchsql.TPCH_SQL))
def test_sql_text_matches_dataframe_builder(spark, n):
    text, builder = tpchsql.TPCH_SQL[n]
    got_cols, got_rows = _canon(tpchsql.run_tpch_sql(spark, SF, n))
    want_cols, want_rows = _canon(builder(spark, SF))
    assert got_cols == want_cols, f"Q{n}: column mismatch"
    assert len(got_rows) == len(want_rows), (
        f"Q{n}: {len(got_rows)} rows via SQL vs {len(want_rows)} via builder"
    )
    for g, w in zip(got_rows, want_rows):
        assert len(g) == len(w) and all(
            _eq(x, y) for x, y in zip(g, w)
        ), f"Q{n}: row mismatch {g} != {w}"


def test_no_overrides_needed():
    """The point of record: every oracle text runs through Spark
    verbatim — the moment one needs adapting, this documents it."""
    assert tpchsql.SPARK_OVERRIDES == {}
