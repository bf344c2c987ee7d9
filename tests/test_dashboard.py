"""Dashboard query-pack behavior checks at smoke scale. Exact value
parity vs DuckDB is covered by tools/check_oracle.py (the driver's
gate); these assert structural invariants cheaply."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    dashboard,
)


def test_all_queries_have_oracles():
    assert set(dashboard.ORACLES) == set(dashboard.QUERIES)


@pytest.mark.parametrize("name", sorted(dashboard.QUERIES))
def test_query_runs_nonempty(spark, sf_correct, name):
    df = dashboard.QUERIES[name](spark, sf_correct)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_q04_market_pct_sums_to_100(spark, sf_correct):
    rows = dashboard.q04_price_segmentation(spark, sf_correct).collect()
    assert abs(sum(r.market_pct for r in rows) - 100.0) < 0.3


def test_q12_tristate_labels(spark, sf_correct):
    labels = {
        r.coverage_status
        for r in dashboard.q12_coverage_status(spark, sf_correct).collect()
    }
    assert labels == {"Covered by Insurance", "Not Covered", "Unknown"}


def test_q14_null_folds_into_not_covered(spark, sf_correct):
    """SQL:233-245 folds NULL into 'Not Covered' (unlike Q12's 'Unknown')."""
    rows = dashboard.q14_class_balance(spark, sf_correct).collect()
    assert {r.label for r in rows} == {"Covered", "Not Covered"}


def test_q13_no_nulls_in_features(spark, sf_correct):
    df = dashboard.q13_ml_dataset(spark, sf_correct)
    for c in df.columns:
        assert df.filter(F.col(c).isNull()).count() == 0, c


def test_q02_having_threshold(spark, sf_correct):
    rows = dashboard.q02_price_by_disease_area(spark, sf_correct).collect()
    assert 0 < len(rows) <= 12
    assert all(r.drug_count >= 30 for r in rows)
