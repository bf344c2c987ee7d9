"""Invariants from the reference's inline inspect-and-eyeball checks
(SURVEY.md §5.1), promoted to assertions."""

from __future__ import annotations

from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators.medications import (
    medications,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.schemas import (
    MEDICATIONS,
)


def test_schema_matches_declared(spark, sf_dir):
    med = medications(spark, sf_dir)
    assert [f.name for f in med.schema.fields] == [f.name for f in MEDICATIONS.fields]
    assert med.schema["price"].dataType.simpleString() == "int"
    assert med.schema["refundable"].dataType.simpleString() == "boolean"


def test_price_cleaning_invariants(spark, sf_dir):
    """ING:100-112 — null + zero + valid price partitions must reconcile;
    after cleaning only valid prices remain."""
    med = medications(spark, sf_dir)
    bad = med.filter(F.col("price").isNull() | (F.col("price") <= 0)).count()
    assert bad == 0
    assert med.count() > 0


def test_refundable_tristate(spark, sf_dir):
    """ING:140-148 — tri-state percentages must cover the whole table."""
    med = medications(spark, sf_dir)
    total = med.count()
    t = med.filter(F.col("refundable") == True).count()  # noqa: E712
    f = med.filter(F.col("refundable") == False).count()  # noqa: E712
    n = med.filter(F.col("refundable").isNull()).count()
    assert t + f + n == total
    assert t > f and n > 0  # majority covered; NULLs present (FIXTURES §11)


def test_price_category_consistent_with_buckets(spark, sf_dir):
    """price_category must agree with its defining CASE at every row."""
    med = medications(spark, sf_dir)
    mismatch = med.filter(
        (
            F.when(F.col("price") <= 100, "Low")
            .when(F.col("price") <= 500, "Medium")
            .otherwise("High")
        )
        != F.col("price_category")
    ).count()
    assert mismatch == 0


def test_derivation_deterministic(spark, sf_dir):
    """Same inputs → identical rows on rebuild (oracle depends on it)."""
    a = medications(spark, sf_dir)
    b = medications(spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
