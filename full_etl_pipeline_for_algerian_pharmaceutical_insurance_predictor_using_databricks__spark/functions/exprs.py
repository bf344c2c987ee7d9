"""Shared scalar/aggregate expression idioms (SURVEY.md §2.2, §2.7).

Every helper returns a Column built purely from `pyspark.sql.functions`
— JVM-side, whole-stage-codegen-eligible, no Python UDFs. These are the
idioms the reference repeats across its three entry points, centralized
so each query builds the same expression tree.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# -- price extraction (ref: Pharma_Ingestion_Cleaning.py:88-91) ------------


def extract_price(reference_rate: Column | str) -> Column:
    """First digit-run of the price string as a nullable int.

    `try_cast` semantics: non-numeric → NULL, never an error
    (`regexp_extract` yields '' on no-match; try_cast('') is NULL).
    """
    c = F.col(reference_rate) if isinstance(reference_rate, str) else reference_rate
    return F.regexp_extract(c, r"(\d+)", 1).try_cast("int")


# -- CASE bucketings (ref: SQL Q4/Q9/Q11/Q12) ------------------------------


def price_category(price: Column | str) -> Column:
    """'Low'/'Medium'/'High' bucketing. The reference consumes
    `price_category` (SQL:51-62) but never creates it; thresholds chosen
    consistent with SQL Q7's 100/500 DA affordability boundaries."""
    p = F.col(price) if isinstance(price, str) else price
    return (
        F.when(p <= 100, F.lit("Low"))
        .when(p <= 500, F.lit("Medium"))
        .otherwise(F.lit("High"))
    )


def price_bucket(price: Column | str) -> Column:
    """Histogram ranges (ref: SQL:162-169, boundaries inclusive-upper)."""
    p = F.col(price) if isinstance(price, str) else price
    return (
        F.when(p <= 50, F.lit("0-50 DA"))
        .when(p <= 100, F.lit("51-100 DA"))
        .when(p <= 200, F.lit("101-200 DA"))
        .when(p <= 500, F.lit("201-500 DA"))
        .when(p <= 1000, F.lit("501-1000 DA"))
        .otherwise(F.lit("1000+ DA"))
    )


def coverage_status(refundable: Column | str) -> Column:
    """Tri-state display label (ref: SQL:188-192). NULL lands in
    'Unknown' — distinct from the ML imputation rule below."""
    r = F.col(refundable) if isinstance(refundable, str) else refundable
    return (
        F.when(r == F.lit(True), F.lit("Covered by Insurance"))
        .when(r == F.lit(False), F.lit("Not Covered"))
        .otherwise(F.lit("Unknown"))
    )


def refundable_label(refundable: Column | str) -> Column:
    """Domain rule: NULL refundable ⇒ not covered (ref:
    Pharma_Ingestion_Cleaning.py:163-166, ML notebook:22-26)."""
    r = F.col(refundable) if isinstance(refundable, str) else refundable
    return F.coalesce(r, F.lit(False))


# -- aggregate idioms ------------------------------------------------------


def round0(c: Column) -> Column:
    """ROUND(x, 0) — the reference rounds nearly every aggregate."""
    return F.round(c, 0)


def round1(c: Column) -> Column:
    return F.round(c, 1)


def pct_of_total(count_col: Column, total: Column) -> Column:
    """`COUNT(*) * 100.0 / total` rounded to 1 decimal (ref: SQL:54,71,
    195,239). `total` is a scalar Column (see operators.dashboard for the
    scalar-subquery-as-crossjoin pattern that avoids a driver round-trip).
    """
    return F.round(count_col * F.lit(100.0) / total, 1)
