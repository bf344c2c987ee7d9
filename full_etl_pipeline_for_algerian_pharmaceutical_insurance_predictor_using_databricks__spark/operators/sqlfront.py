"""The reference's SQL entry point, exercised AS SQL.

The reference ships its dashboard as 14 literal SQL statements run
through the engine's SQL front end over a catalog table named
``medications`` (SURVEY.md §3.2; pharmaceutical_dashboard_queries.sql:
6-251).  Rounds 1-9 proved all 14 query *shapes* via DataFrame builders
(operators/dashboard.py) with DuckDB oracles — but never pushed the
reference's own SQL text through ``spark.sql()``.  This module closes
that lifecycle: it carries each statement with the smallest possible
adaptation, registers the cleaned medications DataFrame under the name
the SQL expects, and executes the text through Spark's parser /
analyzer / Catalyst — the exact path a reference user migrating their
``.sql`` file would hit.

Adaptation policy (every delta is tagged per-statement in
``ADAPTATION_NOTES``):

- **Tie-breaks** — statements with LIMIT (Q2/Q3/Q5/Q6/Q10) and the raw
  pre-clean sort get the same deterministic tie-break columns appended
  to their ORDER BY as the DataFrame builders use; without them a tie
  at the LIMIT boundary makes the result set nondeterministic (the
  fixture has heavy ties).  This is the ONLY semantic adaptation.
- **Nothing else changes**: table name stays ``medications``, the
  ``PERCENTILE`` call, scalar subqueries, unaliased derived tables
  (Q8/Q9), ``ORDER BY CASE`` (Q4), aggregate-only-in-ORDER-BY (Q11),
  and ``!=`` (Q10) are all Spark-parseable as written.

Dialect deltas that survive (documented, asserted in
tests/test_sql_parity.py):

- ``COUNT(*) * 100.0 / …`` — Spark parses ``100.0`` as DECIMAL, so the
  pct-of-total columns (Q4/Q5/Q12/Q14) come back DECIMAL where the
  DataFrame builders produce DOUBLE.  Values are equal; the parity
  test compares numerically, and the driver-graded entry below casts
  (a reference user would see the same decimal column in Databricks).
- No BOOLEAN ``= true`` issues, no identifier quoting issues: the
  statements parse clean on Spark 4's ANSI parser.

Plan note (100-TB thinking): ``spark.sql`` over a temp view of the same
cleaned DataFrame produces the *identical* optimized plan as the
builder chain — Catalyst resolves the view to the underlying logical
plan, so filters still push into the parquet scan and top-k still
becomes TakeOrderedAndProject.  ``tests/test_sql_parity.py`` pins Q2
and Q6 plans on that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .medications import MEDICATIONS_CTE, medications, medications_raw

# --------------------------------------------------------------------------
# the 14 statements (pharmaceutical_dashboard_queries.sql:6-251)
# --------------------------------------------------------------------------

#: statement number -> SQL text as the reference wrote it (modulo the
#: tie-break adaptations tagged in ADAPTATION_NOTES).
REFERENCE_STATEMENTS: dict[int, str] = {}

#: statement number -> human-readable list of deltas vs the reference
#: text (empty string = byte-for-byte semantics).
ADAPTATION_NOTES: dict[int, str] = {}

# Query 1 — market overview KPIs (SQL:8-15).  Verbatim: Spark's
# PERCENTILE is the reference's exact call.
REFERENCE_STATEMENTS[1] = """
SELECT
    COUNT(*) as total_medications,
    COUNT(DISTINCT lab_name) as manufacturers,
    COUNT(DISTINCT therapeutic_class) as disease_categories,
    ROUND(AVG(price), 0) as avg_price_DA,
    ROUND(PERCENTILE(price, 0.5), 0) as median_price_DA,
    MAX(price) as most_expensive_DA
FROM medications
"""
ADAPTATION_NOTES[1] = ""

# Query 2 — price by disease area (SQL:20-31).
REFERENCE_STATEMENTS[2] = """
SELECT
    therapeutic_class as disease_area,
    COUNT(*) as drug_count,
    ROUND(AVG(price), 0) as avg_price_DA,
    ROUND(MIN(price), 0) as min_price_DA,
    ROUND(MAX(price), 0) as max_price_DA
FROM medications
WHERE therapeutic_class IS NOT NULL
GROUP BY therapeutic_class
HAVING COUNT(*) >= 30
ORDER BY avg_price_DA DESC, disease_area ASC
LIMIT 12
"""
ADAPTATION_NOTES[2] = "tie-break: appended `disease_area ASC` to ORDER BY"

# Query 3 — top manufacturers (SQL:36-46).
REFERENCE_STATEMENTS[3] = """
SELECT
    lab_name as manufacturer,
    COUNT(*) as products,
    ROUND(AVG(price), 0) as avg_price_DA,
    COUNT(DISTINCT therapeutic_class) as disease_areas
FROM medications
WHERE lab_name IS NOT NULL
GROUP BY lab_name
ORDER BY products DESC, manufacturer ASC
LIMIT 10
"""
ADAPTATION_NOTES[3] = "tie-break: appended `manufacturer ASC` to ORDER BY"

# Query 4 — market segmentation by price category (SQL:51-62).
# Verbatim: scalar subquery + ORDER BY CASE with no ELSE.
REFERENCE_STATEMENTS[4] = """
SELECT
    price_category,
    COUNT(*) as medications_count,
    ROUND(AVG(price), 0) as avg_price_DA,
    ROUND(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM medications), 1) as market_pct
FROM medications
GROUP BY price_category
ORDER BY
    CASE price_category
        WHEN 'Low' THEN 1
        WHEN 'Medium' THEN 2
        WHEN 'High' THEN 3
    END
"""
ADAPTATION_NOTES[4] = ""

# Query 5 — medication forms distribution (SQL:67-77).
REFERENCE_STATEMENTS[5] = """
SELECT
    form,
    COUNT(*) as count,
    ROUND(AVG(price), 0) as avg_price_DA,
    ROUND(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM medications WHERE form IS NOT NULL), 1) as market_pct
FROM medications
WHERE form IS NOT NULL
GROUP BY form
ORDER BY count DESC, form ASC
LIMIT 8
"""
ADAPTATION_NOTES[5] = "tie-break: appended `form ASC` to ORDER BY"

# Query 6 — top 15 most expensive (SQL:81-90).
REFERENCE_STATEMENTS[6] = """
SELECT
    name,
    therapeutic_class as disease_area,
    lab_name as manufacturer,
    price as price_DA,
    form
FROM medications
WHERE price IS NOT NULL
ORDER BY price DESC, name ASC NULLS FIRST, disease_area ASC NULLS FIRST,
         manufacturer ASC NULLS FIRST, form ASC NULLS FIRST
LIMIT 15
"""
ADAPTATION_NOTES[6] = (
    "tie-break: appended name/disease_area/manufacturer/form ASC NULLS FIRST"
)

# Query 7 — affordability metrics (SQL:95-100).  Verbatim: conditional
# COUNT(CASE …) + conditional AVG.
REFERENCE_STATEMENTS[7] = """
SELECT
    ROUND(COUNT(CASE WHEN price <= 100 THEN 1 END) * 100.0 / COUNT(*), 1) as affordable_drugs_pct,
    ROUND(COUNT(CASE WHEN price > 500 THEN 1 END) * 100.0 / COUNT(*), 1) as premium_drugs_pct,
    ROUND(AVG(CASE WHEN price <= 100 THEN price END), 0) as avg_affordable_price_DA
FROM medications
WHERE price IS NOT NULL
"""
ADAPTATION_NOTES[7] = ""

# Query 8 — disease coverage statistics (SQL:105-113).  Verbatim —
# including the UNALIASED derived table, which Spark's parser accepts.
REFERENCE_STATEMENTS[8] = """
SELECT
    COUNT(DISTINCT therapeutic_class) as disease_areas_covered,
    ROUND(AVG(drugs_per_area), 0) as avg_drugs_per_disease_area
FROM (
    SELECT therapeutic_class, COUNT(*) as drugs_per_area
    FROM medications
    WHERE therapeutic_class IS NOT NULL
    GROUP BY therapeutic_class
)
"""
ADAPTATION_NOTES[8] = ""

# Query 9 — manufacturer size analysis (SQL:118-141).  Verbatim:
# repeated CASE in SELECT and GROUP BY, unaliased derived table.
REFERENCE_STATEMENTS[9] = """
SELECT
    CASE
        WHEN product_count >= 100 THEN 'Large (100+ products)'
        WHEN product_count >= 50 THEN 'Medium (50-99 products)'
        ELSE 'Small (<50 products)'
    END as manufacturer_size,
    COUNT(DISTINCT lab_name) as manufacturers,
    ROUND(AVG(avg_price), 0) as avg_price_DA,
    SUM(product_count) as total_products
FROM (
    SELECT
        lab_name,
        COUNT(*) as product_count,
        AVG(price) as avg_price
    FROM medications
    WHERE lab_name IS NOT NULL AND price IS NOT NULL
    GROUP BY lab_name
)
GROUP BY
    CASE
        WHEN product_count >= 100 THEN 'Large (100+ products)'
        WHEN product_count >= 50 THEN 'Medium (50-99 products)'
        ELSE 'Small (<50 products)'
    END
ORDER BY avg_price_DA DESC
"""
ADAPTATION_NOTES[9] = ""

# Query 10 — top active ingredients (SQL:146-156).  `!=` kept.
REFERENCE_STATEMENTS[10] = """
SELECT
    generic as active_ingredient,
    COUNT(*) as formulations,
    ROUND(AVG(price), 0) as avg_price_DA,
    COUNT(DISTINCT lab_name) as manufacturers
FROM medications
WHERE generic IS NOT NULL AND generic != ''
GROUP BY generic
ORDER BY formulations DESC, active_ingredient ASC
LIMIT 10
"""
ADAPTATION_NOTES[10] = "tie-break: appended `active_ingredient ASC` to ORDER BY"

# Query 11 — price range histogram (SQL:161-182).  Verbatim: repeated
# CASE in GROUP BY + aggregate-only ORDER BY MIN(price).
REFERENCE_STATEMENTS[11] = """
SELECT
    CASE
        WHEN price <= 50 THEN '0-50 DA'
        WHEN price <= 100 THEN '51-100 DA'
        WHEN price <= 200 THEN '101-200 DA'
        WHEN price <= 500 THEN '201-500 DA'
        WHEN price <= 1000 THEN '501-1000 DA'
        ELSE '1000+ DA'
    END as price_range,
    COUNT(*) as medications
FROM medications
WHERE price IS NOT NULL
GROUP BY
    CASE
        WHEN price <= 50 THEN '0-50 DA'
        WHEN price <= 100 THEN '51-100 DA'
        WHEN price <= 200 THEN '101-200 DA'
        WHEN price <= 500 THEN '201-500 DA'
        WHEN price <= 1000 THEN '501-1000 DA'
        ELSE '1000+ DA'
    END
ORDER BY MIN(price)
"""
ADAPTATION_NOTES[11] = ""

# Query 12 — insurance reimbursement statistics (SQL:187-203).
REFERENCE_STATEMENTS[12] = """
SELECT
    CASE
        WHEN refundable = true THEN 'Covered by Insurance'
        WHEN refundable = false THEN 'Not Covered'
        ELSE 'Unknown'
    END as coverage_status,
    COUNT(*) as medications_count,
    ROUND(AVG(price), 0) as avg_price_DA,
    ROUND(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM medications), 1) as percentage
FROM medications
GROUP BY
    CASE
        WHEN refundable = true THEN 'Covered by Insurance'
        WHEN refundable = false THEN 'Not Covered'
        ELSE 'Unknown'
    END
ORDER BY medications_count DESC
"""
ADAPTATION_NOTES[12] = ""

# Query 13 — ML dataset preparation (SQL:212-228).  Verbatim.
REFERENCE_STATEMENTS[13] = """
SELECT
    price,
    form,
    therapeutic_class,
    pharmacological_class,
    lab_name,
    CASE
        WHEN refundable IS NULL THEN false
        ELSE refundable
    END as refundable_label
FROM medications
WHERE
    price IS NOT NULL
    AND form IS NOT NULL
    AND therapeutic_class IS NOT NULL
    AND pharmacological_class IS NOT NULL
    AND lab_name IS NOT NULL
"""
ADAPTATION_NOTES[13] = ""

# Query 14 — class imbalance check (SQL:233-245).  Verbatim.
REFERENCE_STATEMENTS[14] = """
SELECT
    CASE
        WHEN refundable = true THEN 'Covered'
        ELSE 'Not Covered'
    END as label,
    COUNT(*) as count,
    ROUND(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM medications), 1) as percentage
FROM medications
GROUP BY
    CASE
        WHEN refundable = true THEN 'Covered'
        ELSE 'Not Covered'
    END
"""
ADAPTATION_NOTES[14] = ""

#: statement number -> the dashboard.QUERIES key whose builder computes
#: the same result (the parity target in tests/test_sql_parity.py).
BUILDER_FOR: dict[int, str] = {
    1: "med_q01_overview",
    2: "med_q02_price_by_disease_area",
    3: "med_q03_top_manufacturers",
    4: "med_q04_price_segmentation",
    5: "med_q05_form_distribution",
    6: "med_q06_most_expensive",
    7: "med_q07_affordability",
    8: "med_q08_disease_coverage",
    9: "med_q09_manufacturer_size",
    10: "med_q10_top_generics",
    11: "med_q11_price_histogram",
    12: "med_q12_coverage_status",
    13: "med_q13_ml_dataset",
    14: "med_q14_class_balance",
}

#: statements whose output order is pinned (LIMIT + full tie-break);
#: the rest are compared as sorted multisets.
ORDER_PINNED: frozenset[int] = frozenset({2, 3, 5, 6, 10})


# --------------------------------------------------------------------------
# execution
# --------------------------------------------------------------------------


def register_medications_view(
    spark: SparkSession, sf_dir: str, view: str = "medications"
) -> None:
    """Register the cleaned medications DataFrame under the name the
    reference SQL expects.  A temp view is metadata only — Catalyst
    inlines the underlying logical plan at analysis time, so the SQL
    text gets the same pushdown/pruning as the DataFrame chain."""
    medications(spark, sf_dir).createOrReplaceTempView(view)


def run_reference_sql(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """Execute reference dashboard statement ``n`` (1-14) through
    ``spark.sql()`` over a temp view of the cleaned medications table —
    the reference's second lifecycle, end-to-end."""
    register_medications_view(spark, sf_dir)
    return spark.sql(REFERENCE_STATEMENTS[n])


# --------------------------------------------------------------------------
# driver-graded entry: Query 2 through the SQL front end
# --------------------------------------------------------------------------


def q02_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query 2 routed through ``spark.sql`` (reference SQL text, not the
    DataFrame builder) — the driver's oracle hash-compares it against
    the same DuckDB SQL as `med_q02_price_by_disease_area`, proving the
    SQL front end and the builder agree value-for-value.

    One normalization for the cross-engine hash only: Spark's
    ``ROUND(MIN(price), 0)`` stays INT (price is int), DuckDB's is
    DOUBLE — the two min/max columns are cast AFTER the SQL executes,
    so the statement itself still runs verbatim through the front end
    (tests/test_sql_parity.py pins the uncast result against the
    builder too).
    """
    from pyspark.sql import functions as F

    df = run_reference_sql(spark, sf_dir, 2)
    return df.withColumn(
        "min_price_DA", F.col("min_price_DA").cast("double")
    ).withColumn("max_price_DA", F.col("max_price_DA").cast("double"))


# Same oracle text as the builder entry (dashboard._Q02_SQL) — re-stated
# here so the module is self-contained for the entry registry.
_Q02_ORACLE = """
SELECT
    therapeutic_class AS disease_area,
    COUNT(*) AS drug_count,
    CAST(ROUND(AVG(price), 0) AS DOUBLE) AS avg_price_DA,
    CAST(ROUND(MIN(price), 0) AS DOUBLE) AS min_price_DA,
    CAST(ROUND(MAX(price), 0) AS DOUBLE) AS max_price_DA
FROM medications
WHERE therapeutic_class IS NOT NULL
GROUP BY therapeutic_class
HAVING COUNT(*) >= 30
ORDER BY avg_price_DA DESC, disease_area ASC
LIMIT 12
"""


def raw_price_order_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingestion notebook's pre-clean price inspection (ING:95) as
    SQL text — `desc_nulls_last` spelled `DESC NULLS LAST`, proving the
    null-ordering clause parses and executes through the front end."""
    medications_raw(spark, sf_dir).createOrReplaceTempView("medications_raw")
    return spark.sql(
        """
        SELECT name, reference_rate, price
        FROM medications_raw
        ORDER BY price DESC NULLS LAST, name ASC, reference_rate ASC
        LIMIT 10
        """
    )


# --------------------------------------------------------------------------
# the SQL front end generalizes past the dashboard: a TPC-H statement
# as literal SQL text (public TPC-H spec Q6, adapted to the fixture's
# timestamp l_shipdate and the cross-engine decimal-sum convention)
# --------------------------------------------------------------------------

_TPCH_Q6_TEXT = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def tpch_q6_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 as SQL TEXT through ``spark.sql()`` over a registered
    `lineitem` view — proves the front end serves the relational tier
    (range pushdown through a view, decimal aggregate arithmetic), not
    only the reference's dashboard statements.  Same plan as the
    DataFrame builder `tpch_q6_forecast_revenue`: the three range
    predicates reach the parquet scan, one partial/final agg pair."""
    from ..sources import load_table

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_TPCH_Q6_TEXT)


QUERIES = {
    "med_q02_sql_frontend": q02_sql_frontend,
    "tpch_q6_sql_frontend": tpch_q6_sql_frontend,
}

_TPCH_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

ORACLES = {
    "med_q02_sql_frontend": MEDICATIONS_CTE + _Q02_ORACLE,
    "tpch_q6_sql_frontend": _TPCH_Q6_ORACLE,
}
