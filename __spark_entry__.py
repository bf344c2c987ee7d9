"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — smoke check: flagship query at sf0.001.
`queries()` — every implemented operator (SURVEY.md §2) as a
    (spark, sf_dir) -> DataFrame builder.
`oracle_sql()` — DuckDB-runnable ANSI SQL equivalents (same column
    aliases; omitted only for non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    dashboard,
    dedup,
    encoding,
    events,
    multimodal,
    relational,
    sampling,
    similarity,
    text,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators.medications import (
    MEDICATIONS_CTE,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Query 2 shape (filter → hash-agg → HAVING → top-k) on
    the derived medications table at sf0.001. HAVING threshold scaled to
    the smoke fixture's ~190 cleaned rows (30 would filter every group)."""
    return dashboard.q02_price_by_disease_area(
        spark, "/root/testdata/sf0.001", min_drug_count=3
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(dashboard.QUERIES)
    out.update(relational.QUERIES)
    out.update(events.QUERIES)
    out.update(text.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(sampling.QUERIES)
    out["ml_feature_encoding"] = encoding.ml_feature_encoding
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(dashboard.ORACLES)
    out.update(relational.ORACLES)
    out.update(events.ORACLES)
    out.update(text.ORACLES)
    out.update(dedup.ORACLES)
    out.update(similarity.ORACLES)
    out.update(multimodal.ORACLES)
    out.update(sampling.ORACLES)
    out["ml_feature_encoding"] = MEDICATIONS_CTE + encoding.ML_FEATURE_ENCODING_SQL
    return out
