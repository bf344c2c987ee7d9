"""PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (Algerian pharmaceutical
insurance predictor, see SURVEY.md): batch ETL over a `medications`
table, a 14-query dashboard pack, an ML feature/training pipeline —
plus the large-scale extensions a training-data platform needs
(joins, windows, event analytics, dedup, similarity search, text
analysis, streaming).

Everything is the DataFrame / Spark SQL API: logical plans are declared
declaratively and Catalyst/Tungsten pick the physical strategy. UDFs
appear only where built-ins genuinely cannot express the semantics
(Arrow-batched pandas UDFs, never row-at-a-time Python).
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
