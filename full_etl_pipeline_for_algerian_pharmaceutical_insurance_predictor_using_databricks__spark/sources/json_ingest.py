"""Distributed ingestion of the reference's letter-keyed nested JSON
(operator S2, SURVEY.md §2.1).

The reference flattens `{"A": [{...}], "B": [...]}` with a Python
for-loop on the driver (Pharma_Ingestion_Cleaning.py:30-39) — O(dataset)
through driver memory. Here the flatten is a logical-plan transform:

    one-row DF of letter columns → stack → explode → records

so executors do the work from byte one. At real scale the landing
format should be JSONL (one record per line, splittable); `read_jsonl`
covers that path with an explicit schema (no inference scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import RAW_MEDICATION

#: Element type of each letter's array — RAW_MEDICATION minus the
#: injected first_letter.
_RECORD_FIELDS = [f for f in RAW_MEDICATION.fields if f.name != "first_letter"]


def read_letter_keyed_json(spark: SparkSession, path: str) -> DataFrame:
    """Load the letter-keyed document and flatten to one row per
    medication, injecting `first_letter` (parity with ING:30-39).

    multiLine JSON is unsplittable (one task reads the document) —
    acceptable for the reference's ~3 MB feed; see `read_jsonl` for the
    scale path."""
    import pyspark.sql.types as T

    record = T.StructType(_RECORD_FIELDS)
    doc = spark.read.option("multiLine", "true").json(path)
    letters = sorted(doc.columns)
    # stack('A', A, 'B', B, ...) → (first_letter, meds); explode arrays.
    stack_args = ", ".join(f"'{c}', `{c}`" for c in letters)
    stacked = doc.selectExpr(
        f"stack({len(letters)}, {stack_args}) as (first_letter, meds)"
    )
    exploded = stacked.select(
        "first_letter", F.explode("meds").alias("med")
    )
    cols = [F.col(f"med.{f.name}").alias(f.name) for f in _RECORD_FIELDS]
    flat = exploded.select(*cols, "first_letter")
    # align to the declared record schema (json inference may reorder /
    # widen; casting pins the contract)
    aligned = flat.select(
        *[
            F.col(f.name).cast(record[f.name].dataType if f.name != "first_letter" else "string")
            for f in RAW_MEDICATION.fields
        ]
    )
    return aligned


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Scale path: JSONL landing zone, explicit schema, splittable —
    1000 executors each parse their own byte ranges."""
    return spark.read.schema(RAW_MEDICATION).json(path)
