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
    # align to the declared record schema BY NAME, field by field —
    # never by a positional struct cast: json inference sorts nested
    # fields alphabetically, and casting the whole struct re-labels
    # them positionally (lab.name would silently receive the address,
    # therapeutic↔pharmacological would swap).  Inference also DROPS
    # all-null nested fields, so each subfield is looked up defensively
    # and NULLed when absent.
    inferred = {f.name: f.dataType for f in exploded.schema["med"].dataType.fields}

    def subfield(parent: str, name: str, dtype) -> F.Column:
        # An all-null parent is inferred as StringType, not StructType —
        # guard the fieldNames() probe or the lookup raises instead of
        # emitting a null-filled struct.
        parent_type = inferred.get(parent)
        present = (
            isinstance(parent_type, T.StructType)
            and name in parent_type.fieldNames()
        )
        col = F.col(f"med.{parent}.{name}") if present else F.lit(None)
        return col.cast(dtype).alias(name)

    cols: list[F.Column] = []
    for f in _RECORD_FIELDS:
        if isinstance(f.dataType, T.StructType):
            cols.append(
                F.struct(
                    *[
                        subfield(f.name, sf.name, sf.dataType)
                        for sf in f.dataType.fields
                    ]
                ).alias(f.name)
            )
        else:
            present = f.name in inferred
            col = F.col(f"med.{f.name}") if present else F.lit(None)
            cols.append(col.cast(f.dataType).alias(f.name))
    flat = exploded.select(*cols, F.col("first_letter").cast("string"))
    return flat.select(*[F.col(f.name) for f in RAW_MEDICATION.fields])


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Scale path: JSONL landing zone, explicit schema, splittable —
    1000 executors each parse their own byte ranges."""
    return spark.read.schema(RAW_MEDICATION).json(path)
