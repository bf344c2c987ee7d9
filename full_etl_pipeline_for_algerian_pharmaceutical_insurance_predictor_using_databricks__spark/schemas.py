"""Explicit schemas for every table the engine touches.

The reference infers schemas dynamically (`spark.createDataFrame(dicts)`,
Pharma_Ingestion_Cleaning.py:42) — at 100 TB that is a full-scan sampling
hazard and a silent-drift hazard. We declare StructTypes for all inputs:
scans prune columns against a known schema, and a schema change in the
upstream data fails loudly at analysis time instead of corrupting results.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# TPC-H-ish star schema (driver-generated fixtures, FIXTURES.md 1-7)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

# events.parquet physically stores ts as TIMESTAMP(NANOS); with
# nanosAsLong it surfaces as int64 and sources.catalog converts to a
# proper timestamp. This is the *logical* schema after loading.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# --------------------------------------------------------------------------
# Reference source-data shape (SURVEY.md §1.2) — raw medication record as
# fetched from the letter-keyed JSON, before flattening/cleaning.
# Evidence: Pharma_Ingestion_Cleaning.py:66-91 (struct access sites).
# --------------------------------------------------------------------------

RAW_MEDICATION = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField(
            "lab",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("address", T.StringType()),
                    T.StructField("tel", T.StringType()),
                    T.StructField("web", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "class",
            T.StructType(
                [
                    T.StructField("therapeutic", T.StringType()),
                    T.StructField("pharmacological", T.StringType()),
                ]
            ),
        ),
        T.StructField("form", T.StringType()),
        T.StructField("generic", T.StringType()),
        T.StructField("reference_rate", T.StringType()),
        T.StructField("refundable", T.BooleanType()),  # tri-state: true/false/NULL
        T.StructField("first_letter", T.StringType()),
    ]
)

#: Cleaned `medications` table schema (post-ingestion, what the Delta sink
#: freezes at Pharma_Ingestion_Cleaning.py:211).
MEDICATIONS = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("first_letter", T.StringType()),
        T.StructField("lab_name", T.StringType()),
        T.StructField("lab_address", T.StringType()),
        T.StructField("lab_tel", T.StringType()),
        T.StructField("lab_web", T.StringType()),
        T.StructField("therapeutic_class", T.StringType()),
        T.StructField("pharmacological_class", T.StringType()),
        T.StructField("form", T.StringType()),
        T.StructField("generic", T.StringType()),
        T.StructField("reference_rate", T.StringType()),
        T.StructField("price", T.IntegerType()),
        T.StructField("price_category", T.StringType()),
        T.StructField("refundable", T.BooleanType()),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
