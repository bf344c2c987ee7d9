from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark import (  # noqa: E402
    get_spark,
)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", shuffle_partitions=8)
    _compact_local_relations(s)
    yield s
    s.stop()


def _compact_local_relations(s):
    """createDataFrame(list, ...) fans the rows over
    `defaultParallelism` pickled Python slices; any single-task
    consumer (the suite's ubiquitous `.coalesce(1)` one-file commits)
    then pays one Python-worker round trip PER SLICE, sequentially —
    measured 4.5 s per 2-row write at local[32] vs 0.3 s with one
    slice, which made the two log-lifecycle property tests alone cost
    ~22 of the suite's 58 minutes.  Route list/tuple inputs through
    parallelize() with slices sized to the data (1 per ~1000 rows,
    capped at defaultParallelism).  Rows, schema, and inference
    semantics are untouched — only the number of local slices changes,
    and code that needs spread (e.g. _contract_docs) repartitions
    explicitly anyway.  Test-session-only shim; the product's own
    metadata frames use sources.catalog.local_rows_df."""
    from pyspark.sql import Row
    from pyspark.sql.types import StructType

    orig = s.createDataFrame

    def create(data=None, schema=None, **kw):
        if (
            not kw
            and isinstance(schema, (str, StructType))
            and isinstance(data, list)
            and data
            and all(isinstance(r, (tuple, Row)) for r in data)
        ):
            rdd = s.sparkContext.parallelize(
                data,
                max(1, min(
                    s.sparkContext.defaultParallelism,
                    len(data) // 1000 + 1,
                )),
            )
            return orig(rdd, schema)
        if schema is not None:
            return orig(data, schema, **kw)
        return orig(data, **kw)

    s.createDataFrame = create


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct():
    return SF_CORRECT
