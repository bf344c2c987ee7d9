"""Physical-plan introspection — the engine's performance contract,
made assertable.

"Would this plan survive a 100× scale-up?" is checked by reading the
plan, not guessing: filters must reach the parquet scan
(PushedFilters), projections must prune the read schema (ReadSchema),
small dims must broadcast, and hot expressions should sit inside
WholeStageCodegen spans. tests/test_plans.py pins these properties for
the headline queries so a regression (a UDF sneaking in, a filter
landing post-scan, a broadcast degrading to sort-merge-join) fails CI
instead of shipping a 10× slower plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read from each parquet scan (pruning check)."""
    plan = formatted_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    out = []
    for s in schemas:
        cols = {c.split(":")[0].strip() for c in s.split(",") if c.strip()}
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Distinct codegen stage ids (string plans mark operators `*(id)`;
    formatted plans say `WholeStageCodegen (id)`)."""
    plan = executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
