from .audit import (
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
    "whole_stage_codegen_spans",
]
