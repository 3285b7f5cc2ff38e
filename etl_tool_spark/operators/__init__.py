"""Pipeline-level operators: filter, mapping chain, flatten, dedup, error
channel — the reference's six-stage pipeline (internal/app/app.go:148-181)
re-expressed as lazy DataFrame combinators that compose into ONE logical
plan (no intermediate materialization, unlike the reference's three
sequential in-memory passes)."""

from etl_tool_spark.operators.dedup import dedup
from etl_tool_spark.operators.errors import ERROR_COL, split_errors
from etl_tool_spark.operators.filter import apply_filter
from etl_tool_spark.operators.flatten import flatten
from etl_tool_spark.operators.mapping import apply_mappings

__all__ = ["apply_filter", "apply_mappings", "flatten", "dedup",
           "split_errors", "ERROR_COL"]
