"""Filter stage: govaluate predicate over source records, pre-transform
(reference: internal/app/app.go:150-164).

The reference evaluates the compiled expression per record and skips
records whose evaluation errors or returns non-bool. Here the expression
compiles to a Catalyst predicate: null results (the eval-error analogue)
are dropped by ``DataFrame.filter`` semantics, and — unlike the reference —
Catalyst pushes the predicate into the Parquet/JDBC scan, so at 100 TB the
filtered data is never read at all."""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_tool_spark.expr import compile_filter


def apply_filter(df: DataFrame, expression: str | None) -> DataFrame:
    if not expression:
        return df
    return df.filter(compile_filter(expression))
