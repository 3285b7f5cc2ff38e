"""Filter stage: govaluate predicate over source records, pre-transform
(reference: internal/app/app.go:150-164).

The reference evaluates the compiled expression per record and skips
records whose evaluation errors — writing them to the error file when one
is configured (app.go:156-161), but never halting on them. Here the
expression compiles to a Catalyst predicate: null results are the
eval-error analogue. ``apply_filter`` keeps only TRUE rows (nulls drop
with the falses — and the predicate pushes into the Parquet/JDBC scan, so
at 100 TB the filtered data is never read at all);
``apply_filter_with_errors`` additionally surfaces the null-predicate
rows as an error frame for the error file."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tool_spark.expr import compile_filter
from etl_tool_spark.operators.errors import ERROR_MESSAGE_FIELD, SEQ_COL


def apply_filter(df: DataFrame, expression: str | None) -> DataFrame:
    if not expression:
        return df
    return df.filter(compile_filter(expression))


def apply_filter_with_errors(df: DataFrame,
                             expression: str | None) -> tuple[DataFrame, DataFrame]:
    """(kept, filter_errors): kept rows are those where the predicate is
    TRUE (pushdown-friendly — the error branch is its own scan with its
    own IS NULL pushdown); filter_errors carries the ORIGINAL record
    columns + etl_error_message, matching the reference's error-file rows
    for filter eval failures (app.go:156-161)."""
    src_cols = [c for c in df.columns if c != SEQ_COL]
    empty_errors = (df.limit(0).select(*src_cols)
                      .withColumn(ERROR_MESSAGE_FIELD, F.lit("")))
    if not expression:
        return df, empty_errors
    pred = compile_filter(expression)
    errors = (df.filter(pred.isNull())
                .select(*src_cols)
                .withColumn(ERROR_MESSAGE_FIELD, F.lit("filter eval error")))
    return df.filter(pred), errors
