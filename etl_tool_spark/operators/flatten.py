"""Flatten (explode) stage.

Reference semantics (internal/processor/processor.go:170-230):
  * optional equality gate: if ``conditionField`` is set and the record's
    (stringified) value != ``conditionValue`` ⇒ record passes through
    UNFLATTENED (keeps the source field, no target field);
  * source field missing/nil or non-list ⇒ silently drop the record, or
    error when ``errorOnNonList`` (feeds the error channel);
  * empty list ⇒ zero output records;
  * otherwise one output record per item, item bound to ``targetField``;
    with ``includeParent`` (default true) all parent fields are copied
    minus the source field; with false the output record is only
    ``{targetField: item}``.
  * ``sourceField`` may be a dot-notation path into nested structs
    (getNestedField, processor.go:233-245).

Spark compilation: ``F.explode`` (which already drops null/empty arrays,
matching the default path) on the gated subset, unioned by name with the
pass-through subset. Exploding is fully parallel — no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tool_spark.operators.errors import ERROR_COL, ORIG_COL


def _resolve_path(df: DataFrame, path: str) -> F.Column | None:
    """Dot-path → Column, or None when the path can't exist in the schema."""
    parts = path.split(".")
    if parts[0] not in df.columns:
        return None
    col = F.col(f"`{parts[0]}`")
    for p in parts[1:]:
        col = col.getField(p)
    return col


def _is_array_path(df: DataFrame, path: str) -> bool:
    from pyspark.sql.types import ArrayType, StructType

    parts = path.split(".")
    schema = df.schema
    cur = None
    for i, p in enumerate(parts):
        if not isinstance(schema, StructType) or p not in schema.fieldNames():
            return False
        cur = schema[p].dataType
        schema = cur
    return isinstance(cur, ArrayType)


def flatten(df: DataFrame, source_field: str, target_field: str,
            include_parent: bool = True, error_on_non_list: bool = False,
            condition_field: str | None = None,
            condition_value: str | None = None) -> DataFrame:
    passthrough_cols = df.columns

    src = _resolve_path(df, source_field)
    src_is_array = src is not None and _is_array_path(df, source_field)

    if condition_field:
        cond_col = _resolve_path(df, condition_field)
        if cond_col is None:
            # condition field can never match ⇒ everything passes through
            return df
        gate = cond_col.isNotNull() & (cond_col.cast("string") == F.lit(condition_value or ""))
        to_flatten = df.filter(gate)
        passthrough = df.filter(~F.coalesce(gate, F.lit(False)))
    else:
        to_flatten = df
        passthrough = None

    if src is None or not src_is_array:
        # column missing entirely or statically non-list
        if error_on_non_list:
            flattened = to_flatten.withColumn(
                ERROR_COL,
                F.lit(f"flattening source field '{source_field}' not found or is not a list"))
        else:
            flattened = to_flatten.limit(0)  # records silently dropped
            if target_field not in flattened.columns:
                flattened = flattened.withColumn(target_field, F.lit(None).cast("string"))
    else:
        if error_on_non_list:
            to_flatten = to_flatten.withColumn(
                ERROR_COL,
                F.coalesce(
                    F.col(ERROR_COL) if ERROR_COL in to_flatten.columns else F.lit(None),
                    F.when(src.isNull(),
                           F.lit(f"flattening source field '{source_field}' not found or is nil"))))
            errored = to_flatten.filter(F.col(ERROR_COL).isNotNull())
            ok = to_flatten.filter(F.col(ERROR_COL).isNull())
        else:
            errored = None
            ok = to_flatten
        # posexplode drops null AND empty arrays (the reference default) and
        # keeps the intra-parent position so first/last dedup has true
        # per-flattened-record encounter order (processor.go:204-227)
        from etl_tool_spark.operators.errors import POS_COL, SEQ_COL

        exploded = ok.select("*", F.posexplode(src).alias(POS_COL, target_field))
        if include_parent:
            flattened = _drop_path(exploded, source_field)
        else:
            keep = [target_field] + [c for c in (ERROR_COL, ORIG_COL, SEQ_COL, POS_COL)
                                     if c in exploded.columns]
            flattened = exploded.select(*keep)
        if errored is not None:
            flattened = flattened.unionByName(errored, allowMissingColumns=True)

    if passthrough is not None:
        return flattened.unionByName(passthrough, allowMissingColumns=True)
    return flattened


def _drop_path(df: DataFrame, path: str) -> DataFrame:
    """Remove a (possibly nested) field — removeNestedField parity
    (processor.go:248-273)."""
    parts = path.split(".")
    if len(parts) == 1:
        return df.drop(parts[0])
    root = parts[0]
    if root not in df.columns:
        return df
    return df.withColumn(root, F.col(f"`{root}`").dropFields(".".join(parts[1:])))
