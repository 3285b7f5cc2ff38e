"""Keyed deduplication.

Reference semantics (internal/processor/processor.go:277-314): composite
key from N dot-path fields — key *names* sorted alphabetically, nil or
missing values replaced by the ``<ETL_NIL_OR_MISSING>`` placeholder,
values canonicalized via ValueToStringForHash; strategies:
  * ``first`` / ``last`` — encounter order in the input slice;
  * ``min`` / ``max`` — extremal value of ``strategyField`` under the
    cross-type CompareValues ordering (numbers compared as double even
    when string-typed, transform.go:1052-1117); ties and incomparable
    values keep the already-stored (earlier) record.

Spark compilation: a window ``row_number() == 1`` per canonical key —
one shuffle on the dedup key, streaming rank within each partition; at
100 TB this is the minimal-shuffle formulation (vs. groupBy + join back).
Encounter order is the ``_etl_seq`` column attached at extract time
(F.monotonically_increasing_id preserves file order per source split).
Reference *output* order is nondeterministic (Go map iteration,
processor.go:311-313), so no output ordering is promised here either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_tool_spark.functions.coerce import DEDUP_NIL_PLACEHOLDER, canonical_for_hash, coerce_double
from etl_tool_spark.operators.errors import POS_COL, SEQ_COL

_STRATEGIES = {"first", "last", "min", "max"}


def _path_col(name: str):
    parts = name.split(".")
    col = F.col(f"`{parts[0]}`")
    for p in parts[1:]:
        col = col.getField(p)
    return col


def _path_dtype(df: DataFrame, name: str) -> str | None:
    from pyspark.sql.types import StructType

    parts = name.split(".")
    schema = df.schema
    cur = None
    for p in parts:
        if not isinstance(schema, StructType) or p not in schema.fieldNames():
            return None
        cur = schema[p].dataType
        schema = cur
    return cur.simpleString()


def dedup(df: DataFrame, keys: list[str], strategy: str = "first",
          strategy_field: str | None = None,
          seq_col: str | None = None) -> DataFrame:
    """Keep one record per composite key. ``seq_col`` names the encounter-
    order column (defaults to ``_etl_seq`` if present, else one is
    attached on the fly)."""
    strategy = (strategy or "first").lower()
    if strategy not in _STRATEGIES:
        raise ValueError(f"unknown dedup strategy {strategy!r}")
    if strategy in ("min", "max") and not strategy_field:
        raise ValueError(f"dedup strategy {strategy!r} requires strategyField")

    seq = seq_col or SEQ_COL
    added_seq = False
    if seq not in df.columns:
        df = df.withColumn(seq, F.monotonically_increasing_id())
        added_seq = True

    key_cols = []
    for k in sorted(keys):  # sorted key names (processor.go:280)
        dt = _path_dtype(df, k)
        if dt is None:
            key_cols.append(F.lit(DEDUP_NIL_PLACEHOLDER))
        else:
            key_cols.append(F.coalesce(canonical_for_hash(_path_col(k), dt),
                                       F.lit(DEDUP_NIL_PLACEHOLDER)))
    composite = F.concat_ws("||", *key_cols)

    pos_tiebreak = [F.col(POS_COL).asc()] if POS_COL in df.columns else []
    if strategy == "first":
        order = [F.col(seq).asc()] + pos_tiebreak
    elif strategy == "last":
        order = [F.col(seq).desc()] + [c.desc() for c in [F.col(POS_COL)]
                                       if POS_COL in df.columns]
    else:
        dt = _path_dtype(df, strategy_field)
        raw = _path_col(strategy_field)
        num = coerce_double(raw, dt)
        s = raw.cast("string")
        # CompareValues ordering: numeric when parseable (even from string),
        # else string compare; nulls/missing lose; ties keep earliest (_seq asc)
        pos = [F.col(POS_COL).asc()] if POS_COL in df.columns else []
        if strategy == "min":
            order = [num.asc_nulls_last(), s.asc_nulls_last(), F.col(seq).asc()] + pos
        else:
            order = [num.desc_nulls_last(), s.desc_nulls_last(), F.col(seq).asc()] + pos

    w = Window.partitionBy(composite).orderBy(*order)
    out = df.withColumn("_etl_rn", F.row_number().over(w)).filter(F.col("_etl_rn") == 1).drop("_etl_rn")
    if added_seq:
        out = out.drop(seq)
    return out
