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
            # placeholder applies BEFORE canonicalization: a null key field
            # must hash as '<ETL_NIL_OR_MISSING>' (processor.go:283-291) —
            # canonical_for_hash would render it '<NIL>', which a literal
            # string value "<NIL>" could collide with
            col = _path_col(k)
            key_cols.append(F.when(col.isNull(), F.lit(DEDUP_NIL_PLACEHOLDER))
                             .otherwise(canonical_for_hash(col, dt)))
    # materialize the composite key ONCE: both the group-numeric window and
    # the ranking window partition on the same column id, so Catalyst plans
    # one Exchange (a re-derived expression would shuffle twice)
    df = df.withColumn("_etl_key", F.concat_ws("||", *key_cols))
    composite = F.col("_etl_key")

    pos_tiebreak = [F.col(POS_COL).asc()] if POS_COL in df.columns else []
    if strategy == "first":
        order = [F.col(seq).asc()] + pos_tiebreak
    elif strategy == "last":
        order = [F.col(seq).desc()] + [c.desc() for c in [F.col(POS_COL)]
                                       if POS_COL in df.columns]
    else:
        dt = _path_dtype(df, strategy_field)
        pos = [F.col(POS_COL).asc()] if POS_COL in df.columns else []
        if dt is None:
            # strategy field absent from the schema: every comparison is
            # missing-vs-missing, so Go keeps the stored (earliest) record
            order = [F.col(seq).asc()] + pos
        else:
            raw = _path_col(strategy_field)
            if dt.startswith(("timestamp", "date")):
                # Go compares time.Time chronologically (transform.go:1089-
                # 1098); epoch double reproduces that ordering exactly
                num = raw.cast("timestamp").cast("double")
            else:
                num = coerce_double(raw, dt)
            s = raw.cast("string")
            # CompareValues (transform.go:1052-1117) compares numerically
            # only when BOTH sides parse as float, else falls back to
            # same-type compare (lexical for strings, false<true for bool).
            # Declarative rendering: numeric order iff EVERY non-null value
            # in the key group parses; else lexical. (Groups mixing numeric
            # and non-numeric strings make Go's pairwise relation
            # non-transitive — its fold result then depends on encounter
            # order and no ORDER BY can reproduce it; the group-level rule
            # is the deterministic rendering of the same intent.)
            # Go CompareValues(nil, x) = -1, so a present-but-nil strategy
            # value WINS 'min' and loses 'max'; among nils the earliest
            # wins (ties keep the stored record).
            df = df.withColumn(
                "_etl_allnum",
                F.min(F.when(raw.isNull(), F.lit(1))
                       .otherwise(num.isNotNull().cast("int")))
                 .over(Window.partitionBy(composite)) == 1)
            num_key = F.when(F.col("_etl_allnum"), num)
            str_key = F.when(~F.col("_etl_allnum"), s)
            if strategy == "min":
                null_rank = F.when(raw.isNull(), 0).otherwise(1)
                order = [null_rank.asc(), num_key.asc_nulls_first(),
                         str_key.asc_nulls_first(), F.col(seq).asc()] + pos
            else:
                null_rank = F.when(raw.isNull(), 1).otherwise(0)
                order = [null_rank.asc(), num_key.desc_nulls_last(),
                         str_key.desc_nulls_last(), F.col(seq).asc()] + pos

    w = Window.partitionBy(composite).orderBy(*order)
    out = df.withColumn("_etl_rn", F.row_number().over(w)).filter(F.col("_etl_rn") == 1)
    out = out.drop(*[c for c in ("_etl_rn", "_etl_allnum", "_etl_key")
                     if c in out.columns])
    if added_seq:
        out = out.drop(seq)
    return out
