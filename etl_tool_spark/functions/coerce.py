"""Loose type-coercion and canonicalization Column builders.

These reproduce the reference's permissive Go-side parsing
(parseValueAsInt64/Float64, internal/transform/transform.go:945-1030),
its boolean parsing (transform.go:426-463) and its canonical
string-for-hash representation (ValueToStringForHash,
transform.go:574-604) as pure Catalyst expressions, so the "dynamic
typing" of the reference's row-maps costs nothing at scale: every rule
stays inside whole-stage codegen.

All builders are type-directed: they inspect the *Spark* column type when
available (pass ``dtype``) and emit only the needed branch; with no dtype
they emit the general string-path expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "coerce_long", "coerce_double", "coerce_bool", "go_to_string",
    "canonical_for_hash", "NIL_MARKER", "MISSING_MARKER", "DEDUP_NIL_PLACEHOLDER",
]

# Markers from the reference's hash canonicalizer (transform.go:576,661)
NIL_MARKER = "<NIL>"
MISSING_MARKER = "<MISSING>"
# Dedup key placeholder for nil/missing key fields (processor.go:283-291)
DEDUP_NIL_PLACEHOLDER = "<ETL_NIL_OR_MISSING>"

_INT_TYPES = {"tinyint", "smallint", "int", "bigint", "byte", "short", "integer", "long"}
_FLOAT_TYPES = {"float", "double"}


def _simple_name(dtype: str | None) -> str | None:
    return dtype.lower() if dtype else None


def coerce_double(col: Column, dtype: str | None = None) -> Column:
    """Go parseValueAsFloat64 (transform.go:1005-1030): numerics pass,
    strings are trimmed and float-parsed, everything else (bool, time,
    arrays...) ⇒ null."""
    t = _simple_name(dtype)
    if t in _INT_TYPES or t in _FLOAT_TYPES or t == "decimal":
        return col.cast("double")
    if t == "boolean" or (t and t.startswith(("timestamp", "date", "array", "map", "struct", "binary"))):
        return F.lit(None).cast("double")
    # string / unknown: trim then try_cast (Go strconv.ParseFloat on "" fails)
    s = F.trim(col.cast("string"))
    return F.when(s == "", F.lit(None).cast("double")).otherwise(s.try_cast("double"))


def coerce_long(col: Column, dtype: str | None = None) -> Column:
    """Go parseValueAsInt64 (transform.go:945-1002): ints pass; floats only
    when integral; strings parse as int, else as float **if integral**
    (so "12.0" → 12 but "12.5" → null)."""
    t = _simple_name(dtype)
    if t in _INT_TYPES:
        return col.cast("long")
    if t in _FLOAT_TYPES:
        d = col.cast("double")
        return F.when(d == F.floor(d), d.cast("long"))
    if t == "boolean" or (t and t.startswith(("timestamp", "date", "array", "map", "struct", "binary"))):
        return F.lit(None).cast("long")
    s = F.trim(col.cast("string"))
    as_long = s.try_cast("long")
    as_double = s.try_cast("double")
    integral = F.when(as_double == F.floor(as_double), as_double.cast("long"))
    return F.when(s == "", F.lit(None).cast("long")).otherwise(F.coalesce(as_long, integral))


_TRUE_SET = ["true", "1", "yes", "t", "y"]
_FALSE_SET = ["false", "0", "no", "f", "n", ""]


def coerce_bool(col: Column, dtype: str | None = None) -> Column:
    """Go toBool (transform.go:426-463): nil→false; recognized string sets
    (case-insensitive, trimmed); other strings→null; numbers→(v != 0)."""
    t = _simple_name(dtype)
    if t == "boolean":
        return F.coalesce(col, F.lit(False))
    if t in _INT_TYPES or t in _FLOAT_TYPES:
        return F.coalesce(col.cast("double") != 0.0, F.lit(False))
    s = F.lower(F.trim(col.cast("string")))
    return (
        F.when(col.isNull(), F.lit(False))
        .when(s.isin(*_TRUE_SET), F.lit(True))
        .when(s.isin(*_FALSE_SET), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def _double_to_go_string(col: Column) -> Column:
    """Approximate Go strconv.FormatFloat(f,'g',-1,64): integral doubles
    render without a fractional part ("12", not "12.0"); exponent uses
    'e+NN'. Non-integral path keeps Java shortest-repr (documented
    divergence for extreme exponents; see tests)."""
    d = col.cast("double")
    s = d.cast("string")
    # Java "1.0E7" → Go "1e+07"-ish normalization is lossy; handle the
    # overwhelmingly common cases: integral values and plain decimals.
    return (
        F.when(d.isNull(), F.lit(None).cast("string"))
        .when((d == F.floor(d)) & (F.abs(d) < 1e15) & (~s.contains("E")), d.cast("long").cast("string"))
        .otherwise(s)
    )


def _timestamp_to_rfc3339nano(col: Column) -> Column:
    """RFC3339Nano in UTC with trailing fractional zeros trimmed
    (Go time.Time.Format(time.RFC3339Nano), transform.go:594)."""
    base = F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")
    frac = F.date_format(col, ".SSSSSS")
    frac = F.regexp_replace(frac, r"0+$", "")
    frac = F.when(frac == ".", F.lit("")).otherwise(frac)
    return F.concat(base, frac, F.lit("Z"))


def canonical_for_hash(col: Column, dtype: str) -> Column:
    """ValueToStringForHash parity (transform.go:574-604): nil→"<NIL>",
    string as-is, ints base-10, floats %g, bool true/false, time →
    RFC3339Nano UTC."""
    t = _simple_name(dtype)
    if t in _INT_TYPES:
        body = col.cast("string")
    elif t in _FLOAT_TYPES:
        body = _double_to_go_string(col)
    elif t == "boolean":
        body = col.cast("string")  # Spark renders true/false like Go
    elif t and t.startswith("timestamp"):
        body = _timestamp_to_rfc3339nano(col)
    elif t == "date":
        body = _timestamp_to_rfc3339nano(col.cast("timestamp"))
    else:
        body = col.cast("string")
    return F.coalesce(body, F.lit(NIL_MARKER))


def go_to_string(col: Column, dtype: str | None = None) -> Column:
    """toString (transform.go:466-475): nil→""; else Go %v rendering —
    matches Spark's string cast for strings/ints/bools; floats use the
    %g-style rendering."""
    t = _simple_name(dtype)
    if t in _FLOAT_TYPES:
        body = _double_to_go_string(col)
    elif t and t.startswith("timestamp"):
        body = _timestamp_to_rfc3339nano(col)
    else:
        body = col.cast("string")
    return F.coalesce(body, F.lit(""))
