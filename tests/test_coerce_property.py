"""Property-based coercion parity: random dirty strings through
coerce_long / coerce_double / coerce_bool must match a Python reference
implementation of the Go parsing rules (parseValueAsInt64/Float64,
transform.go:945-1030; toBool, transform.go:426-463)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_tool_spark.functions.coerce import coerce_bool, coerce_double, coerce_long

dirty = st.one_of(
    st.just(None),
    st.sampled_from(["", " ", "12", " 12 ", "12.0", "12.5", "-3", "+7", "abc",
                     "1e3", "0.0", "-0.5", "true", "YES", "n", "  t ", "maybe",
                     "9223372036854775807", "0x10", "1,000", ".5", "5."]),
    st.integers(-10**6, 10**6).map(str),
    st.floats(-1e6, 1e6, allow_nan=False).map(lambda f: f"{f:.3f}"),
)


def go_parse_int(v):
    if v is None:
        return None
    s = v.strip()
    if not s:
        return None
    try:
        return int(s, 10)
    except ValueError:
        pass
    try:
        f = float(s)
    except ValueError:
        return None
    if math.trunc(f) == f and abs(f) <= 2**63 - 1:
        return int(f)
    return None


def go_parse_float(v):
    if v is None:
        return None
    s = v.strip()
    if not s:
        return None
    try:
        f = float(s)
        return None if math.isnan(f) or math.isinf(f) else f
    except ValueError:
        return None


def go_to_bool(v):
    if v is None:
        return False
    s = v.strip().lower()
    if s in ("true", "1", "yes", "t", "y"):
        return True
    if s in ("false", "0", "no", "f", "n", ""):
        return False
    return None


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(dirty, min_size=1, max_size=20))
def test_coercions_match_go_reference(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    out = df.select(
        "v",
        coerce_long(F.col("v"), "string").alias("i"),
        coerce_double(F.col("v"), "string").alias("f"),
        coerce_bool(F.col("v"), "string").alias("b"),
    ).collect()
    for r in out:
        v = r["v"]
        assert r["i"] == go_parse_int(v), f"int({v!r})"
        got_f, exp_f = r["f"], go_parse_float(v)
        if exp_f is None:
            assert got_f is None, f"float({v!r})"
        else:
            assert got_f == pytest.approx(exp_f), f"float({v!r})"
        assert r["b"] == go_to_bool(v), f"bool({v!r})"
