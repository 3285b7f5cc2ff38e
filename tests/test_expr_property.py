"""Property-based check of the govaluate→Column translator: random
expression trees evaluated by an independent Python interpreter
(govaluate float64 semantics: all math in double, Java-style %, division
by zero ⇒ eval error ⇒ null/row-skip) must agree with Spark row by row.
Catches precedence, typing and null-handling drift that example-based
tests miss."""

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tool_spark.expr import translate

COLS = {"a": 3.0, "b": -2.0, "c": 0.0, "s": "active", "t": "x"}

numeric_leaf = st.sampled_from(["a", "b", "c", "1", "2", "7.5", "0.5"])
string_leaf = st.sampled_from(["s", "t", "'active'", "'x'", "'y'"])


@st.composite
def numeric_expr(draw, depth=0, total_ops=("+", "-", "*", "/", "%", "**")):
    if depth > 2 or draw(st.booleans()):
        return draw(numeric_leaf)
    op = draw(st.sampled_from(total_ops))
    # % after ** is numerically ill-conditioned across implementations:
    # pow() is only correct to ~1 ulp (implementation-defined in both
    # Java and C), and fmod amplifies a 1-ulp difference in a huge
    # dividend (or modulus) into an arbitrarily different remainder —
    # e.g. fmod((3**7.5)**6, 3) legitimately differs between engines.
    # Every other operator is IEEE-exact, so relative tolerance holds;
    # keep ** out of both subtrees of %.
    sub_ops = tuple(o for o in total_ops if o != "**") if op == "%" else total_ops
    l = draw(numeric_expr(depth + 1, sub_ops))
    r = draw(numeric_expr(depth + 1, sub_ops))
    return f"({l} {op} {r})"


# Inside boolean trees, exclude the null-producing operators (/ % **):
# the reference evaluator models eval-error eagerly while Spark applies
# Kleene logic (null || true = true) — both outcomes are defensible
# govaluate-wise, and null propagation is already covered by the pure
# numeric property.
_TOTAL_SAFE = ("+", "-", "*")


@st.composite
def bool_expr(draw, depth=0):
    kind = draw(st.integers(0, 3 if depth < 2 else 1))
    if kind == 0:
        op = draw(st.sampled_from(["==", "!=", "<", ">", "<=", ">="]))
        l = draw(numeric_expr(total_ops=_TOTAL_SAFE))
        r = draw(numeric_expr(total_ops=_TOTAL_SAFE))
        return f"({l} {op} {r})"
    if kind == 1:
        op = draw(st.sampled_from(["==", "!="]))
        return f"({draw(string_leaf)} {op} {draw(string_leaf)})"
    if kind == 2:
        op = draw(st.sampled_from(["&&", "||"]))
        return f"({draw(bool_expr(depth + 1))} {op} {draw(bool_expr(depth + 1))})"
    return f"(!{draw(bool_expr(depth + 1))})"


class GD(float):
    """float with govaluate/Java arithmetic: % is fmod (sign of dividend),
    x/0 and x%0 raise (→ modeled as null)."""

    def __mod__(self, o):
        if float(o) == 0.0:
            raise ZeroDivisionError
        try:
            return GD(math.fmod(self, float(o)))
        except ValueError:  # fmod(±inf, y) raises here; Go/Java yield NaN
            return GD(math.nan)

    def __add__(self, o):
        return GD(float(self) + float(o))

    def __sub__(self, o):
        return GD(float(self) - float(o))

    def __mul__(self, o):
        return GD(float(self) * float(o))

    def __truediv__(self, o):
        if float(o) == 0.0:
            raise ZeroDivisionError
        return GD(float(self) / float(o))

    def __pow__(self, o):
        try:
            v = float(self) ** float(o)
        except OverflowError:  # double semantics: overflow → inf, not error
            return GD(math.inf)
        except ZeroDivisionError:  # 0 ** negative
            return GD(math.inf)
        if isinstance(v, complex) or math.isnan(v):
            # negative base + fractional exponent (complex in Python, NaN
            # in Math.pow) → engine yields null
            raise ZeroDivisionError
        return GD(v)

    def __neg__(self):
        return GD(-float(self))


def _pythonize(e: str) -> str:
    expr = e.replace("&&", " and ").replace("||", " or ").replace("!(", " not (")
    for name, val in COLS.items():
        repl = repr(val) if isinstance(val, str) else f"GD({val})"
        expr = re.sub(rf"\b{name}\b", repl, expr)
    # wrap bare numeric literals so every operand carries GD semantics
    expr = re.sub(r"(?<![\w.'])(\d+(?:\.\d+)?)(?!['\w.])", r"GD(\1)", expr)
    return expr


def py_eval(e: str):
    try:
        v = eval(_pythonize(e), {"__builtins__": {}, "GD": GD}, {})  # noqa: S307 - closed test input
    except ZeroDivisionError:
        return None
    if isinstance(v, float):
        if math.isinf(v) or math.isnan(v):
            return None
        return float(v)
    return v


@pytest.fixture(scope="module")
def row_df(spark):
    return spark.createDataFrame(
        [(COLS["a"], COLS["b"], COLS["c"], COLS["s"], COLS["t"])],
        "a double, b double, c double, s string, t string")


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(e=numeric_expr())
def test_numeric_expressions_agree(row_df, e):
    expected = py_eval(e)
    got = row_df.select(translate(e).cast("double").alias("v")).collect()[0]["v"]
    if expected is None or got is None:
        # Spark renders inf/nan where Python raised, or vice versa — both
        # count as "eval error ⇒ skip" in the filter contract
        assert (expected is None) == (got is None or math.isinf(got) or math.isnan(got)), e
    else:
        assert got == pytest.approx(expected, rel=1e-9, abs=1e-9), e


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(e=bool_expr())
def test_boolean_expressions_agree(row_df, e):
    expected = py_eval(e)
    got = row_df.select(translate(e).alias("v")).collect()[0]["v"]
    if expected is None:
        assert got is None, e
    else:
        assert got == bool(expected), e
