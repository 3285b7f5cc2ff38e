"""govaluate-translator parity tests (grammar per SURVEY.md §2.4; the
reference compiles these with Knetic/govaluate v3 at app.go:44-48)."""

import pytest

from etl_tool_spark.expr import ExprError, translate


def rows(spark, df, expr):
    return [r[0] for r in df.select(translate(expr).alias("v")).collect()]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("active", 10.0, 5, "a@x.com"), ("inactive", -1.0, 12, "bad"),
         ("active", 0.0, 15, "c@y.org"), ("discontinued", 3.5, 0, None)],
        "status string, amount double, priority int, email string")


def test_comparators_and_logic(spark, df):
    out = df.filter(translate("status == 'active' && amount > 0")).collect()
    assert len(out) == 1 and out[0]["amount"] == 10.0


def test_numeric_comparison_casts_strings(spark):
    df = spark.createDataFrame([("12",), ("3",), ("abc",)], "v string")
    # govaluate compares numbers as float64; "abc" ⇒ eval error ⇒ skipped
    out = df.filter(translate("v >= 10")).collect()
    assert [r["v"] for r in out] == ["12"]


def test_in_operator(spark, df):
    out = df.filter(translate("status IN ('active', 'pending')")).collect()
    assert len(out) == 2


def test_regex_match(spark, df):
    out = df.filter(translate(r"email =~ '^\S+@\S+\.\S+$'")).collect()
    assert len(out) == 2
    out = df.filter(translate(r"email !~ '^\S+@\S+\.\S+$'")).collect()
    assert [r["email"] for r in out] == ["bad"]


def test_arithmetic_precedence(spark, df):
    vals = rows(spark, df.limit(1), "2 + 3 * 4 ** 2 - 1")
    assert vals == [49.0]


def test_ternary_and_coalesce(spark, df):
    vals = rows(spark, df, "priority >= 10 ? 'hi' : 'lo'")
    assert vals == ["lo", "hi", "hi", "lo"]
    vals = rows(spark, df, "email ?? 'none'")
    assert vals[-1] == "none"


def test_modulo_and_division(spark, df):
    assert rows(spark, df.limit(1), "7 % 3") == [1.0]
    assert rows(spark, df.limit(1), "10 / 4") == [2.5]


def test_unary_not_and_neg(spark, df):
    out = df.filter(translate("!(priority >= 10)")).count()
    assert out == 2
    assert rows(spark, df.limit(1), "-(2 + 3)") == [-5.0]


def test_bitwise(spark, df):
    assert rows(spark, df.limit(1), "6 & 3") == [2]
    assert rows(spark, df.limit(1), "6 | 3") == [7]
    assert rows(spark, df.limit(1), "6 ^ 3") == [5]
    assert rows(spark, df.limit(1), "1 << 4") == [16]


def test_string_concat(spark, df):
    assert rows(spark, df.limit(1), "'a' + 'b'") == ["ab"]


def test_bracketed_identifier(spark):
    df = spark.createDataFrame([(1,)], "`weird name` int")
    assert rows(spark, df, "[weird name] + 1") == [2.0]


def test_parse_errors():
    for bad in ["", "a &&", "1 +", "x IN (", "(a"]:
        with pytest.raises(ExprError):
            translate(bad)


def test_division_by_zero_skips(spark, df):
    # govaluate float division; our try_divide yields null ⇒ filter drops
    assert df.filter(translate("amount / 0 > 1")).count() == 0
