"""Transform-registry parity tests; the inputs/expected pairs follow the
reference's table-driven tests (internal/transform/transform_test.go) and
the semantics cited in each builder's docstring."""

import datetime

import pytest
from pyspark.sql import functions as F

from etl_tool_spark.datefmt import go_layout_to_jvm
from etl_tool_spark.functions.registry import Ctx, TransformError, apply_transform  # noqa: F401


def run1(spark, value, dtype, name, params=None, extra=None):
    """Apply transform to a single-column single-row frame, return value."""
    schema = f"v {dtype}"
    row = [value]
    if extra:
        for k, (ev, et) in extra.items():
            schema += f", {k} {et}"
            row.append(ev)
    df = spark.createDataFrame([tuple(row)], schema)
    dtypes = dict(df.dtypes)
    res = apply_transform(name, params, F.col("v"), dtypes["v"], dtypes=dtypes)
    out = df.select(res.value.alias("out"),
                    *( [res.error.alias("err")] if res.error is not None else [] )).collect()[0]
    d = out.asDict()
    d.setdefault("err", None)
    return d


def test_go_layout_conversion():
    assert go_layout_to_jvm("2006-01-02") == "yyyy-MM-dd"
    assert go_layout_to_jvm("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss"
    assert go_layout_to_jvm("01/02/2006") == "MM/dd/yyyy"
    assert go_layout_to_jvm("2006-01-02T15:04:05Z07:00") == "yyyy-MM-dd'T'HH:mm:ssXXX"
    assert go_layout_to_jvm("Jan 2, 2006") == "MMM d, yyyy"


@pytest.mark.parametrize("value,expected", [
    (" 12 ", 12), ("12.0", 12), ("12.5", None), ("", None), ("abc", None),
])
def test_to_int_string_paths(spark, value, expected):
    assert run1(spark, value, "string", "toInt")["out"] == expected


def test_to_int_float_paths(spark):
    assert run1(spark, 12.0, "double", "toInt")["out"] == 12
    assert run1(spark, 12.5, "double", "toInt")["out"] is None


@pytest.mark.parametrize("value,expected", [
    (" 3.14 ", 3.14), ("10", 10.0), ("x", None), ("", None),
])
def test_to_float(spark, value, expected):
    assert run1(spark, value, "string", "toFloat")["out"] == expected


@pytest.mark.parametrize("value,expected", [
    ("true", True), ("YES", True), ("t", True), ("1", True), ("y", True),
    ("false", False), ("0", False), ("no", False), ("", False),
    ("maybe", None), (None, False),
])
def test_to_bool(spark, value, expected):
    assert run1(spark, value, "string", "toBool")["out"] == expected


def test_to_bool_numeric(spark):
    assert run1(spark, 2, "int", "toBool")["out"] is True
    assert run1(spark, 0, "int", "toBool")["out"] is False


def test_to_string(spark):
    assert run1(spark, None, "string", "toString")["out"] == ""
    assert run1(spark, 12.0, "double", "toString")["out"] == "12"
    assert run1(spark, 3.5, "double", "toString")["out"] == "3.5"
    assert run1(spark, True, "boolean", "toString")["out"] == "true"


def test_epoch_to_date(spark):
    assert run1(spark, 1700000000, "bigint", "epochToDate")["out"] == "2023-11-14"
    assert run1(spark, "1700000000.9", "string", "epochToDate")["out"] == "2023-11-14"
    # unparseable ⇒ pass-through original
    assert run1(spark, "nope", "string", "epochToDate")["out"] == "nope"


def test_date_convert_fallbacks(spark):
    p = {"outputFormat": "2006-01-02"}
    for s in ["2024-03-05", "2024/03/05", "03/05/2024", "2024-03-05 10:00:00",
              "2024-03-05T10:00:00Z", "20240305"]:
        assert run1(spark, s, "string", "dateConvert", p)["out"] == "2024-03-05", s
    # explicit input format
    out = run1(spark, "05.03.2024", "string", "dateConvert",
               {"inputFormat": "02.01.2006", "outputFormat": "2006-01-02"})["out"]
    assert out == "2024-03-05"
    # unparseable passes through
    assert run1(spark, "garbage", "string", "dateConvert", p)["out"] == "garbage"


def test_date_convert_timestamp_input(spark):
    ts = datetime.datetime(2024, 3, 5, 10, 30)
    out = run1(spark, ts, "timestamp", "dateConvert", {"outputFormat": "2006-01-02"})["out"]
    assert out == "2024-03-05"


def test_multi_date_convert(spark):
    p = {"formats": ["02.01.2006", "2006_01_02"], "outputFormat": "2006-01-02"}
    assert run1(spark, "2024_03_05", "string", "multiDateConvert", p)["out"] == "2024-03-05"
    assert run1(spark, "junk", "string", "multiDateConvert", p)["out"] == "junk"
    with pytest.raises(TransformError):
        run1(spark, "x", "string", "multiDateConvert", {"outputFormat": "2006"})


def test_calculate_age(spark):
    future = 4102444800  # 2100-01-01
    assert run1(spark, future, "bigint", "calculateAge")["out"] == 0
    past = run1(spark, 946684800, "bigint", "calculateAge")["out"]  # 2000-01-01
    assert past > 9000
    assert run1(spark, "bad", "string", "calculateAge")["out"] is None


def test_must_variants_error_channel(spark):
    r = run1(spark, "abc", "string", "mustToInt")
    assert r["out"] is None and r["err"] is not None
    r = run1(spark, "42", "string", "mustToInt")
    assert r["out"] == 42 and r["err"] is None
    r = run1(spark, "", "string", "mustToBool")  # "" errors unlike toBool
    assert r["err"] is not None
    r = run1(spark, "junk", "string", "mustDateConvert", {"outputFormat": "2006-01-02"})
    assert r["err"] is not None


def test_string_functions(spark):
    assert run1(spark, "  hi  ", "string", "trim")["out"] == "hi"
    assert run1(spark, "hi", "string", "toUpperCase")["out"] == "HI"
    assert run1(spark, "HI", "string", "toLowerCase")["out"] == "hi"
    assert run1(spark, 5, "int", "trim")["out"] == 5  # non-string pass-through
    assert run1(spark, "a-b-c", "string", "replaceAll", {"old": "-", "new": "+"})["out"] == "a+b+c"


@pytest.mark.parametrize("value,start,length,expected", [
    ("hello", 1, 3, "ell"), ("hello", -2, 3, "hel"), ("hello", 0, 0, ""),
    ("hello", 10, 3, ""), ("hello", 3, 99, "lo"), ("héllo", 1, 2, "él"),
])
def test_substring_clamping(spark, value, start, length, expected):
    out = run1(spark, value, "string", "substring", {"start": start, "length": length})["out"]
    assert out == expected


def test_regex_extract(spark):
    p = {"pattern": r"id=(\d+)"}
    assert run1(spark, "id=42;x", "string", "regexExtract", p)["out"] == "42"
    assert run1(spark, "nothing", "string", "regexExtract", p)["out"] is None
    # shorthand form
    assert run1(spark, "id=7", "string", r"regexExtract:id=(\d+)")["out"] == "7"


def test_coalesce_fields(spark):
    out = run1(spark, None, "string", "coalesce", {"fields": ["a", "b", "v"]},
               extra={"a": ("", "string"), "b": (None, "string")})
    assert out["out"] is None  # v is also null here
    out = run1(spark, "keep", "string", "coalesce", {"fields": ["a", "v"]},
               extra={"a": ("", "string")})
    assert out["out"] == "keep"  # empty string skipped


def test_branch(spark):
    params = {"branches": [
        {"condition": "inputValue >= 10", "value": "big"},
        {"condition": "inputValue >= 5", "value": "mid"},
    ]}
    assert run1(spark, 12, "int", "branch", params)["out"] == "big"
    assert run1(spark, 7, "int", "branch", params)["out"] == "mid"
    assert run1(spark, 1, "int", "branch", params)["out"] == "1"  # none ⇒ original


def test_branch_reads_record_fields(spark):
    params = {"branches": [{"condition": "other == 'x'", "value": "matched"}]}
    out = run1(spark, "v0", "string", "branch", params, extra={"other": ("x", "string")})
    assert out["out"] == "matched"


def test_hash_sha256_canonicalization(spark):
    import hashlib

    # fields sorted: a, b, v → "1||x||<NIL>"
    out = run1(spark, None, "string", "hash",
               {"algorithm": "sha256", "fields": ["v", "b", "a"]},
               extra={"a": (1, "bigint"), "b": ("x", "string")})
    expected = hashlib.sha256(b"1||x||<NIL>").hexdigest()
    assert out["out"] == expected


def test_hash_missing_field_marker(spark):
    import hashlib

    out = run1(spark, "z", "string", "hash",
               {"algorithm": "sha256", "fields": ["v", "nope"]})
    expected = hashlib.sha256(b"<MISSING>||z").hexdigest()
    assert out["out"] == expected


def test_hash_float_rendering(spark):
    import hashlib

    out = run1(spark, 12.0, "double", "hash", {"algorithm": "sha256", "fields": ["v"]})
    assert out["out"] == hashlib.sha256(b"12").hexdigest()  # Go %g: "12" not "12.0"


def test_hash_fips_rejects_md5(spark):
    df_dtypes = {"v": "string"}
    with pytest.raises(TransformError):
        apply_transform("hash", {"algorithm": "md5", "fields": ["v"]},
                        F.col("v"), "string", dtypes=df_dtypes, fips=True)


def test_validations(spark):
    assert run1(spark, "  ", "string", "validateRequired")["err"] is not None
    assert run1(spark, "ok", "string", "validateRequired")["err"] is None
    assert run1(spark, "nope", "string", "validateRegex", {"pattern": r"^\d+$"})["err"] is not None
    assert run1(spark, "123", "string", "validateRegex", {"pattern": r"^\d+$"})["err"] is None
    assert run1(spark, 5, "int", "validateRegex", {"pattern": r"^\d+$"})["err"] is None  # non-string passes
    assert run1(spark, "150", "string", "validateNumericRange", {"min": 0, "max": 100})["err"] is not None
    assert run1(spark, "50", "string", "validateNumericRange", {"min": 0, "max": 100})["err"] is None
    assert run1(spark, "NaNope", "string", "validateNumericRange", {"min": 0, "max": 1})["err"] is None


def test_validate_allowed_values_cross_type(spark):
    # int 10 matches "10" in allowed list (CompareValues numeric equality)
    assert run1(spark, 10, "int", "validateAllowedValues", {"values": ["10", "20"]})["err"] is None
    assert run1(spark, "urgent", "string", "validateAllowedValues",
                {"values": ["urgent", "high"]})["err"] is None
    assert run1(spark, "nope", "string", "validateAllowedValues",
                {"values": ["urgent", "high"]})["err"] is not None


def test_unknown_transform_passes_through(spark):
    with pytest.warns(UserWarning):
        assert run1(spark, "x", "string", "noSuchThing")["out"] == "x"


def test_must_to_float_and_epoch(spark):
    r = run1(spark, "junk", "string", "mustToFloat")
    assert r["out"] is None and r["err"] is not None
    r = run1(spark, " 2.5 ", "string", "mustToFloat")
    assert r["out"] == 2.5 and r["err"] is None
    r = run1(spark, "notanepoch", "string", "mustEpochToDate")
    assert r["err"] is not None
    r = run1(spark, 1700000000, "bigint", "mustEpochToDate")
    assert r["out"] == "2023-11-14" and r["err"] is None


def test_register_custom_transform(spark):
    from etl_tool_spark.functions.registry import TransformResult, register_transform

    def t_double_it(col, dtype, params, ctx):
        return TransformResult(F.coalesce(col.try_cast("double") * 2,
                                          F.lit(None).cast("double")))

    register_transform("doubleIt", t_double_it)
    assert run1(spark, "21", "string", "doubleIt")["out"] == 42.0
    # and it works through the mapping pipeline
    from etl_tool_spark.operators.mapping import apply_mappings

    df = spark.createDataFrame([("3",)], "x string")
    out = apply_mappings(df, [{"source": "x", "target": "y", "transform": "doubleIt"}],
                         keep_error_channel=False)
    assert out.collect()[0]["y"] == 6.0


def test_llm_scoring_transforms_in_mapping_chain(spark):
    """The LLM analyzers are reachable declaratively: a playbook mapping
    chain scores/fingerprints/redacts text without Python."""
    from etl_tool_spark.operators.mapping import apply_mappings

    df = spark.createDataFrame(
        [("the cat and the dog sat on the mat by the door", 1),
         ("contact me at a@b.co from 10.1.2.3", 2)],
        "text string, id long")
    out = apply_mappings(df, [
        {"source": "id", "target": "id"},
        {"source": "text", "target": "lang", "transform": "languageId"},
        {"source": "text", "target": "q", "transform": "qualityScore"},
        {"source": "text", "target": "nt", "transform": "tokenCount"},
        {"source": "text", "target": "fp", "transform": "fingerprint"},
        {"source": "text", "target": "red", "transform": "redactPii"},
    ], keep_error_channel=False)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["lang"] == "en" and rows[1]["nt"] == 12
    assert 0.0 <= rows[1]["q"] <= 1.0
    assert len(rows[1]["fp"]) == 32          # md5 hex
    assert "<EMAIL>" in rows[2]["red"] and "<IP>" in rows[2]["red"]


def test_normalize_url_transform(spark):
    from etl_tool_spark.operators.mapping import apply_mappings

    df = spark.createDataFrame(
        [("HTTPS://WWW.Ex.COM/p/?b=2&a=1&utm_s=x",)], "u string")
    out = apply_mappings(df, [
        {"source": "u", "target": "n", "transform": "normalizeUrl"},
    ], keep_error_channel=False)
    assert out.collect()[0]["n"] == "https://ex.com/p?a=1&b=2"


def test_fingerprint_transform_fips_rejected(spark, tmp_path):
    """fingerprint is md5-based: both the plan-time validator and the
    runtime builder must refuse it under FIPS."""
    import yaml

    from etl_tool_spark.functions.registry import (TransformError,
                                                   build_transform)
    from etl_tool_spark.plans import load_config
    from etl_tool_spark.plans.config import ConfigError

    with pytest.raises(TransformError, match="FIPS"):
        from etl_tool_spark.functions.registry import Ctx
        build_transform("fingerprint", {}, F.col("t"), "string",
                        Ctx(dtypes={"t": "string"}, source="t", fips=True))

    cfg = {"source": {"type": "csv", "file": "in.csv"},
           "fipsMode": True,
           "mappings": [{"source": "t", "target": "fp",
                         "transform": "fingerprint"}],
           "destination": {"type": "csv", "file": "out.csv"}}
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ConfigError, match="fingerprint"):
        load_config(str(p))


def test_compression_ratio_transform(spark):
    """The repetitiveness signal is reachable declaratively; spam
    compresses far below varied prose, level is a param."""
    from etl_tool_spark.operators.mapping import apply_mappings

    df = spark.createDataFrame(
        [("buy now " * 40, 1),
         ("the quick brown fox argues with seventeen violinists about "
          "breakfast pastries near the harbor before noon", 2)],
        "text string, id long")
    out = apply_mappings(df, [
        {"source": "id", "target": "id"},
        {"source": "text", "target": "cr", "transform": "compressionRatio"},
        {"source": "text", "target": "cr9", "transform": "compressionRatio",
         "params": {"level": 9}},
    ], keep_error_channel=False)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["cr"] < 0.2 < rows[2]["cr"] <= 1.2
    assert rows[1]["cr9"] <= rows[1]["cr"]  # stronger level, never larger
