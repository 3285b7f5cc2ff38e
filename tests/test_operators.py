"""Operator-level parity tests for flatten/dedup/mapping, mirroring the
reference's processor tests (internal/processor/processor_test.go) and
the FIXTURES.md B3/B4 recipes."""

import pytest
from pyspark.sql import functions as F

from etl_tool_spark.operators.dedup import dedup
from etl_tool_spark.operators.errors import ERROR_COL, split_errors
from etl_tool_spark.operators.flatten import flatten
from etl_tool_spark.operators.mapping import apply_mappings


@pytest.fixture(scope="module")
def nested(spark):
    return spark.createDataFrame(
        [
            (1, ["a", "b"], "yes"),
            (2, [], "yes"),          # empty list ⇒ 0 records
            (3, None, "yes"),        # null ⇒ dropped (or error)
            (4, ["c"], "no"),        # condition not met ⇒ passthrough
        ],
        "id long, tags array<string>, flag string")


def test_flatten_basic(spark, nested):
    out = flatten(nested.drop("flag"), "tags", "tag")
    rows = [(r["id"], r["tag"]) for r in out.collect()]
    assert sorted(rows) == [(1, "a"), (1, "b"), (4, "c")]
    assert "tags" not in out.columns  # source removed when includeParent


def test_flatten_no_parent(spark, nested):
    out = flatten(nested, "tags", "tag", include_parent=False)
    public = [c for c in out.columns if not c.startswith("_etl_")]
    assert public == ["tag"]
    assert sorted(r["tag"] for r in out.collect()) == ["a", "b", "c"]


def test_flatten_conditional_passthrough(spark, nested):
    out = flatten(nested, "tags", "tag",
                  condition_field="flag", condition_value="yes")
    rows = out.collect()
    flat = [r for r in rows if r["tag"] is not None]
    passed = [r for r in rows if r["tag"] is None]
    assert sorted(r["tag"] for r in flat) == ["a", "b"]
    assert [r["id"] for r in passed] == [4]
    assert passed[0]["tags"] == ["c"]  # unflattened record keeps source field


def test_flatten_error_on_non_list(spark, nested):
    out = flatten(nested, "tags", "tag", error_on_non_list=True)
    split = split_errors(out)
    assert split.errors.count() == 1  # id=3 (null source)
    assert sorted(r["tag"] for r in split.clean.collect()) == ["a", "b", "c"]


def test_flatten_missing_column_drops_all(spark, nested):
    out = flatten(nested, "nope", "tag")
    assert out.count() == 0
    out = flatten(nested, "nope", "tag", error_on_non_list=True)
    assert split_errors(out).errors.count() == 4


def test_flatten_nested_dot_path(spark):
    df = spark.createDataFrame(
        [(1, {"addresses": ["x", "y"], "region": "EU"})],
        "id long, details struct<addresses: array<string>, region: string>")
    out = flatten(df, "details.addresses", "addr")
    rows = out.collect()
    assert sorted(r["addr"] for r in rows) == ["x", "y"]
    # nested source field removed, sibling kept
    assert rows[0]["details"].asDict() == {"region": "EU"}


@pytest.fixture(scope="module")
def dupes(spark):
    # FIXTURES.md B4 shape: seq = encounter order
    return spark.createDataFrame(
        [
            (0, 1, "sku1", "10", "first"),
            (1, 1, "sku1", "5", "second"),
            (2, 1, "sku1", "7", "third"),
            (3, 2, None, "1", "null-key-a"),
            (4, 2, None, "2", "null-key-b"),
            (5, 3, "sku9", None, "missing-strategy"),
            (6, 3, "sku9", "4", "has-strategy"),
        ],
        "seq long, order_id long, product_sku string, updated_at string, payload string")


def test_dedup_first_last(spark, dupes):
    first = dedup(dupes, ["order_id", "product_sku"], "first", seq_col="seq")
    assert {r["payload"] for r in first.collect()} == {"first", "null-key-a", "missing-strategy"}
    last = dedup(dupes, ["order_id", "product_sku"], "last", seq_col="seq")
    assert {r["payload"] for r in last.collect()} == {"third", "null-key-b", "has-strategy"}


def test_dedup_min_cross_type_numeric(spark, dupes):
    # "5" < "7" < "10" numerically (string-typed values compared as double,
    # CompareValues semantics transform.go:1052-1117)
    out = dedup(dupes, ["order_id"], "min", strategy_field="updated_at", seq_col="seq")
    by_key = {r["order_id"]: r["payload"] for r in out.collect()}
    assert by_key[1] == "second"
    assert by_key[2] == "null-key-a"
    # null strategy value WINS min: CompareValues(nil, x) = -1
    # (transform.go:1055-1060), so Go keeps the nil-valued record
    assert by_key[3] == "missing-strategy"


def test_dedup_max(spark, dupes):
    out = dedup(dupes, ["order_id"], "max", strategy_field="updated_at", seq_col="seq")
    by_key = {r["order_id"]: r["payload"] for r in out.collect()}
    assert by_key[1] == "first"  # "10" is max numerically (not lexically!)
    assert by_key[2] == "null-key-b"
    assert by_key[3] == "has-strategy"  # null strategy value LOSES max


def test_dedup_requires_strategy_field(spark, dupes):
    with pytest.raises(ValueError):
        dedup(dupes, ["order_id"], "min")


def test_mapping_shadowing_and_chaining(spark):
    df = spark.createDataFrame([(" x ", "k")], "a string, b string")
    out = apply_mappings(df, [
        {"source": "a", "target": "a", "transform": "trim"},       # shadows source
        {"source": "a", "target": "c", "transform": "toUpperCase"},  # sees trimmed value
        {"source": "missing", "target": "d"},                       # missing ⇒ null
    ], keep_error_channel=False)
    row = out.collect()[0]
    assert out.columns == ["a", "c", "d"]
    assert row["a"] == "x" and row["c"] == "X" and row["d"] is None


def test_mapping_duplicate_target_rejected(spark):
    df = spark.createDataFrame([("x",)], "a string")
    from etl_tool_spark.functions.registry import TransformError

    with pytest.raises(TransformError):
        apply_mappings(df, [{"source": "a", "target": "t"},
                            {"source": "a", "target": "t"}])


def test_mapping_error_is_first_error(spark):
    df = spark.createDataFrame([("bad", "alsobad")], "a string, b string")
    out = apply_mappings(df, [
        {"source": "a", "target": "x", "transform": "mustToInt"},
        {"source": "b", "target": "y", "transform": "mustToFloat"},
    ])
    err = out.collect()[0][ERROR_COL]
    assert "rule 0" in err and "x" in err


def test_asof_join_bounds(spark):
    from etl_tool_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 100, "L1"), (1, 200, "L2"), (2, 50, "L3")],
        "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 100, "R@100"), (1, 150, "R@150"), (2, 60, "R@60")],
        "k long, ts long, payload string")
    inc = {r["tag"]: r["payload_right"] for r in
           asof_join(left, right, on=["k"], inclusive=True).collect()}
    # L1@100 matches R@100 (inclusive equality), L2@200 the latest ≤ 200,
    # L3@50 has no prior right row
    assert inc == {"L1": "R@100", "L2": "R@150", "L3": None}
    exc = {r["tag"]: r["payload_right"] for r in
           asof_join(left, right, on=["k"], inclusive=False).collect()}
    assert exc == {"L1": None, "L2": "R@150", "L3": None}


def test_profile_one_pass_stats(spark):
    from etl_tool_spark.operators.profile import profile

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 2.5), (3, "a", 2.5)],
        "k long, s string, v double")
    got = {r["column"]: r for r in profile(df).collect()}
    assert set(got) == {"k", "s", "v"}
    k = got["k"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_value"], k["max_value"]) == ("1", "3")
    s = got["s"]
    assert (s["n_null"], s["n_distinct"], s["min_value"], s["max_value"]) \
        == (1, 2, "a", "b")
    v = got["v"]
    assert (v["n_null"], v["n_distinct"]) == (1, 2)
    # approx path: sketches instead of exact distinct (no Expand)
    approx = {r["column"]: r for r in profile(df, approx=True).collect()}
    assert approx["k"]["n_distinct"] > 0
    plan = profile(df, approx=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Expand" not in plan
    import pytest as _pytest

    with _pytest.raises(ValueError):
        profile(df, ["nope"])


def test_compact_parquet_small_files(spark, tmp_path):
    """64 tiny files compact into a handful at the target size; rows and
    values survive; sort_by lays the output in global order."""
    from etl_tool_spark.operators.maintenance import compact_parquet

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(10000).selectExpr("id", "id % 7 AS g")
    df.repartition(64).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 64
    stats = compact_parquet(spark, src, dst, target_file_mb=1, sort_by=["id"])
    assert stats["files_before"] == 64
    assert stats["files_after"] <= 4          # ~100KB of data, 1MB target
    assert stats["rows"] == 10000
    back = spark.read.parquet(dst)
    assert back.count() == 10000
    assert back.agg({"id": "sum"}).collect()[0][0] == df.agg({"id": "sum"}).collect()[0][0]
    # global order: each output file covers a disjoint id range
    import glob

    ranges = []
    for p in sorted(glob.glob(dst + "/part-*")):
        vals = [r.id for r in spark.read.parquet(p).collect()]
        assert vals == sorted(vals)
        ranges.append((min(vals), max(vals)))
    ranges.sort()
    assert all(a[1] <= b[0] for a, b in zip(ranges, ranges[1:]))


def test_compact_parquet_zorder(spark, tmp_path):
    from etl_tool_spark.operators.maintenance import compact_parquet

    import itertools
    import pytest as _pytest

    src, dst = str(tmp_path / "zsrc"), str(tmp_path / "zdst")
    rows = [(x, y) for x, y in itertools.product(range(32), range(32))]
    spark.createDataFrame(rows, "x long, y long").repartition(32) \
         .write.parquet(src)
    stats = compact_parquet(spark, src, dst, target_file_mb=1,
                            zorder_by=["x", "y"])
    assert stats["rows"] == 1024 and stats["files_after"] <= 4
    with _pytest.raises(ValueError):
        compact_parquet(spark, src, dst, sort_by=["x"], zorder_by=["y"])


def test_hll_sketch_store_rollups(spark, tmp_path):
    """Per-(type, day) sketches built once answer per-type, per-day and
    global distinct-user questions by MERGE, within HLL tolerance of the
    exact counts — no rescan of the events table."""
    from etl_tool_spark.catalog import _events
    from etl_tool_spark.operators.sketches import (build_hll_sketches,
                                                   merge_distinct_estimate)

    e = _events(spark, "/root/testdata/sf0.001").withColumn(
        "day", F.to_date("ts"))
    d = str(tmp_path / "sketches")
    build_hll_sketches(e, ["event_type", "day"], "user_id", d)

    def exact(*keys):
        if keys:
            return {tuple(r[k] for k in keys): r["n"]
                    for r in e.groupBy(*keys)
                              .agg(F.countDistinct("user_id").alias("n"))
                              .collect()}
        return e.agg(F.countDistinct("user_id")).collect()[0][0]

    # global
    est = merge_distinct_estimate(spark, d).collect()[0][0]
    assert abs(est - exact()) <= max(2, 0.1 * exact())
    # per-type rollup (merges across days)
    got = {r["event_type"]: r["n_distinct"]
           for r in merge_distinct_estimate(spark, d,
                                            ["event_type"]).collect()}
    want = exact("event_type")
    assert set(got) == {k[0] for k in want}
    for (k,), n in want.items():
        assert abs(got[k] - n) <= max(2, 0.1 * n)
    # the sketch table is tiny relative to the events it summarizes
    sk = spark.read.parquet(d)
    assert sk.count() < e.count() / 5


def test_theta_sketch_set_algebra(spark, tmp_path):
    """Theta store answers intersection/difference questions HLL cannot:
    distinct users who clicked AND purchased, clicked BUT never
    purchased — from sketches only, matching exact set ops within
    tolerance (exact here: theta is lossless below its sampling
    threshold)."""
    from etl_tool_spark.catalog import _events
    from etl_tool_spark.operators.sketches import (build_theta_sketches,
                                                   theta_set_estimate)

    e = _events(spark, "/root/testdata/sf0.001")
    d = str(tmp_path / "theta")
    build_theta_sketches(e, ["event_type"], "user_id", d)
    clicks = e.filter("event_type='click'").select("user_id")
    buys = e.filter("event_type='purchase'").select("user_id")
    both = theta_set_estimate(spark, d, "event_type='click'",
                              "event_type='purchase'")
    assert both == clicks.intersect(buys).count()
    only = theta_set_estimate(spark, d, "event_type='click'",
                              "event_type='purchase'", op="difference")
    assert only == clicks.distinct().subtract(buys.distinct()).count()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        theta_set_estimate(spark, d, "1=1", "1=1", op="xor")


def test_kll_sketch_merged_quantiles(spark, tmp_path):
    """Per-(type, day) KLL sketches merged to any rollup reproduce the
    exact quantiles within KLL rank tolerance."""
    from etl_tool_spark.catalog import _events
    from etl_tool_spark.operators.sketches import (build_kll_sketches,
                                                   merge_quantile_estimate)

    e = _events(spark, "/root/testdata/sf0.001").withColumn(
        "day", F.to_date("ts"))
    d = str(tmp_path / "kll")
    build_kll_sketches(e, ["event_type", "day"], "value", d)
    got = merge_quantile_estimate(spark, d, [0.25, 0.5, 0.9]).collect()[0][0]
    vals = sorted(r[0] for r in e.select("value").collect())
    for g, p in zip(got, [0.25, 0.5, 0.9]):
        # rank of the estimate must be within ~2.5% of the target rank
        import bisect

        rank = bisect.bisect_left(vals, g) / len(vals)
        assert abs(rank - p) < 0.025, (p, g, rank)


def test_quality_checks_detects_violations(spark):
    """Each check type counts exactly its violating rows on a toy frame
    with known defects."""
    from etl_tool_spark.operators.quality import run_checks

    df = spark.createDataFrame(
        [(1, "a", 10.0, 100), (2, "b", -5.0, 100), (2, "zz", 50.0, None),
         (3, None, 1e9, 999)],
        "id long, status string, amount double, fk long")
    dim = spark.createDataFrame([(100,), (200,)], "k long")
    got = {r["check"]: (r["failures"], r["total"])
           for r in run_checks(df, [
               {"type": "not_null", "column": "status"},
               {"type": "accepted_values", "column": "status",
                "values": ["a", "b"]},
               {"type": "range", "column": "amount", "min": 0, "max": 1000},
               {"type": "unique", "columns": ["id"]},
               {"type": "relationship", "column": "fk", "to": dim,
                "to_column": "k"},
           ]).collect()}
    assert got["not_null(status)"] == (1, 4)
    assert got["accepted_values(status)"] == (1, 4)   # 'zz' (null exempt)
    assert got["range(amount)"] == (2, 4)             # -5 and 1e9
    assert got["unique(id)"] == (2, 4)                # both id=2 rows
    assert got["relationship(fk)"] == (1, 4)          # 999 (null exempt)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_checks(df, [{"type": "nope", "column": "id"}])


def test_asof_join_tolerance(spark):
    """tolerance nulls matches older than the bound (numeric axis here);
    rows with a fresh match keep it."""
    from etl_tool_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 100, "L1"), (1, 500, "L2")], "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 90, "R@90")], "k long, ts long, payload string")
    no_tol = {r["tag"]: r["payload_right"] for r in
              asof_join(left, right, on=["k"]).collect()}
    assert no_tol == {"L1": "R@90", "L2": "R@90"}
    tol = {r["tag"]: r["payload_right"] for r in
           asof_join(left, right, on=["k"], tolerance=50).collect()}
    assert tol == {"L1": "R@90", "L2": None}   # 500-90 > 50 → stale


def test_edit_distance_join_exact_and_fuzzy(spark):
    """SymSpell blocking must find every pair at distance <= 1
    (substitution, deletion, insertion, exact) and nothing farther."""
    from etl_tool_spark.operators.linkage import edit_distance_join

    left = spark.createDataFrame(
        [(1, "spark"), (2, "table"), (3, "query"), (4, "window")],
        "lid long, lname string")
    right = spark.createDataFrame(
        [(10, "spark"),    # exact
         (11, "sparkle"),  # distance 2 — must NOT match
         (12, "spork"),    # substitution (a->o)
         (13, "spak"),     # deletion
         (14, "stable"),   # insertion into 'table'
         (15, "windows")], # insertion into 'window'
        "rid long, rname string")
    got = {(r["lid"], r["rid"]): r["distance"]
           for r in edit_distance_join(left, right, "lname", "rname").collect()}
    assert got == {(1, 10): 0, (1, 12): 1, (1, 13): 1,
                   (2, 14): 1, (4, 15): 1}


def test_edit_distance_join_no_cartesian_plan(spark):
    from etl_tool_spark.operators.linkage import edit_distance_join

    left = spark.createDataFrame([(1, "abc")], "lid long, lname string")
    right = spark.createDataFrame([(2, "abd")], "rid long, rname string")
    plan = edit_distance_join(left, right, "lname", "rname")._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_edit_distance_join_rejects_overlap(spark):
    from etl_tool_spark.operators.linkage import edit_distance_join

    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError):
        edit_distance_join(df, df, "name", "name")


def test_banded_range_join_correct_and_no_cartesian(spark):
    from etl_tool_spark.operators.relational import banded_range_join

    pts = spark.createDataFrame([(i, float(i * 7)) for i in range(100)],
                                "pid long, v double")
    rng = spark.createDataFrame(
        [(1, 0.0, 50.0), (2, 40.0, 120.0), (3, 600.0, 650.0),
         (4, 1000.0, 2000.0)],
        "rid long, lo double, hi double")
    out = banded_range_join(pts, rng, "v", "lo", "hi", band_size=64)
    got = {(r["pid"], r["rid"]) for r in out.collect()}
    naive = {(p, rid) for p in range(100)
             for rid, lo, hi in [(1, 0, 50), (2, 40, 120), (3, 600, 650),
                                 (4, 1000, 2000)]
             if lo <= p * 7 <= hi}
    assert got == naive and len(got) > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    with pytest.raises(ValueError, match="overlapping"):
        banded_range_join(pts, pts, "v", "v", "v", 10)
    with pytest.raises(ValueError, match="band_size"):
        banded_range_join(pts, rng, "v", "lo", "hi", 0)


def test_banded_range_join_differential_random(spark):
    """Differential vs the naive cross-check over random intervals and
    band sizes, including negative values and empty overlaps."""
    import random

    rng = random.Random(11)
    for trial in range(3):
        pts = [(i, float(rng.randint(-500, 500))) for i in range(120)]
        ranges = []
        for rid in range(15):
            lo = rng.randint(-500, 450)
            ranges.append((rid, float(lo), float(lo + rng.randint(0, 200))))
        band = rng.choice([7, 64, 300])

        from etl_tool_spark.operators.relational import banded_range_join

        p = spark.createDataFrame(pts, "pid long, v double")
        r = spark.createDataFrame(ranges, "rid long, lo double, hi double")
        got = {(x["pid"], x["rid"]) for x in
               banded_range_join(p, r, "v", "lo", "hi", band).collect()}
        naive = {(pid, rid) for pid, v in pts
                 for rid, lo, hi in ranges if lo <= v <= hi}
        assert got == naive, f"trial {trial} band {band}"


def test_interval_overlap_join_differential_random(spark):
    """Differential vs the naive all-pairs overlap check over random
    closed intervals and band sizes: every true pair exactly ONCE (the
    canonical-band rule must not duplicate pairs spanning many shared
    bands, nor drop pairs), no nested-loop in the plan, and the
    guard-rails raise."""
    import random

    from etl_tool_spark.operators.relational import interval_overlap_join

    rng = random.Random(17)
    for trial in range(3):
        lhs = []
        for i in range(60):
            lo = rng.randint(-300, 300)
            lhs.append((i, lo, lo + rng.randint(0, 150)))
        rhs = []
        for j in range(40):
            lo = rng.randint(-300, 300)
            rhs.append((j, lo, lo + rng.randint(0, 150)))
        band = rng.choice([8, 50, 400])
        ldf = spark.createDataFrame(lhs, "lid long, lo long, hi long")
        rdf = spark.createDataFrame(rhs, "rid long, r_lo long, r_hi long")
        out = interval_overlap_join(ldf, rdf, "lo", "hi", "r_lo", "r_hi",
                                    band_size=band)
        got = [(r["lid"], r["rid"]) for r in out.collect()]
        naive = [(i, j) for i, lo, hi in lhs for j, rlo, rhi in rhs
                 if lo <= rhi and rlo <= hi]
        assert sorted(got) == sorted(naive), f"trial {trial} band {band}"
        assert len(got) == len(set(got)), "canonical band emitted a dup"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    with pytest.raises(ValueError, match="overlapping"):
        interval_overlap_join(ldf, ldf, "lo", "hi", "lo", "hi", 10)
    with pytest.raises(ValueError, match="band_size"):
        interval_overlap_join(ldf, rdf, "lo", "hi", "r_lo", "r_hi", 0)


def test_edit_distance_join_distance_two(spark):
    """Depth-2 SymSpell: every pair at distance <= 2 (double deletion,
    substitution+deletion, transposition-as-two-edits, double
    insertion), nothing at distance 3, and the plan stays an equi-join."""
    from etl_tool_spark.operators.linkage import edit_distance_join

    left = spark.createDataFrame(
        [(1, "spark"), (2, "table"), (3, "cluster")],
        "lid long, lname string")
    right = spark.createDataFrame(
        [(10, "spark"),     # exact
         (11, "sparkle"),   # 2 insertions
         (12, "spk"),       # 2 deletions
         (13, "sporc"),     # 2 substitutions
         (14, "tabel"),     # transposition = 2 edits
         (15, "clusters"),  # 1 insertion
         (16, "spoooork")], # distance 4 - must NOT match
        "rid long, rname string")
    got = {(r["lid"], r["rid"]): r["distance"]
           for r in edit_distance_join(left, right, "lname", "rname",
                                       max_distance=2).collect()}
    assert got == {(1, 10): 0, (1, 11): 2, (1, 12): 2, (1, 13): 2,
                   (2, 14): 2, (3, 15): 1}
    plan = edit_distance_join(left, right, "lname", "rname",
                              max_distance=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_deletion_neighborhood_depth_two_counts(spark):
    """Depth-2 neighborhood of 'abcd': itself + 4 one-deletes + 6
    two-deletes = 11 distinct variants (all hashes distinct here)."""
    from pyspark.sql import functions as F

    from etl_tool_spark.operators.linkage import deletion_neighborhood

    df = spark.createDataFrame([("abcd",)], "s string")
    n = df.select(F.size(deletion_neighborhood(F.col("s"), 2)).alias("n")) \
          .first()["n"]
    assert n == 11



def test_trigram_join_matches_and_caps(spark):
    """trigram_join finds proportionally-damaged matches a cartesian-free
    way; max_df drops hot grams from candidate generation (capped output
    ⊆ exact output); short strings still index (whole-string gram)."""
    from etl_tool_spark.operators.linkage import char_ngrams, trigram_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "completely different"),
         (3, "ab")], "lid long, ltxt string")
    right = spark.createDataFrame(
        [(10, "the quick brwn fox jumps"),   # 3-gram overlap high
         (11, "nothing shared here at all"), (12, "ab")],
        "rid long, rtxt string")
    out = {(r["lid"], r["rid"]): r["similarity"]
           for r in trigram_join(left, right, "ltxt", "rtxt",
                                 threshold=0.5).collect()}
    assert (1, 10) in out and out[(1, 10)] < 1.0
    assert (3, 12) in out and out[(3, 12)] == 1.0   # whole-string gram
    assert (2, 11) not in out
    capped = {(r["lid"], r["rid"])
              for r in trigram_join(left, right, "ltxt", "rtxt",
                                    threshold=0.5, max_df=2).collect()}
    assert capped <= set(out)
    # gram builder: short string -> itself; no empty grams
    g = left.select(char_ngrams(F.col("ltxt")).alias("g")).collect()
    assert ["ab"] == g[2]["g"]
    with __import__("pytest").raises(ValueError):
        trigram_join(left.withColumnRenamed("ltxt", "same"),
                     right.withColumnRenamed("rtxt", "same"),
                     "same", "same")


def test_trigram_join_differential_bruteforce(spark):
    """Seeded differential: trigram_join over random strings (some
    corrupted copies, some unrelated) must equal the brute-force
    all-pairs Jaccard computed in plain Python — pair set AND rounded
    similarity values."""
    import random

    from etl_tool_spark.operators.linkage import trigram_join

    rng = random.Random(42)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]

    def sentence():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 6)))

    lrows = [(i, sentence()) for i in range(25)]
    rrows = []
    for j in range(25):
        if j % 2 == 0:                       # corrupted copy of some left
            s = lrows[j % len(lrows)][1]
            k = rng.randrange(max(len(s) - 3, 1))
            rrows.append((100 + j, s[:k] + s[k + 3:]))
        else:
            rrows.append((100 + j, sentence()))

    def grams(s):
        return {s[i:i + 3] for i in range(max(len(s) - 2, 1))}

    want = {}
    for li, ls in lrows:
        for ri, rs in rrows:
            a, b = grams(ls), grams(rs)
            sim = len(a & b) / len(a | b)
            if sim >= 0.5:
                want[(li, ri)] = round(sim, 6)

    left = spark.createDataFrame(lrows, "lid long, ltxt string")
    right = spark.createDataFrame(rrows, "rid long, rtxt string")
    got = {(r["lid"], r["rid"]): r["similarity"]
           for r in trigram_join(left, right, "ltxt", "rtxt",
                                 threshold=0.5).collect()}
    assert got == want and want


def test_trigram_join_rejects_degenerate_threshold(spark):
    """threshold outside (0, 1] must fail at CALL time with a clear
    error — at 0 the prefix bound is meaningless (no inverted index can
    return pairs sharing no gram) and above 1 the prefix length goes
    non-positive (a runtime slice error otherwise)."""
    import pytest

    from etl_tool_spark.operators.linkage import trigram_join

    left = spark.createDataFrame([(1, "abc")], "lid long, ltxt string")
    right = spark.createDataFrame([(2, "abd")], "rid long, rtxt string")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="threshold"):
            trigram_join(left, right, "ltxt", "rtxt", threshold=bad)
    with pytest.raises(ValueError, match="n must be"):
        trigram_join(left, right, "ltxt", "rtxt", n=0)
    # the boundary t=1.0 is valid: exact-gram-set equality only
    got = trigram_join(left, right, "ltxt", "rtxt", threshold=1.0).count()
    assert got == 0


def test_trigram_join_collision_guard_raises_in_plan(spark, monkeypatch):
    """A 64-bit key-hash collision must fail LOUDLY at execution time
    (lazy in-plan raise_error folded into the gram-build aggregation —
    no eager driver job runs at call time), and hash_keys=False must
    reproduce the exact pair set by aggregating on the key strings."""
    import pytest

    from etl_tool_spark.operators import linkage

    left = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "qrstuvwx")], "lid long, ltxt string")
    right = spark.createDataFrame(
        [(10, "abcdefgX"), (20, "zzzzzzzz")], "rid long, rtxt string")
    want = {(r["lid"], r["rid"]): r["similarity"]
            for r in linkage.trigram_join(left, right, "ltxt", "rtxt",
                                          threshold=0.3).collect()}
    got = {(r["lid"], r["rid"]): r["similarity"]
           for r in linkage.trigram_join(left, right, "ltxt", "rtxt",
                                         threshold=0.3,
                                         hash_keys=False).collect()}
    assert got == want and (1, 10) in got

    monkeypatch.setattr(linkage.F, "xxhash64",
                        lambda *cols: linkage.F.lit(1))
    collided = linkage.trigram_join(left, right, "ltxt", "rtxt",
                                    threshold=0.3)  # lazy: must NOT raise
    with pytest.raises(Exception, match="hash collision"):
        collided.collect()
