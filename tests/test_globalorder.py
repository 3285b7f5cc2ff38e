"""operators/globalorder.py: the banded decomposition of global-order
prefix aggregates must be EXACTLY equivalent to the naive
single-partition global window it replaces (differential tests), and
the boundary semantics of budget_select must match the greedy-fill
contract (the row that crosses the budget is kept)."""

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

from etl_tool_spark.operators.globalorder import (banded_cumsum,
                                                  banded_prefix_max,
                                                  budget_select)


def _frame(spark):
    # bands with duplicates, values with ties, deliberately unsorted
    rows = [(i, (i * 7) % 5, (i * 13) % 11 + 1) for i in range(200)]
    return spark.createDataFrame(rows, "id long, band long, w long")


def test_banded_cumsum_matches_global_window(spark):
    df = _frame(spark)
    got = {r["id"]: r["cum"]
           for r in banded_cumsum(df, "band", [F.col("id").asc()],
                                  "w").collect()}
    w = (Window.orderBy(F.col("band").asc(), F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    want = {r["id"]: r["cum"]
            for r in df.withColumn("cum", F.sum("w").over(w)).collect()}
    assert got == want


def test_banded_cumsum_desc_band(spark):
    df = _frame(spark)
    got = {r["id"]: r["cum"]
           for r in banded_cumsum(df, "band", [F.col("id").asc()], "w",
                                  band_desc=True).collect()}
    w = (Window.orderBy(F.col("band").desc(), F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    want = {r["id"]: r["cum"]
            for r in df.withColumn("cum", F.sum("w").over(w)).collect()}
    assert got == want


def test_banded_prefix_max_matches_global_exclusive_window(spark):
    df = _frame(spark)
    got = {r["id"]: r["prev_max"]
           for r in banded_prefix_max(df, "band", [F.col("id").asc()],
                                      "w").collect()}
    w = (Window.orderBy(F.col("band").asc(), F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    want = {r["id"]: r["pm"]
            for r in df.withColumn("pm", F.max("w").over(w)).collect()}
    assert got == want
    assert got[0] is None  # globally-first row has no predecessor


def test_budget_select_keeps_boundary_row(spark):
    # bands 2,1,0 walked best-first; weights 10 each; budget 25 →
    # cumulative 10,20,30: the 30-row STARTS under budget (20 < 25) so
    # it is kept (greedy fill crosses the line once), the 40-row is not.
    df = spark.createDataFrame(
        [(1, 3, 10), (2, 2, 10), (3, 1, 10), (4, 0, 10)],
        "id long, band long, w long")
    kept = budget_select(df, "band", [F.col("id").asc()], "w",
                         budget=F.lit(25))
    assert {r["id"]: r["cum"] for r in kept.collect()} == \
        {1: 10, 2: 20, 3: 30}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(0, 6),          # band (few → heavy collisions)
              st.integers(0, 50)),        # weight (duplicates, zeros)
    min_size=1, max_size=60))
def test_banded_cumsum_property_equals_global_window(spark, rows):
    """For ANY band/weight multiset the banded decomposition equals the
    single-partition global window — including all-one-band, all-zero
    weights, and maximal band collisions the example tests don't hit."""
    data = [(i, b, w) for i, (b, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, band long, w long")
    got = {r["id"]: r["cum"]
           for r in banded_cumsum(df, "band", [F.col("id").asc()],
                                  "w").collect()}
    w = (Window.orderBy(F.col("band").asc(), F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    want = {r["id"]: r["cum"]
            for r in df.withColumn("cum", F.sum("w").over(w)).collect()}
    assert got == want


def test_hierarchical_banded_cumsum_matches_global_window(spark):
    """Multi-level band spec (coarse DESC, mid DESC, fine ASC) equals
    the naive global window over the concatenated order — the Zipf-rank
    shape (⌊log₂ c⌋ DESC, c DESC, first-char ASC, tok) that splits the
    hapax band (round-5 advice)."""
    rows = [(i, (i * 13) % 9 + 1, chr(ord("a") + (i * 7) % 5), 1)
            for i in range(300)]
    df = (spark.createDataFrame(rows, "id long, c long, pfx string, one int")
               .withColumn("band", F.floor(F.log2("c"))))
    got = {r["id"]: r["cum"]
           for r in banded_cumsum(
               df, [("band", True), ("c", True), ("pfx", False)],
               [F.col("id").asc()], "one").collect()}
    w = (Window.orderBy(F.col("band").desc(), F.col("c").desc(),
                        F.col("pfx").asc(), F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    want = {r["id"]: r["cum"]
            for r in df.withColumn("cum", F.sum("one").over(w)).collect()}
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(1, 12),         # c (collides; log2 bands 0-3)
              st.integers(0, 2),          # fine sub-band
              st.integers(0, 9)),         # weight
    min_size=1, max_size=50))
def test_hierarchical_banded_cumsum_property(spark, rows):
    """For ANY (c, sub, w) multiset the 3-level decomposition equals the
    single-partition global window over (⌊log₂ c⌋ DESC, c DESC, sub ASC,
    id) — including all rows in one composite band and zero weights."""
    data = [(i, c, s, w) for i, (c, s, w) in enumerate(rows)]
    df = (spark.createDataFrame(data, "id long, c long, sub long, w long")
               .withColumn("band", F.floor(F.log2("c"))))
    got = {r["id"]: r["cum"]
           for r in banded_cumsum(
               df, [("band", True), ("c", True), ("sub", False)],
               [F.col("id").asc()], "w").collect()}
    w = (Window.orderBy(F.col("band").desc(), F.col("c").desc(),
                        F.col("sub").asc(), F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    want = {r["id"]: r["cum"]
            for r in df.withColumn("cum", F.sum("w").over(w)).collect()}
    assert got == want
