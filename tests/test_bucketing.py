"""Bucketed-layout co-located joins: the exchange-free SortMergeJoin
must actually materialize in the physical plan (that IS the feature),
with an unbucketed negative control proving the comparison is fair."""

import re
import uuid

import pytest

from pyspark.sql import functions as F

from etl_tool_spark.operators.bucketing import bucketed_scan, write_bucketed


def _exchanges(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted") \
        if hasattr(df._sc._jvm, "PythonSQLUtils") else None
    if plan is None:  # fallback across pyspark versions
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    return len(set(re.findall(r"\((\d+)\) Exchange", plan))), plan


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    tag = uuid.uuid4().hex[:10]
    left = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    right = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w"))
    lt, rt = f"bkt_left_{tag}", f"bkt_right_{tag}"
    write_bucketed(left, lt, str(base / "l"), ["k"], 8)
    write_bucketed(right, rt, str(base / "r"), ["k"], 8)
    yield lt, rt, left, right
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_join_is_exchange_free(spark, tables):
    lt, rt, *_ = tables
    l, r = bucketed_scan(spark, lt), bucketed_scan(spark, rt)
    joined = l.join(r.hint("merge"), "k")
    n, plan = _exchanges(joined)
    assert "SortMergeJoin" in plan
    assert n == 0, plan  # co-located: no shuffle on either side
    # the bucket metadata must reach the scan (that's what a plain
    # parquet read of the same files would lose)
    assert "SelectedBucketsCount: 8 out of 8" in plan, plan
    # NOTE: a per-task Sort remains on each side — Spark only consumes
    # in-bucket sort order under the legacy sorted-scan conf with one
    # file per bucket. The network exchange is the 100 TB cost, and
    # THAT is what the layout removes.


def test_unbucketed_control_pays_the_shuffle(spark, tables):
    *_, left, right = tables
    joined = left.join(right.hint("merge"), "k")
    n, plan = _exchanges(joined)
    assert "SortMergeJoin" in plan
    assert n >= 2, plan  # both sides exchange without the layout


def test_bucketed_join_values_match_plain(spark, tables):
    lt, rt, left, right = tables
    got = (bucketed_scan(spark, lt)
           .join(bucketed_scan(spark, rt).hint("merge"), "k")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
                F.sum("w").alias("sw")).collect()[0])
    exp = (left.join(right, "k")
               .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
                    F.sum("w").alias("sw")).collect()[0])
    assert tuple(got) == tuple(exp)


def test_write_bucketed_validates(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "t_bad", "/tmp/x", ["k"], 0)
