"""Scale-lever tests: skew salting equals the unsalted results; bucketed
tables join without a shuffle; HLL estimates stay within tolerance."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    from etl_tool_spark.operators.skew import salted_agg

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    salted = salted_agg(li, ["l_returnflag"], {
        "qty": ("sum", "l_quantity"),
        "n": ("count", "l_orderkey"),
        "maxp": ("max", "l_extendedprice"),
    }, salt=8)
    plain = (li.groupBy("l_returnflag")
               .agg(F.sum("l_quantity").alias("qty"),
                    F.count("l_orderkey").alias("n"),
                    F.max("l_extendedprice").alias("maxp")))
    a = {r["l_returnflag"]: (round(r["qty"], 6), r["n"], r["maxp"]) for r in salted.collect()}
    b = {r["l_returnflag"]: (round(r["qty"], 6), r["n"], r["maxp"]) for r in plain.collect()}
    assert a == b


def test_salted_agg_rejects_non_mergeable(spark):
    from etl_tool_spark.operators.skew import salted_agg

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], {"a": ("avg", "l_quantity")})


def test_salted_join_matches_plain(spark):
    from etl_tool_spark.operators.skew import salted_join

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet") \
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    salted = salted_join(o, c, "o_custkey", salt=4)
    plain = o.join(c, "o_custkey")
    assert salted.count() == plain.count()
    a = salted.groupBy("c_mktsegment").count().collect()
    b = plain.groupBy("c_mktsegment").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Pre-bucketed tables co-locate the join: the physical plan must show
    no Exchange on either side — the 100 TB lever for repeated joins on
    the same key (bucketing amortizes the shuffle into the write)."""
    import re

    # spark.sql.warehouse.dir is static — tables land in ./spark-warehouse
    # (gitignored) and are dropped at the end
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    (o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders"))
    (c.withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer"))
    joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
    plan = joined.sparkSession._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted")
    assert not set(re.findall(r"\((\d+)\) Exchange", plan)), "bucketed join must not shuffle"
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_approx_distinct_within_tolerance(spark):
    """The catalog query binds the ±5% HLL contract into an oracle-
    checkable boolean column; every group must assert it."""
    from etl_tool_spark.catalog import SPARK

    rows = SPARK["agg_approx_distinct"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["within_5pct"] is True and r["exact_orders"] > 0
