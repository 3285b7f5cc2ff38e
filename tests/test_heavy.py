"""top_k_heavy_hitters: exactness under forced Misra-Gries truncation,
both in-plan gate failure modes, null handling, key-type preservation,
and multi-batch summary construction."""

import random
from contextlib import contextmanager

import pytest

from pyspark.sql import functions as F

from etl_tool_spark.operators.heavy import top_k_heavy_hitters


def _exact_topk(rows, k):
    from collections import Counter

    c = Counter(r for r in rows if r is not None)
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@contextmanager
def _arrow_batch(spark, n):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_exact_under_forced_truncation(spark):
    # 3 heavy keys over a sea of singletons; m=8 forces the MG
    # truncation path in every partition (>8 distinct keys each), yet
    # the recount must return the exact top-3: the heavies clear
    # n/(m+1) = 440/9 so the gate passes.
    rows = ["a"] * 100 + ["b"] * 80 + ["c"] * 60 + [f"s{i}" for i in range(200)]
    random.Random(7).shuffle(rows)
    df = spark.createDataFrame([(r,) for r in rows], "k string").repartition(8)
    got = [(r["k"], r["cnt"])
           for r in top_k_heavy_hitters(df, "k", k=3, m=8).collect()]
    assert got == [("a", 100), ("b", 80), ("c", 60)]


def test_exact_under_multibatch_truncation(spark):
    # tiny Arrow batches make each partition's summary fold over many
    # batches, exercising the per-batch merge-then-truncate rule rather
    # than a single value_counts over the whole partition.
    rows = ["hot"] * 300 + ["warm"] * 200 + [f"cold{i}" for i in range(400)]
    random.Random(11).shuffle(rows)
    df = spark.createDataFrame([(r,) for r in rows], "k string").repartition(4)
    with _arrow_batch(spark, 50):
        got = [(r["k"], r["cnt"])
               for r in top_k_heavy_hitters(df, "k", k=2, m=16).collect()]
    assert got == [("hot", 300), ("warm", 200)]


def test_gate_raises_when_kth_below_bound(spark):
    # 100 keys x2 each: with m=8 the bound n/(m+1) ~ 22 dwarfs every
    # count, so exactness is unprovable and the plan must raise rather
    # than return a silently-approximate top-k.
    rows = [f"u{i}" for i in range(100)] * 2
    df = spark.createDataFrame([(r,) for r in rows], "k string").repartition(4)
    with pytest.raises(Exception, match="increase m"):
        top_k_heavy_hitters(df, "k", k=3, m=8).collect()


def test_gate_raises_on_too_few_candidates(spark):
    df = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3, "k string")
    with pytest.raises(Exception, match="fewer than k"):
        top_k_heavy_hitters(df, "k", k=5, m=8).collect()


def test_nulls_ignored_everywhere(spark):
    # nulls count neither as candidates nor toward the gate's n: with
    # the 50 nulls included n would be 74 and the gate (kth=12, m=8)
    # would fail 12*9 <= 74; excluded, n=24 and it passes.
    rows = [("a",)] * 12 + [("b",)] * 12 + [(None,)] * 50
    df = spark.createDataFrame(rows, "k string").repartition(3)
    got = [(r["k"], r["cnt"])
           for r in top_k_heavy_hitters(df, "k", k=2, m=8).collect()]
    assert got == [("a", 12), ("b", 12)]


def test_long_keys_preserved(spark):
    rows = [(7,)] * 9 + [(42,)] * 6 + [(1,)] * 1 + [(2,)] * 1
    df = spark.createDataFrame(rows, "k long").repartition(2)
    out = top_k_heavy_hitters(df, "k", k=2, m=8)
    assert dict(out.dtypes)["k"] == "bigint"
    assert [(r["k"], r["cnt"]) for r in out.collect()] == [(7, 9), (42, 6)]


def test_parameter_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="k must be"):
        top_k_heavy_hitters(df, "k", k=0)
    with pytest.raises(ValueError, match="must be >= k"):
        top_k_heavy_hitters(df, "k", k=10, m=5)


def test_random_multisets_match_exact(spark):
    # seeded Zipf-ish multisets across partitionings; m >= distinct
    # count makes the gate trivially provable, so the operator must
    # equal the exact counter on every draw.
    rng = random.Random(20260815)
    for trial in range(3):
        rows = [f"k{int(rng.paretovariate(1.1))}" for _ in range(2000)]
        df = (spark.createDataFrame([(r,) for r in rows], "k string")
                   .repartition(2 + trial * 3))
        k = 5 + trial
        got = [(r["k"], r["cnt"])
               for r in top_k_heavy_hitters(df, "k", k=k, m=4096).collect()]
        assert got == _exact_topk(rows, k)


def test_scan_partition_bound_counts_splits_not_files(spark, tmp_path):
    """One large file is many scan splits (round-7 advisor finding): the
    bound must scale with file size / min split size, never with
    len(inputFiles()) — an undercount here would take the ungated
    F.broadcast path on an arbitrarily large candidate frame."""
    from etl_tool_spark.operators.heavy import _scan_partition_bound

    p = str(tmp_path / "one.parquet")
    spark.range(0, 20000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    import glob as _glob
    import os as _os
    size = sum(_os.path.getsize(f)
               for f in _glob.glob(p + "/*.parquet"))
    for key, val in ((u"spark.sql.files.maxPartitionBytes", "4096"),
                     (u"spark.sql.files.openCostInBytes", "4096")):
        spark.conf.set(key, val)
    try:
        bound = _scan_partition_bound(df)
        assert bound is not None
        # each data file contributes size//4096 + 1 potential splits
        assert bound >= size // 4096, (bound, size)
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")


def test_scan_partition_bound_memory_and_remote(spark, monkeypatch):
    """Scan-free plans bound by session parallelism; un-stattable URIs
    are unprovable -> None (caller then uses the counted gate)."""
    from etl_tool_spark.operators.heavy import _scan_partition_bound

    mem = spark.createDataFrame([(1,), (2,)], "k long")
    b = _scan_partition_bound(mem)
    assert b is not None
    assert b >= spark.sparkContext.defaultParallelism

    monkeypatch.setattr(
        mem, "inputFiles", lambda: ["s3a://bucket/part-0000.parquet"])
    assert _scan_partition_bound(mem) is None


def test_over_gate_fallback_paths_stay_exact(spark, monkeypatch):
    """Force both non-hinted branches: a static partitions*m bound over
    the broadcast gate routes through gated_broadcast (eager count),
    and a gate smaller than the candidate set drops the hint entirely
    (sort-merge fallback). Results must be identical to the hinted
    path — the gate changes the JOIN STRATEGY, never the answer."""
    from etl_tool_spark.operators import skew

    rows = ["a"] * 50 + ["b"] * 30 + [f"s{i}" for i in range(40)]
    random.Random(3).shuffle(rows)
    df = spark.createDataFrame([(r,) for r in rows], "k string").repartition(6)
    expected = [("a", 50), ("b", 30)]

    # static bound 6*16=96 > gate 64, candidates ~42 <= 64: gated hint
    monkeypatch.setattr(skew, "BROADCAST_ROW_GATE", 64)
    got = [(r["k"], r["cnt"])
           for r in top_k_heavy_hitters(df, "k", k=2, m=16).collect()]
    assert got == expected

    # gate 8 < candidates: no hint at all, plain join — still exact
    monkeypatch.setattr(skew, "BROADCAST_ROW_GATE", 8)
    got = [(r["k"], r["cnt"])
           for r in top_k_heavy_hitters(df, "k", k=2, m=16).collect()]
    assert got == expected
