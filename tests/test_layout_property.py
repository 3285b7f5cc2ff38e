"""Property tests for the storage-layout surface: file skipping must be
semantically invisible (pruned_read ≡ full-scan filter for ANY range)
and compaction must preserve content exactly."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=300),
       st.integers(-1100, 1100), st.integers(0, 400))
def test_pruned_read_equals_full_filter(spark, tmp_path_factory, vals, lo,
                                        width):
    """For any data and any [lo, hi] range — including empty ranges and
    ranges beyond the data — manifest-pruned reads return exactly the
    full-scan filter's rows."""
    import tempfile

    from etl_tool_spark.sources.sinks import write_sink
    from etl_tool_spark.sources.skipping import pruned_read, write_manifest

    hi = lo + width
    d = tempfile.mkdtemp(prefix="prop_skip_") + "/t.pq"
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, v long")
    write_sink(df, "parquet", d, {"sortBy": "v", "sortPartitions": 4})
    write_manifest(spark, d, ["v"])
    got = sorted((r.i, r.v) for r in
                 pruned_read(spark, d, "v", lo, hi).collect())
    want = sorted((r.i, r.v) for r in
                  spark.read.parquet(d)
                       .filter(F.col("v").between(lo, hi)).collect())
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10**6),
                          st.text(max_size=8)),
                min_size=1, max_size=200),
       st.integers(1, 16))
def test_compaction_preserves_content(spark, vals, n_parts):
    """compact_parquet is a pure re-layout: multiset of rows unchanged
    for any input fragmentation."""
    import tempfile

    from etl_tool_spark.operators.maintenance import compact_parquet

    base = tempfile.mkdtemp(prefix="prop_compact_")
    src, dst = base + "/src", base + "/dst"
    df = spark.createDataFrame(vals, "k long, s string")
    df.repartition(n_parts).write.parquet(src)
    stats = compact_parquet(spark, src, dst, target_file_mb=64)
    assert stats["rows"] == len(vals)
    got = sorted((r.k, r.s) for r in spark.read.parquet(dst).collect())
    assert got == sorted(vals)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)),
             min_size=1, max_size=40),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100),
                       st.integers(0, 999)),
             min_size=0, max_size=40, unique_by=lambda t: (t[0], t[1])),
    st.sampled_from(["backward", "forward", "nearest"]),
    st.booleans(),
    st.one_of(st.none(), st.integers(0, 50)))
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows,
                                             direction, inclusive, tol):
    """Differential oracle: asof_join ≡ pandas merge_asof for random
    keyed series across direction × inclusivity × tolerance. The right
    side is unique per (key, ts) — the operator's deterministic-tie
    contract."""
    import pandas as pd

    from etl_tool_spark.operators.relational import asof_join

    ldf = (pd.DataFrame(lrows, columns=["k", "ts"])
           .astype({"k": "int64", "ts": "int64"}).reset_index(names="lid"))
    rdf = (pd.DataFrame(rrows, columns=["k", "ts", "payload"])
           .astype({"k": "int64", "ts": "int64", "payload": "int64"}))
    want_df = pd.merge_asof(
        ldf.sort_values(["ts", "lid"]), rdf.sort_values("ts"),
        on="ts", by="k", direction=direction,
        allow_exact_matches=inclusive,
        tolerance=tol if tol is not None else None)
    want = {int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
            for r in want_df.itertuples()}

    sl = spark.createDataFrame(ldf[["lid", "k", "ts"]],
                               "lid long, k long, ts long")
    sr = spark.createDataFrame(rdf, "k long, ts long, payload long") \
        if rrows else spark.createDataFrame([], "k long, ts long, payload long")
    got_rows = asof_join(sl, sr, on=["k"], inclusive=inclusive,
                         tolerance=tol, direction=direction).collect()
    got = {r["lid"]: r["payload_right"] for r in got_rows}
    assert got == want
