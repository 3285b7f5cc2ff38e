"""Catalog smoke + oracle parity at sf0.001 (the full sf0.01 sweep runs
via scripts/check_oracle.py and the driver's t2 gate)."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def catalog():
    from etl_tool_spark.catalog import ORACLE, SPARK

    return SPARK, ORACLE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle without query: {missing}"


# representative one-per-family subset for fast pytest runs
SMOKE = ["q1_pricing_summary", "join_semi", "window_topn_per_group",
         "etl_mapping_chain", "etl_dedup_min", "llm_minhash_lsh_pairs",
         "llm_embedding_topk", "events_sessionize", "q21_waiting_suppliers",
         "er_edit_distance_join", "llm_weighted_sample"]


@pytest.mark.parametrize("name", SMOKE)
def test_query_matches_oracle(spark, catalog, duck, name):
    # same driver-faithful canonicalization as scripts/check_oracle.py:
    # Spark through toPandas(), the oracle through fetchdf(), so pandas
    # dtype drift (HUGEINT sums, NULL-padded int columns) is visible
    # here exactly as the driver sees it
    from scripts.check_oracle import frame_hash, frame_lines

    SPARK, ORACLE = catalog
    spdf = SPARK[name](spark, SF_DIR).toPandas()
    scols = [c.lower() for c in spdf.columns]
    srows = list(spdf.itertuples(index=False, name=None))
    odf = duck.sql(ORACLE[name]).fetchdf()
    ocols = [c.lower() for c in odf.columns]
    orows = list(odf.itertuples(index=False, name=None))
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert frame_hash(frame_lines(scols, srows)) == \
        frame_hash(frame_lines(ocols, orows))


def test_utc_query_no_session_tz_leak(spark, catalog):
    """Catalog queries must not leave session state behind (VERDICT r1 #10):
    _utc is a scoped override that stamps UTC into the plan at analysis
    time, then restores the caller's timezone — and the stamped plan must
    produce identical values regardless of the ambient session TZ."""
    SPARK, _ = catalog
    key = "spark.sql.session.timeZone"
    base = sorted(map(str, SPARK["etl_transform_dates"](spark, SF_DIR).collect()))
    prev = spark.conf.get(key)
    spark.conf.set(key, "America/New_York")
    try:
        df = SPARK["etl_transform_dates"](spark, SF_DIR)
        assert spark.conf.get(key) == "America/New_York"
        assert sorted(map(str, df.collect())) == base
    finally:
        spark.conf.set(key, prev)


def test_scratch_roots_vacuum_across_processes(tmp_path):
    """_scratch must (a) reap its own root at interpreter exit and
    (b) on first use, vacuum roots orphaned by killed processes —
    atexit never fires after SIGKILL/OOM (round-7 verdict item 8)."""
    import os
    import subprocess
    import sys
    import tempfile

    tmp = tempfile.gettempdir()
    # a root whose "owning pid" is certainly dead, with content
    orphan = os.path.join(tmp, "etl_catalog_scratch_999999999_dead")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "leftover.parquet"), "w") as f:
        f.write("x")

    code = (
        "from etl_tool_spark.catalog import _scratch\n"
        "import os\n"
        "p = _scratch('vacuum_test_')\n"
        "open(os.path.join(p, 'data'), 'w').write('1')\n"
        "print(p)\n"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                         capture_output=True, text=True, check=True)
    own_root = out.stdout.strip()
    # (a) the process's own root is gone after clean exit
    assert not os.path.exists(own_root)
    # (b) the dead process's root was vacuumed on _scratch init
    assert not os.path.exists(orphan)
