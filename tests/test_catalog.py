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
         "llm_embedding_topk", "events_sessionize"]


@pytest.mark.parametrize("name", SMOKE)
def test_query_matches_oracle(spark, catalog, duck, name):
    from scripts.check_oracle import frame_hash

    SPARK, ORACLE = catalog
    sdf = SPARK[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(ORACLE[name])
    orows = res.fetchall()
    assert sorted(c.lower() for c in sdf.columns) == sorted(c.lower() for c in res.columns)
    assert len(srows) == len(orows)
    assert frame_hash([c.lower() for c in sdf.columns], srows) == \
        frame_hash([c.lower() for c in res.columns], orows)
