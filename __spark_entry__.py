"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` expose the engine's full catalog
(etl_tool_spark/catalog.py): the Spark-native relational surface
(aggregations, joins, windows, sorts, set ops, time windows), the
reference-pipeline parity operators (filter / mapping chain / dedup /
flatten / transforms — brian-c-moore/etl-tool, see SURVEY.md §2) and the
LLM-data operators (exact + MinHash-LSH + SimHash + Jaccard dedup,
embedding similarity search, text analysis).

The driver's correctness gate samples the FIRST 50 entries of
``queries()``, so the dict order below is a rotation schedule, not
cosmetics: a fixed set of sentinel queries (one per operator family)
stays in the window every round, and the remaining slots are filled
with queries that have never appeared in any ``CORRECTNESS_r*.json``
yet — so over successive rounds every catalog query earns a
driver-green row instead of only the statically-first 50.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from etl_tool_spark.catalog import ORACLE, SPARK  # noqa: E402

#: One representative per operator family, kept in the driver window every
#: round so a regression in a family core shows up as a hard failure even
#: after its siblings have rotated out. Trimmed 10 → 5 in rounds 4-5 while
#: a large fresh-query backlog existed; re-widened to 10 for round 6
#: (round-5 verdict item 5). Round-6 state: the 15-query backlog plus the
#: 26 queries added this round ALL fit the window (10 sentinels +
#: 39 fresh + 1 green re-check = 50, replayed 50/50 green via
#: check_oracle --window at sf0.01), so every catalog query has a
#: driver CORRECTNESS row after this round.
_SENTINELS = [
    "q1_pricing_summary",     # TPC-H aggregation core
    "join_asof",              # join family (as-of, the custom one)
    "window_topn_per_group",  # window family
    "llm_minhash_lsh_pairs",  # dedup / LSH candidate generation
    "etl_mapping_chain",      # reference pipeline parity
    "llm_ingest_gate_fold",   # streaming ingest-gate / store fold family
    "etl_cdc_merge_fold",     # streaming CDC store
    "llm_vocab_coverage",     # globalorder banded prefix aggregates
    "er_trigram_join",        # record linkage (prefix-filtered index)
    "llm_mp3_metadata",       # multimodal binary decode
]


def _row_passed(row: object, has_oracle: bool) -> bool:
    """A report row counts as a PASS only if every check matched with no
    error — or, for a query that (still) ships no oracle SQL, if the
    driver recorded its rows-only result (``err == 'no_oracle'``). A
    query that has since GAINED an oracle must re-earn its green row, so
    'no_oracle' stops counting the moment ORACLE grows an entry."""
    if not isinstance(row, dict):
        return False
    if row.get("err") == "no_oracle":
        return not has_oracle
    return (row.get("err") in (None, "")
            and row.get("rows_match") is True
            and row.get("schema_match") is True
            and row.get("hash_match") is True)


def _driver_status() -> tuple[set[str], set[str]]:
    """(green, failed): queries whose MOST RECENT driver report row
    passed, and queries whose most recent row failed. Recency matters in
    both directions: round 3 taught that mere presence must not retire a
    red query (its fix could never earn a green row), and round 4's
    advisor flagged the mirror bug — an early-round green must not
    retire a query that REGRESSED in a later report, or the regression
    is never re-sampled. Reports are read in sorted (chronological)
    order, so the last row seen per query wins."""
    latest: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        try:
            with open(path, encoding="utf-8") as f:
                report = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(report, dict):
            continue
        for name, row in report.items():
            latest[name] = _row_passed(row, has_oracle=name in ORACLE)
    green = {n for n, ok in latest.items() if ok}
    return green, set(latest) - green


def _rotation(names: list[str]) -> list[str]:
    """Sentinels first, then previously-FAILED queries (a red row means a
    fix is waiting to be proven), then never-driver-checked queries in
    registration order, then already-green queries — deterministic given
    the set of CORRECTNESS reports on disk."""
    green, failed = _driver_status()
    sentinels = [n for n in _SENTINELS if n in names]
    rest = [n for n in names if n not in sentinels]
    retry = [n for n in rest if n in failed]
    fresh = [n for n in rest if n not in failed and n not in green]
    done = [n for n in rest if n in green and n not in failed]
    return sentinels + retry + fresh + done


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPARK["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query window verifies not-yet-checked queries first."""
    return {name: SPARK[name] for name in _rotation(list(SPARK))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; entries without SQL-expressible
    semantics (approximate LSH top-k) are omitted → rows-only check."""
    return dict(ORACLE)
