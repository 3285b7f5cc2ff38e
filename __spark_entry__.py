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
#: after its siblings have rotated out.
_SENTINELS = [
    "q1_pricing_summary",     # TPC-H aggregation core
    "join_semi",              # join family
    "window_topn_per_group",  # window family
    "llm_exact_dedup",        # dedup family
    "etl_filter_expr",        # reference filter expression surface
    "llm_minhash_lsh_pairs",  # MinHash+LSH candidate generation
    "llm_dedup_groups",       # connected components
    "join_asof",              # as-of join
    "etl_error_channel",      # pipeline error channel
    "etl_mapping_chain",      # mapping chain parity
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
    """(green, failed): queries with at least one PASSING row in any past
    driver CORRECTNESS report, and queries that were checked but never
    passed. Round 3 taught the distinction the hard way: treating mere
    PRESENCE in a report as 'seen' rotated 8 hash-mismatched queries out
    of the window forever, so their fixes could never earn a green row."""
    green: set[str] = set()
    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        try:
            with open(path, encoding="utf-8") as f:
                report = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(report, dict):
            continue
        for name, row in report.items():
            checked.add(name)
            if _row_passed(row, has_oracle=name in ORACLE):
                green.add(name)
    return green, checked - green


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
