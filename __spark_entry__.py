"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` expose the engine's full catalog
(etl_tool_spark/catalog.py); the window-rotation policy that orders them
(sentinels → retry → fresh → least-recently-verified green tail) lives
in etl_tool_spark/rotation.py — see that module's docstring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from etl_tool_spark.catalog import ORACLE, SPARK  # noqa: E402
from etl_tool_spark.rotation import rotation  # noqa: E402

#: One representative per operator family, kept in the driver window
#: every round so a regression in a family core shows up as a hard
#: failure even after its siblings have rotated out.
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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPARK["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query window re-verifies the catalog on a rolling
    least-recently-verified schedule."""
    order = rotation(list(SPARK), _SENTINELS, _HERE, set(ORACLE))
    return {name: SPARK[name] for name in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; entries without SQL-expressible
    semantics (approximate LSH top-k) are omitted → rows-only check."""
    return dict(ORACLE)
