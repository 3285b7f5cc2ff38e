"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` expose the engine's full catalog
(etl_tool_spark/catalog.py): the Spark-native relational surface
(aggregations, joins, windows, sorts, set ops, time windows), the
reference-pipeline parity operators (filter / mapping chain / dedup /
flatten / transforms — brian-c-moore/etl-tool, see SURVEY.md §2) and the
LLM-data operators (exact + MinHash-LSH + SimHash + Jaccard dedup,
embedding similarity search, text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_tool_spark.catalog import ORACLE, SPARK  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPARK["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(SPARK)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; entries without SQL-expressible
    semantics (approximate LSH top-k) are omitted → rows-only check."""
    return dict(ORACLE)
