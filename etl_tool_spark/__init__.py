"""etl_tool_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference ETL tool
(`brian-c-moore/etl-tool`, a single-process Go batch tool — see SURVEY.md)
as lazy Spark DataFrame plans, plus the Spark-native relational surface
(SQL / joins / aggregations / windows / streaming) the reference lacks and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Design rules (enforced throughout):
  * DataFrame/SQL first — every core operator is a composition of built-in
    ``pyspark.sql.functions`` Columns so Catalyst can push down, prune and
    whole-stage-codegen it. No Python row UDFs in the core.
  * One lazy plan per pipeline — extract → filter → transform → flatten →
    dedup → load compiles to a single DataFrame; a single action executes.
  * Pandas UDFs (Arrow-batched) only where built-ins genuinely cannot
    express the semantics (e.g. multimodal decode stubs).
"""

from etl_tool_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
