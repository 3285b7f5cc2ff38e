"""Source readers and sink writers (the reference's io factory,
internal/io/factory.go:13-87), re-expressed as DataFrame readers/writers.

Native Spark formats (CSV/JSON/Parquet/ORC/JDBC) go through ``spark.read``
so scans are distributed, column-pruned and predicate-pushed. Inherently
single-file driver-side formats (XLSX/YAML/XML-document) use small bridge
readers that land in a DataFrame immediately — acceptable because those
formats are single-file by construction in the reference."""

from etl_tool_spark.sources.registry import read_source
from etl_tool_spark.sources.sinks import write_sink

__all__ = ["read_source", "write_sink"]
