"""Source readers.

Reference behaviors being matched (per reader):
  * CSV (internal/io/csv.go:17-135): header row = keys; configurable
    single-char delimiter + comment char; rows with wrong arity are
    skipped (⇒ DROPMALFORMED); every value is a string (⇒ no schema
    inference by default).
  * JSON (internal/io/json.go:19-42): whole-document parse — an array of
    objects or a single object (⇒ multiLine=true).
  * XLSX (internal/io/xlsx.go:17-170): sheet by name or 0-based index;
    first row = header; all strings. Bridge via pandas/openpyxl when
    available (not in this container ⇒ clear NotImplementedError).
  * XML (internal/io/xml.go:17-131): repeating recordTag elements
    (default "record"); child element name → key, trimmed text → value;
    attributes ignored; nested element text flattened. stdlib bridge.
  * YAML (internal/io/yaml.go:13-65): list of maps or single map; empty
    doc ⇒ 0 records. Driver-side bridge.
  * PostgreSQL (internal/io/postgres.go:28-123): arbitrary SQL query ⇒
    JDBC reader with optional partitioned reads for scale.
  * Parquet: absent in the reference (playbook_development_guide.md:465)
    — primary scale format here.

Every reader attaches ``_etl_seq`` (monotonically increasing id) so the
``first``/``last`` dedup strategies have the reference's encounter order.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tool_spark.operators.errors import SEQ_COL


class SourceError(ValueError):
    pass


def _with_seq(df: DataFrame) -> DataFrame:
    return df.withColumn(SEQ_COL, F.monotonically_increasing_id())


def read_csv(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    delimiter = options.get("delimiter", ",")
    reader = (
        spark.read.option("header", True)
        .option("sep", delimiter)
        .option("mode", "DROPMALFORMED")  # wrong-arity rows skipped (csv.go:110-114)
        .option("inferSchema", bool(options.get("inferSchema", False)))
    )
    comment = options.get("commentChar") or options.get("comment")
    if comment:
        reader = reader.option("comment", comment)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    multiline = options.get("multiLine", True)  # reference reads a JSON document
    return spark.read.option("multiLine", bool(multiline)).json(path)


def read_parquet(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    return spark.read.orc(path)


def read_yaml(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    import yaml  # PyYAML

    with open(path) as f:
        doc = yaml.safe_load(f)
    if doc is None:
        records: list[dict] = []
    elif isinstance(doc, dict):
        records = [doc]  # single map → 1 record (yaml.go:40-47)
    elif isinstance(doc, list):
        records = [r for r in doc if r is not None]
    else:
        raise SourceError(f"YAML root must be a mapping or list, got {type(doc).__name__}")
    if not records:
        return spark.createDataFrame([], "struct<>")
    return spark.createDataFrame(records)


def read_xml(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    """stdlib bridge: repeating recordTag elements; child-element text
    (trimmed, nested text flattened) keyed by tag; attributes ignored."""
    import xml.etree.ElementTree as ET

    record_tag = options.get("xmlRecordTag", "record")
    records: list[dict[str, str]] = []
    for _, elem in ET.iterparse(path, events=("end",)):
        tag = elem.tag.rsplit("}", 1)[-1]
        if tag != record_tag:
            continue
        rec: dict[str, str] = {}
        for child in elem:
            key = child.tag.rsplit("}", 1)[-1]
            text = "".join(child.itertext()).strip()
            rec[key] = text
        records.append(rec)
        elem.clear()
    if not records:
        return spark.createDataFrame([], "struct<>")
    cols = sorted({k for r in records for k in r})
    rows = [tuple(r.get(c) for c in cols) for r in records]
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(rows, schema)


def read_xlsx(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    try:
        import openpyxl  # noqa: F401 — pandas' xlsx engine
    except ImportError as e:
        raise NotImplementedError(
            "XLSX source requires openpyxl (not installed in this environment); "
            "the reader contract matches internal/io/xlsx.go:17-170"
        ) from e
    import pandas as pd

    sheet = options.get("sheetName")
    if sheet is None:
        sheet = int(options.get("sheetIndex", 0))
    pdf = pd.read_excel(path, sheet_name=sheet, dtype=str)  # all-string parity
    pdf = pdf.where(pd.notna(pdf), None)
    return spark.createDataFrame(pdf)


def read_jdbc(spark: SparkSession, path_or_query: str, options: dict[str, Any]) -> DataFrame:
    """JDBC query source (reference executes arbitrary SQL verbatim,
    postgres.go:68). ``partitionColumn``/``numPartitions`` enable
    parallel partitioned reads — essential at scale; the reference reads
    on a single connection."""
    url = options.get("url") or options.get("connectionString")
    if not url:
        raise SourceError("jdbc source requires 'url'")
    reader = spark.read.format("jdbc").option("url", url)
    query = options.get("query") or path_or_query
    if options.get("dbtable"):
        reader = reader.option("dbtable", options["dbtable"])
    else:
        reader = reader.option("query", query)
    for k in ("user", "password", "driver", "numPartitions", "partitionColumn",
              "lowerBound", "upperBound", "fetchsize"):
        if k in options:
            reader = reader.option(k, options[k])
    return reader.load()


_READERS = {
    "csv": read_csv,
    "json": read_json,
    "parquet": read_parquet,
    "orc": read_orc,
    "yaml": read_yaml,
    "yml": read_yaml,
    "xml": read_xml,
    "xlsx": read_xlsx,
    "postgres": read_jdbc,
    "jdbc": read_jdbc,
}


def read_source(spark: SparkSession, source_type: str, path: str,
                options: dict[str, Any] | None = None,
                attach_seq: bool = True) -> DataFrame:
    """Factory dispatch (internal/io/factory.go:13-49)."""
    fn = _READERS.get(source_type.lower())
    if fn is None:
        raise SourceError(f"unsupported source type {source_type!r}")
    df = fn(spark, path, options or {})
    return _with_seq(df) if attach_seq else df
