"""Source readers.

Reference behaviors being matched (per reader):
  * CSV (internal/io/csv.go:17-135): header row = keys; configurable
    single-char delimiter + comment char; rows with wrong arity are
    skipped (⇒ DROPMALFORMED); every value is a string (⇒ no schema
    inference by default).
  * JSON (internal/io/json.go:19-42): whole-document parse — an array of
    objects or a single object (⇒ multiLine=true).
  * XLSX (internal/io/xlsx.go:17-170): sheet by name or 0-based index;
    first row = header; all strings. stdlib OOXML bridge
    (sources/xlsx.py) — no openpyxl dependency.
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
from etl_tool_spark.util import guard_bridge_file


class SourceError(ValueError):
    pass


def _with_seq(df: DataFrame) -> DataFrame:
    return df.withColumn(SEQ_COL, F.monotonically_increasing_id())


def _peek_csv_header(path: str, delimiter: str, comment: str | None) -> list[str] | None:
    """Driver-side read of the raw header row (first non-comment,
    non-empty line) so the reference's header quirks can be replicated.
    Only the header line is read — data stays distributed."""
    import csv as _csv
    import os

    if not os.path.isfile(path):  # directory/glob: Spark default behavior
        return None
    try:
        with open(path, newline="", encoding="utf-8", errors="replace") as f:
            for line in f:
                if not line.strip():
                    continue
                if comment and line.lstrip().startswith(comment):
                    continue
                return next(_csv.reader([line], delimiter=delimiter))
    except OSError:
        return None
    return None


def read_csv(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    delimiter = options.get("delimiter", ",")
    comment = options.get("commentChar") or options.get("comment")
    infer = bool(options.get("inferSchema", False))

    # Header quirks (csv.go:88-121): names are trimmed; an EMPTY header
    # drops its column; a DUPLICATE header keeps the LAST occurring
    # column. Spark's own reader would instead rename duplicates, so
    # when the peeked header shows any quirk we read with a positional
    # all-string schema (header row skipped via enforceSchema) and
    # project the surviving columns ourselves.
    raw = _peek_csv_header(path, delimiter, comment)
    trimmed = [h.strip() for h in raw] if raw is not None else None
    quirky = raw is not None and (
        trimmed != raw or "" in trimmed or len(set(trimmed)) != len(trimmed))

    reader = (
        spark.read.option("header", True)
        .option("sep", delimiter)
        .option("mode", "DROPMALFORMED")  # wrong-arity rows skipped (csv.go:110-114)
    )
    if comment:
        reader = reader.option("comment", comment)
    if not quirky:
        return reader.option("inferSchema", infer).csv(path)

    # positional schema: header=True just skips the first row (default
    # enforceSchema uses our names). Arity is enforced via an explicit
    # corrupt-record column rather than DROPMALFORMED: column pruning
    # would otherwise let a short/long row survive whenever the dropped
    # columns are the ones it's missing.
    schema = ", ".join(f"`_c{i}` string" for i in range(len(raw)))
    df = (reader.option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", "_etl_corrupt")
                .schema(schema + ", `_etl_corrupt` string")
                .csv(path)
                .filter(F.col("_etl_corrupt").isNull()))
    last_index: dict[str, int] = {}
    for i, name in enumerate(trimmed):
        if name:  # empty header → column skipped (csv.go:91-95)
            last_index[name] = i  # duplicate header → last wins (csv.go:96-100)
    return df.select(*[F.col(f"_c{i}").alias(name)
                       for name, i in sorted(last_index.items(), key=lambda kv: kv[1])])


def read_json(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    multiline = options.get("multiLine", True)  # reference reads a JSON document
    return spark.read.option("multiLine", bool(multiline)).json(path)


def read_parquet(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    reader = spark.read
    if options.get("mergeSchema"):
        # schema evolution across files: older files' missing columns
        # read as null instead of being dropped by the first-footer schema
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def read_orc(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    reader = spark.read
    if options.get("mergeSchema"):
        reader = reader.option("mergeSchema", "true")
    return reader.orc(path)


def read_text(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    """Raw text source (beyond the reference — corpus ingestion): one
    row per line in a single ``text`` column, or one row per FILE with
    ``wholetext: true`` (document-per-file corpora). ``lineSep``
    overrides the line delimiter. Splittable and distributed like any
    file scan — the entry point for .txt dumps feeding the llm/
    operators."""
    # NB: wholetext/lineSep must go through text()'s keyword args —
    # .option("wholetext", "true") is silently ignored by the text source
    df = spark.read.text(path,
                         wholetext=bool(options.get("wholetext", False)),
                         lineSep=options.get("lineSep"))
    return df.withColumnRenamed("value", "text")


def read_yaml(spark: SparkSession, path: str, options: dict[str, Any]) -> DataFrame:
    import yaml  # PyYAML

    guard_bridge_file(path, "yaml source", options.get("driverParseMaxBytes"))
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

    guard_bridge_file(path, "xml source", options.get("driverParseMaxBytes"))
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
    """stdlib OOXML bridge (sources/xlsx.py — no openpyxl needed):
    sheet by name or 0-based index (default: active sheet); header row
    trimmed with empty-ignored/duplicate-last-wins; every value a
    display string (internal/io/xlsx.go:17-170)."""
    from etl_tool_spark.sources.xlsx import read_xlsx_records

    guard_bridge_file(path, "xlsx source", options.get("driverParseMaxBytes"))
    sheet_name = options.get("sheetName")
    sheet_index = None
    if sheet_name is None and "sheetIndex" in options:
        sheet_index = int(options["sheetIndex"])
    records = read_xlsx_records(path, sheet_name=sheet_name,
                                sheet_index=sheet_index)
    if not records:
        return spark.createDataFrame([], "struct<>")
    cols = sorted({k for r in records for k in r})
    rows = [tuple(r.get(c) for c in cols) for r in records]
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(rows, schema)


def read_jdbc(spark: SparkSession, path_or_query: str, options: dict[str, Any]) -> DataFrame:
    """JDBC query source (reference executes arbitrary SQL verbatim,
    postgres.go:68). ``partitionColumn``/``numPartitions`` enable
    parallel partitioned reads — essential at scale; the reference reads
    on a single connection.

    A statement timeout defaults to 60 s (the reference hardcodes the
    same for source queries, postgres.go:26,50) so a hung database
    errors the job instead of stalling it forever; override with
    ``queryTimeout`` (seconds, 0 disables)."""
    url = options.get("url") or options.get("connectionString")
    if not url:
        raise SourceError("jdbc source requires 'url'")
    reader = (spark.read.format("jdbc").option("url", url)
              .option("queryTimeout", int(options.get("queryTimeout", 60))))
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


def read_cdc(spark: SparkSession, path: str,
             options: dict[str, Any]) -> DataFrame:
    """CDC snapshot source: the current (or ``version``-pinned) state of
    a versioned snapshot store (streaming/cdc.py) — lets a downstream
    playbook consume the folded table a CDC playbook maintains."""
    from etl_tool_spark.streaming.cdc import read_snapshot

    v = options.get("version")
    return read_snapshot(spark, path, version=int(v) if v is not None else None)


_READERS = {
    "cdc": read_cdc,
    "csv": read_csv,
    "json": read_json,
    "parquet": read_parquet,
    "orc": read_orc,
    "text": read_text,
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
