"""Declarative data-quality checks (the Deequ / dbt-test category),
extending the reference's per-record validate* transforms
(transform.go:351-399) to TABLE-level constraints a warehouse actually
enforces: uniqueness, completeness, accepted values, ranges, and
referential integrity.

Scale shape: every row-level check compiles into ONE conditional
aggregate over a single scan (failures = sum of predicate violations —
map-side partial agg), uniqueness adds one groupBy on the key, and
each relationship (FK) check is one anti-join that AQE turns into a
broadcast probe when the dimension is small. Results come back as a
small (check, failures, total) frame — the shape you alert on.

Check specs (dicts, YAML-friendly):
    {"type": "not_null",        "column": "o_custkey"}
    {"type": "unique",          "columns": ["o_orderkey"]}
    {"type": "accepted_values", "column": "o_orderstatus",
     "values": ["F", "O", "P"]}
    {"type": "range",           "column": "o_totalprice",
     "min": 0, "max": 1e6}           # either bound optional
    {"type": "relationship",    "column": "o_custkey",
     "to": <DataFrame>, "to_column": "c_custkey"}
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["run_checks"]


def _row_violation(check: dict[str, Any]):
    """Column expression that is 1 when the row VIOLATES the check."""
    t = check["type"]
    if t == "not_null":
        return F.col(check["column"]).isNull().cast("long")
    if t == "accepted_values":
        c = F.col(check["column"])
        return (c.isNotNull()
                & ~c.isin(*check["values"])).cast("long")
    if t == "range":
        c = F.col(check["column"])
        cond = F.lit(False)
        if "min" in check:
            cond = cond | (c < F.lit(check["min"]))
        if "max" in check:
            cond = cond | (c > F.lit(check["max"]))
        return (c.isNotNull() & cond).cast("long")
    raise ValueError(f"unknown row-level check type {t!r}")


def _check_name(check: dict[str, Any]) -> str:
    t = check["type"]
    col = check.get("column") or ",".join(check.get("columns", []))
    return f"{t}({col})"


def run_checks(df: DataFrame, checks: list[dict[str, Any]]) -> DataFrame:
    """Evaluate all checks; returns (check, failures, total) with one
    row per check. ``failures`` counts violating rows (for ``unique``:
    rows carrying a duplicated key; for ``relationship``: rows whose
    key has no match). All row-level checks share ONE scan."""
    if not checks:
        raise ValueError("run_checks: empty check list")
    spark = df.sparkSession

    row_checks = [c for c in checks
                  if c["type"] in ("not_null", "accepted_values", "range")]
    results: list[DataFrame] = []
    total: int | None = None
    if row_checks:
        # the total rides the same single scan as the row checks
        aggs = [F.count(F.lit(1)).alias("_total")] + [
            F.sum(_row_violation(c)).alias(_check_name(c))
            for c in row_checks]
        row = df.agg(*aggs).collect()[0]
        total = int(row["_total"])
        data = [(_check_name(c), int(row[_check_name(c)] or 0))
                for c in row_checks]
        results.append(spark.createDataFrame(
            data, "check string, failures long"))
    if total is None:  # unique/relationship-only spec: no shared scan
        total = df.count()

    for c in checks:
        if c["type"] == "unique":
            cols = c.get("columns") or [c["column"]]
            dup = (df.groupBy(*cols)
                     .agg(F.count(F.lit(1)).alias("_n"))
                     .filter(F.col("_n") > 1)
                     .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("failures"))
                     .select(F.lit(_check_name(c)).alias("check"),
                             F.col("failures").cast("long")))
            results.append(dup)
        elif c["type"] == "relationship":
            keys = (c["to"].select(F.col(c["to_column"]).alias("_k"))
                    .distinct())
            orphans = (df.filter(F.col(c["column"]).isNotNull())
                         .join(keys, df[c["column"]] == keys["_k"],
                               "left_anti")
                         .agg(F.count(F.lit(1)).alias("failures"))
                         .select(F.lit(_check_name(c)).alias("check"),
                                 F.col("failures").cast("long")))
            results.append(orphans)
        elif c["type"] not in ("not_null", "accepted_values", "range"):
            raise ValueError(f"unknown check type {c['type']!r}")

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.withColumn("total", F.lit(total).cast("long"))
