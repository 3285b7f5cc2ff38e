"""Plan-quality audit over the WHOLE catalog: build every query's
physical plan at sf0.001 and report the scale-relevant shape metrics —
cartesian products, exchange (shuffle) counts, broadcast joins, whether
any parquet scan is unfiltered+unpruned, and Python UDF presence.

This is the `.explain("formatted")` discipline from the build brief,
mechanized. Usage:

    python scripts/audit_plans.py [sf_dir] [name_filter...]

Exit code 1 if any query shows a CartesianProduct (the one shape that
is never acceptable at 100 TB) outside the documented allowlist.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# BroadcastNestedLoopJoin with a 1-row/broadcast build side is fine
# (scalar thresholds, tiny query sets); CartesianProduct is not.
CARTESIAN_ALLOWLIST: set[str] = set()


def plan_str(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def audit(name: str, df) -> dict:
    p = plan_str(df)

    def n(node: str) -> int:
        return len(set(re.findall(rf"\((\d+)\) {node}", p)))

    # scans with neither pushed filters nor a narrow schema: a full-table
    # full-width read. Narrow reads of dimension tables are fine; flag
    # only scans that read >8 columns with no pushdown at all.
    wide_unfiltered = 0
    for m in re.finditer(r"PushedFilters: \[(.*?)\]\n.*?ReadSchema: struct<(.*?)>",
                         p, re.S):
        filters, schema = m.group(1).strip(), m.group(2)
        ncols = schema.count(":")
        if not filters and ncols > 8:
            wide_unfiltered += 1

    return {
        "name": name,
        "cartesian": n("CartesianProduct"),
        "exchanges": n("Exchange"),
        "bhj": n("BroadcastHashJoin"),
        "smj": n("SortMergeJoin"),
        "bnlj": n("BroadcastNestedLoopJoin"),
        "windows": n("Window"),
        "python_eval": n("BatchEvalPython") + n("ArrowEvalPython"),
        "wide_unfiltered_scans": wide_unfiltered,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]

    from etl_tool_spark.catalog import SPARK
    from etl_tool_spark.session import get_spark

    spark = get_spark("audit_plans")
    rows, failed = [], []
    for name, fn in sorted(SPARK.items()):
        if filters and not any(f in name for f in filters):
            continue
        try:
            rows.append(audit(name, fn(spark, sf_dir)))
        except Exception as exc:  # pragma: no cover - diagnostic path
            failed.append((name, str(exc).splitlines()[0][:100]))

    hdr = ["name", "cartesian", "exchanges", "bhj", "smj", "bnlj",
           "windows", "python_eval", "wide_unfiltered_scans"]
    print("\t".join(hdr))
    bad = []
    for r in rows:
        print("\t".join(str(r[k]) for k in hdr))
        if r["cartesian"] and r["name"] not in CARTESIAN_ALLOWLIST:
            bad.append(r["name"])
    for name, err in failed:
        print(f"# ERROR {name}: {err}")
    print(f"# {len(rows)} plans audited, {len(bad)} with cartesians, "
          f"{len(failed)} errored")
    if bad:
        print(f"# CARTESIAN: {bad}")
        sys.exit(1)


if __name__ == "__main__":
    main()
