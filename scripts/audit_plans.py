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


# Node names that collapse cardinality: a window over any subtree
# containing one of these sees a SUMMARY (band/vocab/top-k sized), not
# the data stream.
_BOUNDING_NODES = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|GlobalLimit|"
    r"LocalLimit|CollectLimit|TakeOrderedAndProject")

_TREE_NODE_RE = re.compile(r"^[\s*+:|-]*([A-Za-z][\w]*(?: [\w.]+)*) \((\d+)\)")


def _top_groups(s: str) -> list[str]:
    """Top-level [..] groups of a formatted Arguments line."""
    groups, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start + 1:i])
    return groups


def unpartitioned_window_violations(p: str) -> list[str]:
    """Window nodes with NO partition spec whose input subtree contains
    no cardinality-collapsing node (aggregate/limit) — i.e. a
    potentially DATA-sized frame funneled onto a single partition. The
    engine's banded decomposition (operators/globalorder.py) only ever
    runs unpartitioned windows over band/vocab summaries, which always
    sit above an aggregate; this rule mechanizes that invariant so a
    regression cannot hide behind the (expected, summary-sized)
    WindowExec warnings in the bench tail.

    Formatted-plan facts this parser relies on (probed on Spark 4):
    a partitioned+ordered Window's ``Arguments:`` has three top-level
    bracket groups ``[funcs], [partition], [order]``; two-group forms
    are either ``[funcs], [order]`` (unpartitioned — the order group
    always carries ASC/DESC markers) or ``[funcs], [partition]``
    (partition-only frames like min-over-group — no ASC/DESC).
    Constant partition keys are folded away by the optimizer, so they
    cannot mask a violation."""
    # details: node id -> its "(id) Name\n...Arguments: ..." block
    details: dict[str, str] = {}
    for m in re.finditer(r"^\((\d+)\) (.+?)(?=^\(\d+\) |\Z)", p,
                         re.S | re.M):
        details[m.group(1)] = m.group(2)
    violations: list[str] = []
    # every tree section (main plan + subqueries): lines with "(id)"
    lines = [(len(l) - len(l.lstrip(" \t+:*|-")), mm.group(1), mm.group(2))
             for l in p.splitlines()
             if (mm := _TREE_NODE_RE.match(l))]
    for i, (depth, name, nid) in enumerate(lines):
        if name != "Window":
            continue
        args = re.search(r"Arguments: (.*)", details.get(nid, ""))
        groups = _top_groups(args.group(1)) if args else []
        if len(groups) >= 3:
            continue  # partitioned (and ordered)
        if len(groups) == 2 and not re.search(r" (ASC|DESC)\b", groups[-1]):
            continue  # partition-only window (second group is keys)
        # subtree below this node (greater depth until depth resets)
        bounded = False
        for d2, n2, _ in lines[i + 1:]:
            if d2 <= depth:
                break
            if _BOUNDING_NODES.search(n2):
                bounded = True
                break
        if not bounded:
            violations.append(f"Window({nid})")
    return violations


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
        "unpart_data_windows": len(unpartitioned_window_violations(p)),
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
           "windows", "python_eval", "wide_unfiltered_scans",
           "unpart_data_windows"]
    print("\t".join(hdr))
    bad, bad_win = [], []
    for r in rows:
        print("\t".join(str(r[k]) for k in hdr))
        if r["cartesian"] and r["name"] not in CARTESIAN_ALLOWLIST:
            bad.append(r["name"])
        if r["unpart_data_windows"]:
            bad_win.append(r["name"])
    for name, err in failed:
        print(f"# ERROR {name}: {err}")
    print(f"# {len(rows)} plans audited, {len(bad)} with cartesians, "
          f"{len(bad_win)} with data-sized unpartitioned windows, "
          f"{len(failed)} errored")
    if bad:
        print(f"# CARTESIAN: {bad}")
    if bad_win:
        print(f"# UNPART_DATA_WINDOW: {bad_win}")
    if bad or bad_win:
        sys.exit(1)


if __name__ == "__main__":
    main()
