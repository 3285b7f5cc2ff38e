"""Dump `.explain("formatted")` for named catalog queries to files.

Usage:

    python scripts/dump_plans.py <out_dir> <suffix> <query> [<query>...]

Writes <out_dir>/<query>_<suffix>.txt for each query, building the plan
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — plan shape is
sf-invariant, pinned by the test_plans.py signature sweep). Used to
produce the plans/rNN/<query>_{before,after}.txt optimization-round
artifacts; run it from the tree whose plans you want (e.g. a worktree
checked out at the previous round's tag for the "before" files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tool_spark.catalog import SPARK  # noqa: E402
from etl_tool_spark.session import get_spark  # noqa: E402


def plan_str(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("etl_tool_spark_plans")
    failed = []
    for name in names:
        try:
            p = plan_str(SPARK[name](spark, sf_dir))
        except Exception as e:  # keep going; report at the end
            failed.append((name, repr(e)))
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(p)
        print(f"wrote {path}")
    if failed:
        for name, err in failed:
            print(f"FAILED {name}: {err}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
