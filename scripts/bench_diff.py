"""Compare two bench_detail.json files net of ambient drift.

The bench interleaves a fixed sentinel query every N timed queries and
records, per query, the ``ambient`` factor = (its segment's sentinel
median) / (the run's best sentinel median). Dividing a query's median
by its ambient factor estimates what it would have cost on the run's
quietest machine state — so round-over-round deltas separate plan
regressions from machine noise (the round-5 lesson: a sentinel query
"regressed" 2.2s → 10.1s on untouched code purely from contention).

Usage:
    python scripts/bench_diff.py OLD_bench_detail.json NEW_bench_detail.json
          [--threshold PCT]

Prints queries whose ambient-corrected median moved more than
``--threshold`` percent (default 20) in either direction, worst first,
plus run-level drift context. Raw deltas are shown alongside so a
correction can never hide a real regression silently.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    for key in ("queries",):
        if key not in d:
            raise SystemExit(f"{path}: not a bench_detail file (no {key!r})")
    return d


def corrected(d: dict, name: str) -> float:
    amb = d.get("ambient", {}).get(name, 1.0) or 1.0
    return d["queries"][name] / amb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=20.0,
                    help="report moves over this percent (default 20)")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    for label, d in (("old", old), ("new", new)):
        drift = d.get("drift", {})
        print(f"# {label}: {len(d['queries'])} queries, "
              f"drift ratio {drift.get('ratio')}, "
              f"trace max/best {drift.get('max_over_best')}",
              file=sys.stderr)

    shared = sorted(set(old["queries"]) & set(new["queries"]))
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    moves = []
    for name in shared:
        co, cn = corrected(old, name), corrected(new, name)
        if co <= 0:
            continue
        pct = (cn - co) / co * 100.0
        if abs(pct) >= args.threshold:
            moves.append((pct, name, co, cn,
                          old["queries"][name], new["queries"][name]))
    moves.sort(reverse=True)

    out = {
        "shared": len(shared),
        "added": only_new,
        "removed": only_old,
        "corrected_total_old": round(sum(corrected(old, n) for n in shared), 3),
        "corrected_total_new": round(sum(corrected(new, n) for n in shared), 3),
        "moves_over_threshold": [
            {"query": n, "corrected_pct": round(p, 1),
             "corrected_old": round(co, 3), "corrected_new": round(cn, 3),
             "raw_old": ro, "raw_new": rn}
            for p, n, co, cn, ro, rn in moves],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
