"""Driver-window rotation policy for ``__spark_entry__.queries()``.

The external correctness driver samples the FIRST 50 entries of
``queries()`` each round, so the dict order is a verification schedule.
This module owns that policy (round-7 verdict item 7 moved it out of the
un-imported entry file so it can be unit-tested by import):

1. **Sentinels** — one representative per operator family, pinned into
   every window so a regression in a family core is caught the round it
   happens.
2. **Retry** — queries whose most recent report row FAILED. A red row
   means a fix is waiting to be proven; these outrank everything else.
3. **Fresh** — queries that have never earned any driver row.
4. **Green tail, least-recently-verified first** — round-7 verdict item
   1: with zero failed and zero fresh queries, registration order pinned
   the same first-40 greens into every future window and the other ~155
   could regress invisibly forever.  Ordering the tail by the round each
   query LAST appeared in (oldest first) makes the window cycle through
   the whole catalog every ceil((N - sentinels) / (50 - sentinels))
   rounds (~4 rounds at 205 queries).

Recency semantics (hard-won across rounds 3-4): reports are folded in
round order and the LAST row per query wins — mere presence must not
retire a red query, and an early green must not retire a later
regression.
"""

from __future__ import annotations

import glob
import json
import os
import re

#: Matches the driver's report filenames; the captured group is the
#: round number used for least-recently-verified ordering.
_REPORT_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def row_passed(row: object, has_oracle: bool) -> bool:
    """A report row counts as a PASS only if every check matched with no
    error — or, for a query that (still) ships no oracle SQL, if the
    driver recorded its rows-only result (``err == 'no_oracle'``). A
    query that has since GAINED an oracle must re-earn its green row, so
    'no_oracle' stops counting the moment the oracle dict grows an
    entry."""
    if not isinstance(row, dict):
        return False
    if row.get("err") == "no_oracle":
        return not has_oracle
    return (row.get("err") in (None, "")
            and row.get("rows_match") is True
            and row.get("schema_match") is True
            and row.get("hash_match") is True)


def _iter_reports(reports_dir: str):
    """Yield (round_number, parsed_report) in ascending round order.
    Unparseable files are skipped — a torn write must not wedge the
    entry import."""
    paths = []
    for path in glob.glob(os.path.join(reports_dir, "CORRECTNESS_r*.json")):
        m = _REPORT_RE.search(os.path.basename(path))
        if m:
            paths.append((int(m.group(1)), path))
    for rnd, path in sorted(paths):
        try:
            with open(path, encoding="utf-8") as f:
                report = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(report, dict):
            yield rnd, report


def driver_status(
    reports_dir: str, oracle_names: set[str] | frozenset[str],
) -> tuple[set[str], set[str], dict[str, int]]:
    """Fold all reports under ``reports_dir`` into
    ``(green, failed, last_round)``:

    - ``green``  — queries whose MOST RECENT row passed,
    - ``failed`` — queries whose most recent row did not,
    - ``last_round`` — the highest round number in which each query
      appeared at all (pass or fail), for LRU ordering of the tail.
    """
    latest: dict[str, bool] = {}
    last_round: dict[str, int] = {}
    for rnd, report in _iter_reports(reports_dir):
        for name, row in report.items():
            latest[name] = row_passed(row, has_oracle=name in oracle_names)
            last_round[name] = max(last_round.get(name, 0), rnd)
    green = {n for n, ok in latest.items() if ok}
    return green, set(latest) - green, last_round


def rotation(
    names: list[str],
    sentinels: list[str],
    reports_dir: str,
    oracle_names: set[str] | frozenset[str],
) -> list[str]:
    """Order ``names`` per the policy in the module docstring —
    deterministic given the set of CORRECTNESS reports on disk."""
    green, failed, last_round = driver_status(reports_dir, oracle_names)
    lead = [n for n in sentinels if n in names]
    pos = {n: i for i, n in enumerate(names)}  # registration tie-break
    rest = [n for n in names if n not in lead]
    retry = [n for n in rest if n in failed]
    fresh = [n for n in rest if n not in failed and n not in green]
    done = sorted(
        (n for n in rest if n in green and n not in failed),
        key=lambda n: (last_round.get(n, 0), pos[n]),
    )
    return lead + retry + fresh + done
