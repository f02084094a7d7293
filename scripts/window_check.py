#!/usr/bin/env python3
"""Verify GRADED_PRIORITY against the steady-state rotation policy.

The policy (registry.py window comment): the driver grades exactly the
first 50 entries of ``queries()``; each round's window should be

  (1) never-graded entries first (newest capability outranks staleness),
  (2) remaining slots filled oldest-latest-grade-first, alphabetical
      within a cohort,

with everything else forming the next round's pre-derived queue.  This
script recomputes the latest-grade map from CORRECTNESS_r*.json and
reports: window size, any never-graded entry NOT in the window, the
staleness cohort composition of the window, and the head of the next
round's queue — so rewriting the window each round is a mechanical diff
against this output instead of hand-derivation.

Usage: PYTHONPATH=. python3 scripts/window_check.py
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def latest_grades(repo: str) -> dict:
    """entry -> latest round with any grade row (green or not)."""
    latest: dict = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", path)
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name in data:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def violations() -> list[str]:
    """Recompute the rotation-policy checks; return violation strings.

    Empty list == policy holds.  Imported by tests/test_engine.py so a
    rotation violation fails the local suite before the driver grades.
    """
    from dblab_ece_trino_spark.entrypoints import build_oracles, build_queries
    from dblab_ece_trino_spark.operators.registry import (
        GRADED_PRIORITY,
        ROTATION_RETIRED,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    grades = latest_grades(repo)
    all_entries = list(build_queries())
    oracles = build_oracles()
    window = GRADED_PRIORITY[:50]
    # oracle-less entries are rows-only checks; the ref_q00N literal
    # runners are additionally covered by the graded
    # reference_sql_parity summary, so "never graded" is by design for
    # them — they are exempt from the never-graded-first rule.
    exempt = {n for n in all_entries if n not in oracles}
    never = [n for n in all_entries if n not in grades and n not in exempt]
    out: list[str] = []
    out += [f"never-graded entry outside the window: {n}"
            for n in never if n not in window]
    # retirement-tier eligibility: registered, multiple historical
    # grades, and never occupying a window seat
    for n in sorted(ROTATION_RETIRED):
        if n not in all_entries:
            out.append(f"retired entry is not registered: {n}")
        elif sum(
            1 for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
            if n in json.load(open(p))
        ) < 2:
            out.append(f"retired entry lacks multiple historical grades: {n}")
        if n in window:
            out.append(f"retired entry holds a window slot: {n}")
    out += [f"window duplicate: {n}"
            for n in sorted({n for n in window if window.count(n) > 1})]
    out += [f"window names an unregistered entry: {n}"
            for n in window if n not in all_entries]
    if len(GRADED_PRIORITY) > 50:
        out.append(f"GRADED_PRIORITY has {len(GRADED_PRIORITY)} entries; "
                   "only the first 50 are graded — trim the overflow")
    return out


def main() -> None:
    from dblab_ece_trino_spark.entrypoints import build_oracles, build_queries
    from dblab_ece_trino_spark.operators.registry import GRADED_PRIORITY

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    grades = latest_grades(repo)
    all_entries = list(build_queries())
    oracles = build_oracles()
    window = GRADED_PRIORITY[:50]
    exempt = {n for n in all_entries if n not in oracles}
    never = [n for n in all_entries if n not in grades and n not in exempt]
    if exempt:
        print(f"oracle-less (rows-only / by-design exempt): {sorted(exempt)}")

    print(f"entries: {len(all_entries)}  window: {len(window)}  "
          f"never-graded: {len(never)}")
    probs = violations()
    if probs:
        print("POLICY VIOLATIONS:")
        for p in probs:
            print("  ", p)
    else:
        print("policy ok: every never-graded entry holds a window slot")

    cohorts: dict = {}
    for n in window:
        cohorts.setdefault(grades.get(n, 0) or "new", []).append(n)
    print("window cohorts (latest grade -> count):",
          {k: len(v) for k, v in sorted(cohorts.items(), key=str)})

    from dblab_ece_trino_spark.operators.registry import ROTATION_RETIRED
    rest = [n for n in all_entries if n not in window and n not in exempt
            and n not in ROTATION_RETIRED]
    rest.sort(key=lambda n: (grades.get(n, 0), n))
    print("next-round queue head (oldest-first, alphabetical in cohort):")
    for n in rest[:20]:
        print(f"   r{grades.get(n, 0):>2}  {n}")
    if probs:
        sys.exit(1)


if __name__ == "__main__":
    main()
