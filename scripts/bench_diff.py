#!/usr/bin/env python3
"""Per-query delta table between two BENCH_LOCAL_*.json records.

The headline bench now covers 60+ queries; eyeballing two ~60-line JSON
blobs for a regression does not scale.  This prints one row per query
with old/new warm-min seconds, the absolute and relative delta, sorted
worst-regression-first, plus queries present in only one record (adds /
removals) and the headline totals.

Usage:
    python3 scripts/bench_diff.py OLD.json NEW.json [--threshold PCT]

``--threshold`` (default 10) marks rows whose |relative delta| exceeds
that percent with ``<<`` so regressions are one grep away:
    python3 scripts/bench_diff.py BENCH_LOCAL_r07.json BENCH_LOCAL_r08.json | grep '<<'

SPREAD SUPPRESSION: when both records carry a ``reps`` field (all warm
repetition times, recorded since round 9), a row is flagged only if the
two rep RANGES are disjoint — new_min > old_max for a regression,
new_max < old_min for an improvement.  Overlapping ranges mean the
delta is inside run-to-run jitter (round 8 had 8/61 queries cross the
10% threshold with zero plan changes); such rows get a ``~`` marker
instead of ``<<``.  Records without reps fall back to the plain
threshold.

Exit status is 0 always — this is a reporting tool, not a gate (the
plan-budget pytest layer is the gate; timings on a shared box are
advisory).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        rec = json.load(f)
    if "queries" not in rec:
        sys.exit(f"{path}: no 'queries' field — not a BENCH_LOCAL record")
    return rec


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=10.0,
                    help="flag rows with |delta| > PCT (default 10)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]
    oreps, nreps = old.get("reps", {}), new.get("reps", {})
    common = sorted(set(oq) & set(nq))
    rows = []
    for name in common:
        a, b = float(oq[name]), float(nq[name])
        rel = (b - a) / a * 100 if a > 0 else float("inf")
        rows.append((name, a, b, b - a, rel))
    rows.sort(key=lambda r: -r[4])

    w = max((len(r[0]) for r in rows), default=10)
    print(f"{'query':<{w}}  {'old_s':>8}  {'new_s':>8}  {'delta_s':>8}  {'delta_%':>8}")
    for name, a, b, d, rel in rows:
        flag = ""
        if abs(rel) > args.threshold:
            ors, nrs = oreps.get(name), nreps.get(name)
            if ors and nrs:
                # flag only when the rep ranges are disjoint in the
                # delta's direction — overlap means jitter, not plan
                disjoint = (min(nrs) > max(ors)) if d > 0 else (
                    max(nrs) < min(ors)
                )
                flag = "  <<" if disjoint else "  ~"
            else:
                flag = "  <<"
        print(f"{name:<{w}}  {a:8.3f}  {b:8.3f}  {d:+8.3f}  {rel:+8.1f}{flag}")

    for label, only in (("only in OLD", set(oq) - set(nq)),
                        ("only in NEW", set(nq) - set(oq))):
        for name in sorted(only):
            src = oq if "OLD" in label else nq
            print(f"{name:<{w}}  [{label}: {float(src[name]):.3f}s]")

    osum, nsum = sum(map(float, oq.values())), sum(map(float, nq.values()))
    csum_o = sum(float(oq[n]) for n in common)
    csum_n = sum(float(nq[n]) for n in common)
    print(f"\nheadline: {old.get('value')}s/{len(oq)}q -> "
          f"{new.get('value')}s/{len(nq)}q "
          f"(sum {osum:.1f} -> {nsum:.1f}; "
          f"{len(common)}-query common subset {csum_o:.1f} -> {csum_n:.1f})")

    # Build-inclusive totals (r16 verdict item 2): `value` excludes the
    # separately-timed shared builds, so a round that moves per-entry
    # work into a NEW shared build flatters the headline delta.  Report
    # value + sum(shared_builds) for both sides so build-pool growth is
    # always visible in the comparison.
    ob, nb = old.get("shared_builds", {}), new.get("shared_builds", {})
    obs, nbs = sum(map(float, ob.values())), sum(map(float, nb.values()))
    print(f"build-inclusive: {osum + obs:.1f}s -> {nsum + nbs:.1f}s "
          f"(shared_builds {obs:.1f}s/{len(ob)} -> {nbs:.1f}s/{len(nb)})")
    for name in sorted(set(nb) - set(ob)):
        print(f"  NEW shared build: {name} ({float(nb[name]):.3f}s) — "
              "must show >=2 in-repo consumers")


if __name__ == "__main__":
    main()
