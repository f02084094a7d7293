#!/usr/bin/env python3
"""Plan census: walk every registered entry's physical plan and print
per-entry node counts (scans / exchanges / windows / sorts).

The manual version of this sweep found two real plan bugs in round 3
(an EWMA double window pass and a 20-scan curation-pipeline lineage
blow-up); tests/test_plans.py::test_plan_census_budgets pins the counts
this script reports so regressions of that family fail the suite.

Usage: python3 scripts/plan_census.py [sf_dir]   (prints a Python dict)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def census_counts(plan: str) -> dict[str, int]:
    return {
        "scans": len(re.findall(r"\(\d+\) (?:Batch)?Scan\b", plan)),
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "windows": len(re.findall(r"\(\d+\) Window(?!GroupLimit)", plan)),
        "sorts": len(re.findall(r"\(\d+\) Sort\b", plan)),
    }


def main() -> None:
    from dblab_ece_trino_spark.session import EngineSession, explain_str
    import __spark_entry__ as entrymod

    # Parsed here (not at module scope) so importing this module under
    # pytest can't capture a pytest CLI argument as the sf dir.
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = EngineSession.get(app_name="plan_census")
    spark = eng.spark
    qs = entrymod.queries()
    out: dict[str, tuple[int, int, int, int]] = {}
    for name, fn in qs.items():
        try:
            plan = explain_str(fn(spark, sf))
            c = census_counts(plan)
            out[name] = (c["scans"], c["exchanges"], c["windows"], c["sorts"])
        except Exception as exc:  # pragma: no cover - diagnostic path
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
    print("PLAN_BUDGETS = {")
    for name in sorted(out):
        print(f"    {name!r}: {out[name]},")
    print("}")
    spark.stop()


if __name__ == "__main__":
    main()
