#!/usr/bin/env python3
"""Pre-validate the graded window exactly the way the driver does.

Runs the first 50 ``queries()`` entries against their DuckDB oracles at
sf0.01 (the driver's gate SF) and compares row count, sorted column
names, and the full value set with columns sorted by name — a strict
superset of the driver's rows+schema+value-hash check, so a green run
here predicts a green CORRECTNESS_r{N} row.  Oracle-less entries get
the driver's weaker rows-only check.

Usage: PYTHONPATH=. python3 scripts/driver_gate_check.py [sf_dir] [n]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb

    import __spark_entry__ as e
    from dblab_ece_trino_spark.session import EngineSession

    eng = EngineSession.get(app_name="driver_gate_check")
    spark = eng.spark
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = 0
    for i, name in enumerate(list(qs)[:n]):
        try:
            df = qs[name](spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                print(f"{i:3d} {name}: rows-only {len(rows)} rows OK")
                continue
            want_rows = con.execute(oracles[name]).fetchall()
            want_cols = [d[0] for d in con.description]
            order = sorted(range(len(cols)), key=lambda j: cols[j])
            worder = sorted(
                range(len(want_cols)), key=lambda j: want_cols[j]
            )
            schema_ok = sorted(cols) == sorted(want_cols)
            # Compare STRINGIFIED cells, like tests/conftest.py and the
            # driver's value-hash: this catches int-vs-float type drift
            # (15000 vs 15000.0) that a numeric == would mask, and it
            # makes the sort NULL-safe as a side effect.  Caveat: the
            # driver renders through pandas (conftest does too), while
            # this script str()s raw collect() values — Decimal
            # rendering can differ in trailing zeros; conftest remains
            # the authoritative local gate.
            got = sorted(
                tuple(str(r[j]) for j in order) for r in rows
            )
            want = sorted(
                tuple(str(r[j]) for j in worder) for r in want_rows
            )
            ok = schema_ok and got == want
            status = "OK" if ok else "MISMATCH"
            if not ok:
                bad += 1
                detail = (
                    "schema" if not schema_ok
                    else f"values (first diff: "
                    f"{next((g, w) for g, w in zip(got, want) if g != w) if len(got) == len(want) else (len(got), len(want))})"
                )
                status += f" [{detail}]"
            print(f"{i:3d} {name}: {len(rows)} vs {len(want_rows)} {status}")
        except Exception as exc:  # pragma: no cover - diagnostic
            bad += 1
            print(f"{i:3d} {name}: ERROR {type(exc).__name__}: {exc}")
    print(f"\n{'ALL GREEN' if bad == 0 else f'{bad} FAILURES'} "
          f"({n} entries at {sf_dir})")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
