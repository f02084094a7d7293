#!/usr/bin/env python3
"""Check ONE named registry entry against its DuckDB oracle, the same
rows+schema+stringified-values compare as driver_gate_check.py.

Usage: PYTHONPATH=. python3 scripts/check_entry.py NAME [NAME...] [sf_dir]
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
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[-1]):
        sf_dir = args.pop()
    if not args:
        print("usage: check_entry.py NAME [NAME...] [sf_dir]")
        sys.exit(2)

    import duckdb

    import __spark_entry__ as e
    from dblab_ece_trino_spark.session import EngineSession

    spark = EngineSession.get(app_name="check_entry").spark
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name in args:
        try:
            df = qs[name](spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                print(f"{name}: rows-only {len(rows)} rows OK")
                continue
            want_rows = con.execute(oracles[name]).fetchall()
            want_cols = [d[0] for d in con.description]
            order = sorted(range(len(cols)), key=lambda j: cols[j])
            worder = sorted(range(len(want_cols)), key=lambda j: want_cols[j])
            schema_ok = sorted(cols) == sorted(want_cols)
            got = sorted(tuple(str(r[j]) for j in order) for r in rows)
            want = sorted(tuple(str(r[j]) for j in worder) for r in want_rows)
            ok = schema_ok and got == want
            if not ok:
                bad += 1
                if not schema_ok:
                    print(f"{name}: SCHEMA {sorted(cols)} vs {sorted(want_cols)}")
                elif len(got) != len(want):
                    print(f"{name}: ROWS {len(got)} vs {len(want)}")
                else:
                    g, w = next((g, w) for g, w in zip(got, want) if g != w)
                    print(f"{name}: VALUES first diff\n  spark={g}\n  duck ={w}")
            else:
                print(f"{name}: {len(rows)} rows OK")
        except Exception as exc:
            bad += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
