#!/usr/bin/env python3
"""x10 rows for the round-15 operators (the per-round SCALE.md
protocol: 1 cold + 2 warm reps at sf0.1, then on the x10 replica from
scripts/scale_check.py — build it first if absent).

Usage: python3 scripts/scale_r15_ops.py
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = [
    "ts_holtwinters",
    "dedup_image_phash",
    "dedup_cdc_chunks",
    "op_anova",
    "graph_neighborhood_func",
]
X10 = "/tmp/scale_check_x10"


def main() -> None:
    if not os.path.isdir(X10):
        # synthesize the replica via the existing protocol, operators
        # skipped (we only want the data) — cheapest is to import the
        # multiply machinery directly
        import scale_check  # noqa: F401  (runs its own main on import? no)
        from dblab_ece_trino_spark.session import EngineSession

        eng = EngineSession.get(app_name="scale_r15_ops")
        os.makedirs(X10, exist_ok=True)
        t0 = time.monotonic()
        for t in scale_check.KEY_COLS:
            src = os.path.join(scale_check.SRC, f"{t}.parquet")
            if os.path.exists(src):
                scale_check.multiply(
                    eng, t, os.path.join(X10, f"{t}.parquet")
                )
        print(f"# x10 replica synthesized in {time.monotonic()-t0:.1f}s")

    import __spark_entry__ as e
    from dblab_ece_trino_spark.session import EngineSession

    spark = EngineSession.get(app_name="scale_r15_ops").spark
    qs = e.queries()
    for sf_dir in ("/root/testdata/sf0.1", X10):
        print(f"## {sf_dir}")
        for name in OPS:
            walls = []
            rows = 0
            for _ in range(3):
                t0 = time.monotonic()
                rows = qs[name](spark, sf_dir).count()
                walls.append(round(time.monotonic() - t0, 2))
            print(f"{name}: cold {walls[0]}s warm {walls[1:]} "
                  f"({rows} rows)")


if __name__ == "__main__":
    main()
