#!/usr/bin/env python3
"""Regenerate results_reference_sf1/ — the reference-layout capture of
the five literal reference queries at generator sf1.

Layout mirrors the reference's results/<q>/workers-{1,5}/ tree
(results.txt / explain.txt / time.txt / query.json per query per mode);
here the modes are shuffle-partitions 1 vs 32.  results.txt must come
out byte-identical across modes (asserted, and re-asserted every CI run
by tests/test_reference_parity.py::test_artifact_tree_matches_reference_layout).

Usage: python3 scripts/reference_artifacts.py [out_root=results_reference_sf1]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from dblab_ece_trino_spark.bench.harness import run_benchmark
    from dblab_ece_trino_spark.bench.reference_parity import (
        REFERENCE_SQL,
        _ref_engine,
    )
    from dblab_ece_trino_spark.session import EngineSession

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "results_reference_sf1"
    )
    eng0 = EngineSession.get(app_name="reference_artifacts")
    eng0.spark.sparkContext.setLogLevel("ERROR")
    eng = _ref_engine(eng0.spark, "/root/testdata/sf0.001")
    names = sorted(REFERENCE_SQL)
    timings = run_benchmark(
        eng,
        "/root/testdata/sf0.001",
        out_root,
        query_names=names,
        modes={"parallel-1": 1, "parallel-32": 32},
    )
    for name in names:
        with open(os.path.join(out_root, name, "parallel-1", "results.txt")) as a, \
                open(os.path.join(out_root, name, "parallel-32", "results.txt")) as b:
            assert a.read() == b.read(), f"{name}: results differ across modes"
        print(f"# {name}: {timings[name]} (results byte-identical)", flush=True)
    eng0.spark.stop()


if __name__ == "__main__":
    main()
