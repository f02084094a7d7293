#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {"q001": sec, ...}, "sf": 0.1}

Mirrors the reference's benchmark loop (one timed run per query,
results/<q>/<mode>/time.txt) — see dblab_ece_trino_spark/bench/harness.py
for the full results/explain/time capture parity.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q001",
    "q002",
    "q003",
    "q004",
    "q005",
    "tpch_q1",
    "tpch_q18",
    "op_agg_groupby",
    "op_join_shuffle",
    "dedup_minhash_lsh",
    "sim_search_bruteforce",
    "text_quality_score",
    # round-3 additions (appended so prior rounds stay comparable)
    "tpch_q8",
    "tpch_q20",
    "sample_stratified",
    "llm_repetition_profile",
    "op_click_attribution",
    "op_upsert_latest",
    # round-3 late additions (appended so prior rounds stay comparable)
    "llm_bigram_lm_score",
    "ts_zscore_anomaly",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from dblab_ece_trino_spark.session import EngineSession
    import __spark_entry__ as entrymod

    eng = EngineSession.get(app_name="bench")
    spark = eng.spark
    qs = entrymod.queries()

    # JVM/codegen warmup outside the timed region (first query otherwise
    # pays ~6s of one-time session cost and skews the smallest entry)
    spark.range(1000).selectExpr("sum(id)").collect()
    qs["q001"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()  # materialize fully without driver-side row transfer
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    out = {
        "metric": "headline query set wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
