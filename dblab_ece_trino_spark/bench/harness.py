"""Benchmark harness mirroring the reference's captured artifacts.

The reference records, per query per cluster size
(/root/reference/results/<q>/workers-{1,5}/):
- ``results.txt``  — the golden output rows
- ``explain.txt``  — EXPLAIN (TYPE DISTRIBUTED) physical plan
- ``time.txt``     — per-phase timings (analysis / planning / execution)
- ``query.json``   — full runtime stats (rows, CPU, memory, splits)

``run_benchmark`` produces the same layout from Spark:
- results.txt from the collected rows
- explain.txt from the formatted physical plan (fragments ≈ exchanges)
- time.txt with planning (DataFrame build + analysis) vs execution wall
- query.json with row counts, partition counts, and the session confs
  that shape the plan

Two "modes" replace workers-1/workers-5: ``parallel-1`` (shuffle
partitions = 1) and ``parallel-N`` (the session default).  The reference's
key invariance — identical results at both cluster sizes (SURVEY §5) — is
asserted by tests over these two modes.
"""

from __future__ import annotations

import json
import os
import time

from dblab_ece_trino_spark.entrypoints import build_queries
from dblab_ece_trino_spark.session import EngineSession, explain_str


def run_benchmark(
    eng: EngineSession,
    sf_dir: str,
    out_root: str,
    query_names: list[str] | None = None,
    modes: dict[str, int] | None = None,
) -> dict[str, dict[str, float]]:
    """Run the query set under each mode; write the reference-layout tree.

    Returns {query: {mode: elapsed_sec}}.
    """
    queries = build_queries()
    names = query_names or ["q001", "q002", "q003", "q004", "q005"]
    default_parallel = int(eng.spark.conf.get("spark.sql.shuffle.partitions"))
    modes = modes or {"parallel-1": 1, f"parallel-{default_parallel}": default_parallel}

    timings: dict[str, dict[str, float]] = {}
    for name in names:
        fn = queries[name]
        timings[name] = {}
        for mode, partitions in modes.items():
            eng.spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
            try:
                d = os.path.join(out_root, name, mode)
                os.makedirs(d, exist_ok=True)

                t0 = time.monotonic()
                df = fn(eng.spark, sf_dir)
                t_plan = time.monotonic() - t0

                t1 = time.monotonic()
                rows = df.collect()
                t_exec = time.monotonic() - t1

                with open(os.path.join(d, "results.txt"), "w") as f:
                    f.write("\t".join(df.columns) + "\n")
                    for r in rows:
                        f.write("\t".join("NULL" if v is None else str(v) for v in r) + "\n")
                with open(os.path.join(d, "explain.txt"), "w") as f:
                    f.write(explain_str(df))
                with open(os.path.join(d, "time.txt"), "w") as f:
                    f.write(
                        f"query: {name}\nmode: {mode}\n"
                        f"planning: {t_plan:.3f} s\nexecution: {t_exec:.3f} s\n"
                        f"elapsed: {t_plan + t_exec:.3f} s\n"
                    )
                try:
                    from dblab_ece_trino_spark.plans.metrics import query_stats

                    runtime = query_stats(df)
                except Exception:  # py4j internals are version-sensitive
                    runtime = {}
                stats = {
                    "query": name,
                    "mode": mode,
                    "runtime": runtime,
                    "rowCount": len(rows),
                    "outputColumns": df.columns,
                    "planningSec": round(t_plan, 4),
                    "executionSec": round(t_exec, 4),
                    "elapsedSec": round(t_plan + t_exec, 4),
                    "shufflePartitions": partitions,
                    "conf": {
                        k: eng.spark.conf.get(k)
                        for k in (
                            "spark.sql.adaptive.enabled",
                            "spark.sql.autoBroadcastJoinThreshold",
                            "spark.sql.shuffle.partitions",
                        )
                    },
                }
                with open(os.path.join(d, "query.json"), "w") as f:
                    json.dump(stats, f, indent=2)
                timings[name][mode] = stats["elapsedSec"]
            finally:
                eng.spark.conf.set(
                    "spark.sql.shuffle.partitions", str(default_parallel)
                )
    return timings
