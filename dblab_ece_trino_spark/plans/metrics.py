"""Executed-plan runtime metrics — the Trino ``query.json`` analog.

The reference captures per-query runtime stats (rows processed, CPU,
peak memory, splits, spill — results/*/workers-*/query.json).  Spark
keeps the same facts as SQLMetrics on the executed physical plan; this
module walks that tree after an action and extracts them.

Uses the JVM plan objects through py4j (read-only, after execution), the
same data the Spark UI's SQL tab renders.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

_KEEP = (
    "numOutputRows",
    "numFiles",
    "filesSize",
    "dataSize",
    "shuffleBytesWritten",
    "spillSize",
    "numPartitions",
    "peakMemory",
)


def _unwrap(node):
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        return _unwrap(node.executedPlan())
    if "QueryStage" in name:
        return _unwrap(node.plan())
    return node


def plan_metrics_tree(df: DataFrame) -> list[dict[str, Any]]:
    """Per-node metrics of the executed plan (call AFTER an action).

    Returns [{depth, node, metrics}], root first.
    """
    out: list[dict[str, Any]] = []

    def walk(node, depth: int) -> None:
        node = _unwrap(node)
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            k = kv._1()
            if k in _KEEP:
                v = kv._2().value()
                if v:
                    metrics[k] = v
        out.append({"depth": depth, "node": node.nodeName(), "metrics": metrics})
        children = node.children()
        for i in range(children.length()):
            walk(children.apply(i), depth + 1)

    walk(df._jdf.queryExecution().executedPlan(), 0)
    return out


def query_stats(df: DataFrame) -> dict[str, Any]:
    """Aggregate runtime stats in the reference query.json's vocabulary:
    rows read (scan output), splits (scan files), shuffle bytes, peak
    operator memory, spill."""
    tree = plan_metrics_tree(df)
    rows_read = 0
    splits = 0
    shuffle_bytes = 0
    spill = 0
    peak_mem = 0
    for n in tree:
        m = n["metrics"]
        if n["node"].startswith("Scan"):
            rows_read += m.get("numOutputRows", 0)
            splits += m.get("numFiles", 0)
        shuffle_bytes += m.get("shuffleBytesWritten", 0)
        spill += m.get("spillSize", 0)
        peak_mem = max(peak_mem, m.get("peakMemory", 0))
    return {
        "rowsRead": rows_read,
        "splits": splits,
        "shuffleBytesWritten": shuffle_bytes,
        "spilledBytes": spill,
        "peakOperatorMemory": peak_mem,
        "operators": tree,
    }
