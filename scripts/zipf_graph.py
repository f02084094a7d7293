#!/usr/bin/env python3
"""Honest-Zipf co-order graph probe for the graph family's scale rows.

The x10/x100 replica protocol (scripts/scale_check.py ``multiply``)
re-keys l_orderkey but NOT l_partkey, so exact clones densify the
co-order graph: the same 20k-node graph gains ~10x the edges and the
3-truss balloons 18 -> 20,000 nodes (SCALE.md round-13 table).  That is
an output artifact, not plan growth — but the round-13 verdict is right
that the claim was argued, not measured.  This script measures it, the
way scripts/zipf_corpus.py did for the similarity joins: generate a
co-purchase fact table whose shape matches production growth —

  - line items grow linearly with scale (600k at x1, matching sf0.1),
  - the part catalog grows linearly too (20k parts at x1, the TPC-H
    scaling rule), so clones never collapse onto a fixed key set,
  - part popularity is Zipf(s=1.05) (real co-purchase catalogs are
    heavy-tailed; the uniform TPC-H draw has no hubs at all),
  - order sizes are 1..7 uniform (the TPC-H order fan, mean 4),

then time the ACTUAL operator code (coorder_pairs -> ktruss_edges /
kcore_survivors) at x1/x10/x100 and report walls, edge counts, and
truss/core sizes.  Deterministic (fixed seed per scale).

Usage: python3 scripts/zipf_graph.py [build|run|all] [scales=1,10,100]
Writes /tmp/zipf_graph_x{N}/lineitem.parquet; results to stdout.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_ROWS = 600_000   # sf0.1 lineitem volume
BASE_PARTS = 20_000   # sf0.1 part catalog (TPC-H: parts scale with SF)
ZIPF_S = 1.05
OUT = "/tmp/zipf_graph_x{n}"


def build(scale: int) -> str:
    out = OUT.format(n=scale)
    path = os.path.join(out, "lineitem.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260816 + scale)
    rows = BASE_ROWS * scale
    parts = BASE_PARTS * scale
    # bounded-Zipf part popularity via inverse-CDF on the rank weights
    w = np.arange(1, parts + 1, dtype=np.float64) ** -ZIPF_S
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    rank = np.searchsorted(cdf, rng.random(rows), side="left")
    perm = rng.permutation(parts).astype(np.int64)
    partkey = perm[rank] + 1
    # order fan: 1..7 items per order — draw until the cumulative fan
    # covers rows (E[size]=4 makes rows//2+8 draws overwhelmingly
    # sufficient, but robust-by-construction beats astronomically
    # unlikely; r14 advice), then trim to exactly rows
    sizes = rng.integers(1, 8, size=rows // 2 + 8)
    while int(sizes.sum()) < rows:  # pragma: no cover - probability ~0
        sizes = np.concatenate([sizes, rng.integers(1, 8, size=rows // 4 + 8)])
    orderkey = np.repeat(
        np.arange(1, sizes.size + 1, dtype=np.int64), sizes
    )[:rows]
    pq.write_table(
        pa.table(
            {"l_orderkey": orderkey, "l_partkey": partkey}
        ),
        path,
    )
    print(f"# built {path}: {rows} rows, {parts} parts, "
          f"{orderkey[-1]} orders")
    return path


def run(scales: list[int]) -> None:
    from dblab_ece_trino_spark.operators.graph import (
        coorder_pairs,
        kcore_survivors,
        ktruss_edges,
    )
    from dblab_ece_trino_spark.session import EngineSession, materialize

    spark = EngineSession.get(app_name="zipf_graph").spark
    for scale in scales:
        path = os.path.join(OUT.format(n=scale), "lineitem.parquet")
        li = spark.read.parquet(path)
        # edge build ONCE per scale, reused by every timed rep — the
        # shared_coorder_pairs shape the graded entries run with; its
        # cost is reported separately.  (The round-14 SCALE.md table
        # was measured with a per-rep rebuild, so those walls are
        # conservative by one edge build each.)
        t0 = time.monotonic()
        pairs = materialize(coorder_pairs(li))
        n_edges = pairs.count()
        t_edges = time.monotonic() - t0
        for name, fn in (("ktruss", ktruss_edges),
                         ("kcore", kcore_survivors)):
            walls = []
            out_rows = 0
            for _ in range(2):
                t0 = time.monotonic()
                out_rows = fn(pairs).count()
                walls.append(round(time.monotonic() - t0, 2))
            print(
                f"x{scale} {name}: edges {n_edges} "
                f"(edge-build {t_edges:.2f}s), walls {walls}, "
                f"out_rows {out_rows}"
            )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    scales = [int(s) for s in
              (sys.argv[2] if len(sys.argv) > 2 else "1,10,100").split(",")]
    if mode in ("build", "all"):
        for s in scales:
            build(s)
    if mode in ("run", "all"):
        run(scales)


if __name__ == "__main__":
    main()
