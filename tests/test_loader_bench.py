"""Loader + bench-harness parity tests (SURVEY §3.2/3.3, §5/§6)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_ctas_load_roundtrip(spark, tmp_path):
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.loader import ctas_load

    eng = engine_for(spark, SF_SMALL)
    reports = ctas_load(
        eng,
        SF_SMALL,
        str(tmp_path / "warehouse"),
        placement={"psql.loaded": ["nation", "region"], "mongodb.loaded": ["orders"]},
        parallelism=3,
    )
    by_table = {r.target: r.rows for r in reports}
    assert by_table["psql.loaded.nation"] == 25
    assert by_table["mongodb.loaded.orders"] == 1500
    # loaded copies resolve through 3-part names and match the source
    n_src = eng.catalogs.table("mongodb.tpch.orders").count()
    n_loaded = eng.catalogs.table("mongodb.loaded.orders").count()
    assert n_src == n_loaded


def test_export_bucketed_ndjson(spark, tmp_path):
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.loader import export_bucketed_ndjson

    eng = engine_for(spark, SF_SMALL)
    orders = eng.catalogs.table("mongodb.tpch.orders")
    out = str(tmp_path / "export")
    n_files = export_bucketed_ndjson(
        orders, "o_orderkey", out, num_buckets=4, batch_rows=100
    )
    assert n_files > 0
    # the documented contract: the bucket= directory a row lands in IS its
    # deterministic hash bucket (a reader of slice b must see exactly the
    # rows with bucket_expr(key) == b)
    from dblab_ece_trino_spark.functions.hashing import bucket_expr

    expected = {
        r["o_orderkey"]: r["b"]
        for r in orders.select(
            "o_orderkey", bucket_expr(F.col("o_orderkey"), 4).alias("b")
        ).collect()
    }
    # completeness: every row lands in exactly one bucket file, in the
    # directory of its own bucket
    seen = set()
    for root, _, files in os.walk(out):
        for fn in files:
            with open(os.path.join(root, fn)) as f:
                for line in f:
                    d = json.loads(line)
                    assert set(d) == set(orders.columns)
                    seen.add(d["o_orderkey"])
                    dir_bucket = int(os.path.basename(root).split("=")[1])
                    assert expected[d["o_orderkey"]] == dir_bucket, (
                        f"row {d['o_orderkey']} misfiled into bucket={dir_bucket}"
                    )
    assert len(seen) == orders.count()
    # batch size respected
    for root, _, files in os.walk(out):
        for fn in files:
            with open(os.path.join(root, fn)) as f:
                assert sum(1 for _ in f) <= 100


def test_bench_harness_layout_and_invariance(spark, tmp_path):
    """The reference's workers-1 vs workers-5 result-stability check
    (SURVEY §5): identical rows at both parallelism levels, full artifact
    layout written."""
    from dblab_ece_trino_spark.bench.harness import run_benchmark
    from dblab_ece_trino_spark.entrypoints import engine_for

    eng = engine_for(spark, SF_SMALL)
    out = str(tmp_path / "results")
    timings = run_benchmark(
        eng, SF_SMALL, out, query_names=["q001", "q003"],
        modes={"parallel-1": 1, "parallel-8": 8},
    )
    assert set(timings) == {"q001", "q003"}
    for q in ("q001", "q003"):
        contents = {}
        for mode in ("parallel-1", "parallel-8"):
            d = os.path.join(out, q, mode)
            for fn in ("results.txt", "explain.txt", "time.txt", "query.json"):
                assert os.path.exists(os.path.join(d, fn)), (q, mode, fn)
            with open(os.path.join(d, "results.txt")) as f:
                contents[mode] = sorted(f.readlines())
        assert contents["parallel-1"] == contents["parallel-8"], (
            f"{q}: results differ across parallelism"
        )


def test_query_stats_metrics(spark):
    """query.json parity: rows read / splits / shuffle bytes extracted
    from the executed plan (reference results/*/query.json vocabulary)."""
    from dblab_ece_trino_spark.entrypoints import build_queries
    from dblab_ece_trino_spark.plans.metrics import query_stats

    df = build_queries()["q003"](spark, SF_SMALL)
    df.collect()
    stats = query_stats(df)
    assert stats["rowsRead"] >= 1650  # orders 1500 + customer 150
    assert stats["splits"] >= 2
    assert stats["spilledBytes"] == 0  # reference parity: no spill at SF
    assert any(n["node"] == "BroadcastHashJoin" for n in stats["operators"])
