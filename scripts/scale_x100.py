#!/usr/bin/env python3
"""x100 replica spot-check for the top bench-headline operators.

Builds a 100-replica lineitem (re-keyed l_orderkey per replica, the
scale_check.py protocol — part keys NOT re-strided, so the co-order
graph densifies; frame the graph rows accordingly) plus a 100x Zipfian
documents corpus (scripts/zipf_corpus.py 500000), then times:

- dedup_prefix_filter on the REPRESENTATIVE 500k-doc Zipf corpus (the
  round-5 verdict's "post item 4" framing: the x100 replica of the
  31-word fixture is dominated by the clone-quadratic output artifact,
  so the representative corpus is the honest x100 probe for the join),
- op_mad_outliers and graph_kcore on the x100 lineitem replicas.

Usage: python3 scripts/scale_x100.py [build|run|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/scale_check_x100"
ZIPF = "/tmp/zipf_corpus_x100"
MULT = 100
OFFSET = 10_000_000


#: re-key columns per table (the scale_check.py protocol); tables the
#: round-6/7 sweeps replicate at true x100
REPLICATED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(eng, tables: list[str] | None = None) -> None:
    os.makedirs(DST, exist_ok=True)
    for table in tables or list(REPLICATED):
        dst = os.path.join(DST, f"{table}.parquet")
        # run() may have left a passthrough symlink into the READ-ONLY
        # testdata — unlink it so Spark never follows it on overwrite
        if os.path.islink(dst):
            os.unlink(dst)
        df = eng.catalogs._read_parquet(os.path.join(SRC, f"{table}.parquet"))
        replicas = []
        for i in range(MULT):
            r = df
            for c in REPLICATED[table]:
                r = r.withColumn(c, F.col(c) + F.lit(i * OFFSET))
            # perturb replica doc text so dedup/shingle cardinalities
            # stay honest (clone corpora make true-dup counts quadratic)
            if table == "documents" and "text" in df.columns:
                r = r.withColumn(
                    "text",
                    F.when(F.lit(i) == 0, F.col("text")).otherwise(
                        F.concat(F.col("text"), F.lit(f" replica{i}"))
                    ),
                )
            replicas.append(r)
        out = replicas[0]
        for r in replicas[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(dst)
        print(f"# x{MULT} {table} synthesized", flush=True)


def run(eng) -> None:
    from dblab_ece_trino_spark.operators.analytics import _q_mad_outliers
    from dblab_ece_trino_spark.operators.dedup import prefix_filter_pairs
    from dblab_ece_trino_spark.operators.registry import spark_queries

    spark = eng.spark
    qs = spark_queries()
    # MAD + k-core read lineitem through the catalog layout; register a
    # shim dir holding only the replicated table plus passthrough dims
    for t in ("orders", "customer", "nation", "region", "part", "supplier",
              "events", "documents", "embeddings"):
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(DST, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    for name in ("op_mad_outliers", "graph_kcore"):
        t0 = time.monotonic()
        n = qs[name](spark, DST).count()
        print(f"RES {name} x100: {time.monotonic()-t0:.1f}s ({n} rows)", flush=True)
    docs = spark.read.parquet(os.path.join(ZIPF, "documents.parquet"))
    t0 = time.monotonic()
    n = prefix_filter_pairs(docs).count()
    print(f"RES dedup_prefix_filter zipf-x100 (500k docs): "
          f"{time.monotonic()-t0:.1f}s ({n} pairs)", flush=True)


#: the round-6 ops the round-7 sweep finishes the x100 table for
#: (orders/events/documents/embeddings-fed; their feed tables are now
#: replicated at true x100 by build())
R6_REMAINING = [
    "ts_theil_sen", "op_concurrency_sweep", "sim_epsilon_ball",
    "text_char_diversity", "wh_incremental_agg", "wh_clustering_depth",
    "sample_group_holdout", "op_benford_test", "op_gini_spend",
    "sample_contamination_rate",
]


def run_r6(eng) -> None:
    from dblab_ece_trino_spark.operators.registry import spark_queries

    qs = spark_queries()
    for name in R6_REMAINING:
        fn = qs[name]
        fn(eng.spark, DST).count()  # first touch: codegen/plan compile
        t0 = time.monotonic()
        n = fn(eng.spark, DST).count()
        print(f"RES {name} x100: {time.monotonic()-t0:.2f}s ({n} rows)",
              flush=True)


def main() -> None:
    from dblab_ece_trino_spark.session import EngineSession

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    eng = EngineSession.get(app_name="scale_x100")
    eng.spark.sparkContext.setLogLevel("ERROR")
    # replica-sweep mitigation documented in SCALE.md round 6: AQE's
    # runtime shuffle->broadcast conversion misjudges post-checkpoint
    # frames at this scale
    eng.spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    if mode in ("build", "all"):
        t0 = time.monotonic()
        build(eng, tables=sys.argv[2].split(",") if len(sys.argv) > 2 else None)
        print(f"# x100 build finished in {time.monotonic()-t0:.1f}s", flush=True)
    if mode in ("run", "all"):
        run(eng)
    if mode == "run_r6":
        run_r6(eng)
    eng.spark.stop()


if __name__ == "__main__":
    main()
