#!/usr/bin/env python3
"""Scale smoke: run the headline operators on multiplied data.

Synthesizes an N-fold copy of the sf0.1 tables in /tmp (ids re-keyed per
replica so join/group cardinalities scale realistically), then times the
reference query shapes and the dedup/similarity pipelines.  The point is
trend, not absolutes: a shape whose runtime grows superlinearly here is a
shape that dies at 100 TB.

Usage: python3 scripts/scale_check.py [multiplier=10]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = f"/tmp/scale_check_x{MULT}"

KEY_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "supplier": [],
    "nation": [],
    "region": [],
    "part": ["p_partkey"],
}
OFFSET = 10_000_000  # re-key stride per replica


def multiply(eng, table: str, path: str) -> None:
    df = eng.catalogs._read_parquet(os.path.join(SRC, f"{table}.parquet"))
    if not KEY_COLS.get(table):
        # key-less dimension: replicating would create MULT duplicate rows
        # per key and inflate every dim join MULT-fold (compounding per
        # dim in multi-dim queries) — keep one copy; dims grow
        # sublinearly with SF anyway.
        df.write.mode("overwrite").parquet(path)
        return
    replicas = []
    for i in range(MULT):
        r = df
        for c in KEY_COLS.get(table, []):
            r = r.withColumn(c, F.col(c) + F.lit(i * OFFSET))
        # perturb doc text per replica so dedup cardinalities stay honest
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
    out.write.mode("overwrite").parquet(path)


def main() -> None:
    from dblab_ece_trino_spark.session import EngineSession
    import __spark_entry__ as entrymod

    eng = EngineSession.get(app_name="scale_check")
    spark = eng.spark
    os.makedirs(DST, exist_ok=True)
    t0 = time.monotonic()
    for t in KEY_COLS:
        src = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(src):
            multiply(eng, t, os.path.join(DST, f"{t}.parquet"))
    print(f"# data x{MULT} synthesized in {time.monotonic()-t0:.1f}s -> {DST}")

    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup
    names = [
        "q001", "q002", "q003", "q004", "q005",
        "tpch_q1", "tpch_q18", "tpch_q17", "tpch_q21",
        "tpch_q2", "tpch_q8", "tpch_q13", "tpch_q20",
        "op_agg_groupby", "op_join_shuffle",
        "dedup_minhash_lsh", "dedup_exact", "sim_search_bruteforce",
        "text_quality_score", "join_asof",
        "sample_split", "decontaminate", "pipeline_clean_corpus",
        "sample_stratified", "llm_chunk_documents", "llm_repetition_profile",
        "llm_train_order", "llm_tf_cosine_dup",
        "llm_quality_rules", "llm_domain_mix", "llm_budget_select",
        "llm_vocab_topk", "op_click_attribution",
        # round-4 additions: SCALE.md straggler rows + changed/new ops
        "op_equidepth_hist", "op_string_agg", "op_median_mode",
        "op_json_schema_read", "op_window_navigation", "join_asof_forward",
        "ts_expanding_anomaly", "pipeline_curate_corpus",
        "op_funnel_conversion", "op_cohort_retention", "text_bm25_score",
        "dedup_semantic",
        # round-5 additions: graph pack, sketch rollup, range frame,
        # trigrams, trending, BPE merges, re-clamped rolling DAU
        "graph_pagerank", "graph_triangles", "op_hll_rollup",
        "op_rolling_revenue_28d", "op_event_trigrams", "op_trending_hours",
        "llm_bpe_merges", "op_rolling_dau",
        # round-5 additions: sketches, BFS/jaccard graph ops, ACF/CUSUM,
        # CDC apply, compaction plan, sequence match, readability,
        # OOV rate, MIPS
        "op_count_min_heavy_hitters", "op_bloom_membership",
        "graph_shortest_path", "graph_neighbor_jaccard",
        "ts_autocorrelation", "ts_cusum_changepoint",
        "wh_cdc_apply", "wh_compaction_plan", "op_sequence_match",
        "text_readability", "llm_oov_rate", "sim_mips_topk",
        "wh_zone_map_pruning", "llm_negative_pairs", "sim_quantized_mips",
        "wh_time_travel", "op_conversion_latency", "multimodal_wav_decode",
        "wh_analyze_stats", "sample_poisson_bootstrap", "graph_label_prop",
        "llm_temperature_mix", "ts_mom_yoy_change", "llm_span_corruption",
    ]
    for name in names:
        t1 = time.monotonic()
        n = qs[name](spark, DST).count()
        print(f"{name}: {time.monotonic()-t1:.2f}s ({n} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
