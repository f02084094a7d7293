"""Round-16 optimization equivalence pins.

Every optimization this round restructures HOW an entry computes, never
WHAT it computes — these tests pin that claim per-value:

- the Holt / Holt-Winters driver kernels against their distributed
  WITH RECURSIVE twins (bit-identical IEEE sequences);
- the Markov stationary kernel against the DuckDB oracle;
- the shared char-9 shingle index consumers (prefix filter /
  containment) against their index-free forms;
- the hashed-shingle contamination rate against the string-keyed
  oracle.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL, assert_matches_oracle, duck_for


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_holt_trend_kernel_equals_recursive_sql(spark):
    from dblab_ece_trino_spark.operators.registry import spark_queries

    fn = spark_queries()["ts_holt_trend"]
    got = _collect_sorted(fn(spark, SF_SMALL))
    want = _collect_sorted(fn.recursive_sql_twin(spark, SF_SMALL))
    assert got == want
    assert got, "empty result"


def test_holtwinters_kernel_equals_recursive_sql(spark):
    from dblab_ece_trino_spark.operators.registry import spark_queries

    fn = spark_queries()["ts_holtwinters"]
    got = _collect_sorted(fn(spark, SF_SMALL))
    want = _collect_sorted(fn.recursive_sql_twin(spark, SF_SMALL))
    assert got == want
    assert got, "empty result"


def test_markov_kernel_matches_oracle(spark, duck):
    from dblab_ece_trino_spark.operators.registry import (
        oracle_queries,
        spark_queries,
    )

    cur = duck_for(duck, SF_SMALL)
    assert_matches_oracle(
        spark_queries()["op_markov_stationary"](spark, SF_SMALL),
        cur,
        oracle_queries()["op_markov_stationary"],
    )


def test_prefix_filter_shared_index_equals_unshared(spark):
    from dblab_ece_trino_spark.operators.dedup import (
        _docs,
        prefix_filter_pairs,
        shared_shingle_index,
    )

    docs = _docs(spark, SF_SMALL)
    idx = shared_shingle_index(spark, SF_SMALL)
    got = _collect_sorted(prefix_filter_pairs(docs, index=idx))
    want = _collect_sorted(prefix_filter_pairs(docs))
    assert got == want


def test_containment_shared_index_equals_unshared(spark):
    from dblab_ece_trino_spark.operators.dedup import (
        _docs,
        containment_pairs,
        shared_shingle_index,
    )

    docs = _docs(spark, SF_SMALL)
    idx = shared_shingle_index(spark, SF_SMALL)
    got = _collect_sorted(containment_pairs(docs, index=idx))
    want = _collect_sorted(containment_pairs(docs))
    assert got == want


def test_contamination_rate_hashed_matches_oracle(spark, duck):
    from dblab_ece_trino_spark.operators.registry import (
        oracle_queries,
        spark_queries,
    )

    cur = duck_for(duck, SF_SMALL)
    assert_matches_oracle(
        spark_queries()["sample_contamination_rate"](spark, SF_SMALL),
        cur,
        oracle_queries()["sample_contamination_rate"],
    )


def test_price_percentile_family_matches_oracle(spark, duck):
    """The shared price histogram + cumulative rank (r16) feeds
    winsorize / MAD / boxplot — all three must still replay their
    oracles exactly."""
    from dblab_ece_trino_spark.operators.registry import (
        oracle_queries,
        spark_queries,
    )

    cur = duck_for(duck, SF_SMALL)
    qs, oq = spark_queries(), oracle_queries()
    for name in ("op_winsorize", "op_mad_outliers", "op_boxplot_stats"):
        assert_matches_oracle(qs[name](spark, SF_SMALL), cur, oq[name])


def test_shared_price_cum_thresholds_equal_direct(spark):
    """thresholds_from_cum over the shared rank == the direct
    grouped_disc_thresholds build on the same histogram."""
    from dblab_ece_trino_spark.operators.analytics import (
        grouped_disc_thresholds,
        shared_price_cum,
        thresholds_from_cum,
    )

    vf, cum = shared_price_cum(spark, SF_SMALL)
    fr = {"lo": (1, 20), "q1": (1, 4), "med": (1, 2), "hi": (19, 20)}
    got = _collect_sorted(thresholds_from_cum(cum, "l_returnflag", "c", fr))
    want = _collect_sorted(grouped_disc_thresholds(vf, "l_returnflag", "c", fr))
    assert got == want
    assert got


def test_lsh_funnel_reused_stages_match_oracle(spark, duck):
    from dblab_ece_trino_spark.operators.registry import (
        oracle_queries,
        spark_queries,
    )

    cur = duck_for(duck, SF_SMALL)
    assert_matches_oracle(
        spark_queries()["dedup_lsh_precision"](spark, SF_SMALL),
        cur,
        oracle_queries()["dedup_lsh_precision"],
    )
