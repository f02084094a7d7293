"""Property tests for the behavior pack (funnel, cohort, BM25) beyond
the oracle value gate in test_correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _entry(spark, name):
    from dblab_ece_trino_spark.entrypoints import build_queries

    return build_queries()[name](spark, SF_SMALL)


def test_funnel_stages_ordered_and_monotonic(spark):
    rows = _entry(spark, "op_funnel_conversion").collect()
    assert len(rows) > 0
    n1 = n2 = n3 = 0
    for r in rows:
        assert r.stage in (1, 2, 3)
        # strictly ordered stage timestamps where present
        if r.t_click is not None:
            assert r.t_click > r.t_view
        if r.t_purchase is not None:
            assert r.t_click is not None
            assert r.t_purchase > r.t_click
        # stage is consistent with which timestamps exist
        assert r.stage == 1 + (r.t_click is not None) + (
            r.t_purchase is not None
        )
        n1 += 1
        n2 += r.t_click is not None
        n3 += r.t_purchase is not None
    assert n1 >= n2 >= n3 > 0


def test_cohort_retention_bounds(spark):
    rows = _entry(spark, "op_cohort_retention").collect()
    assert len(rows) > 0
    by_cohort: dict = {}
    for r in rows:
        assert r.week_offset >= 0
        assert 0 < r.n_active <= r.n_cohort
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = (
            r.n_active,
            r.n_cohort,
        )
    for _cohort, offsets in by_cohort.items():
        # offset 0 exists and is complete: a user's first event is in
        # their cohort week by definition
        assert offsets[0][0] == offsets[0][1]


def test_bm25_scores_positive_and_term_consistent(spark):
    from dblab_ece_trino_spark.entrypoints import engine_for

    rows = _entry(spark, "text_bm25_score").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.bm25 > 0  # +1-inside-log idf is always positive
        assert 1 <= r.n_query_terms <= 3
    # exactly the documents containing >= 1 query term are scored
    docs = engine_for(spark, SF_SMALL).catalogs.table("lake.llm.documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    want = {
        r.doc_id
        for r in toks.filter(
            F.col("tok").isin("table", "fast", "row")
        ).select("doc_id").distinct().collect()
    }
    assert {r.doc_id for r in rows} == want


def test_bm25_more_matches_scores_higher_at_equal_length(spark):
    """Sanity direction check: among docs with the same dl and the same
    term, higher tf cannot score lower (BM25 is monotone in tf)."""
    rows = _entry(spark, "text_bm25_score").collect()
    # group output by n_query_terms: a doc matching 3 terms has at least
    # the per-term score of a same-length doc matching 1; weak global
    # check — the exact values are pinned by the oracle, this guards the
    # pivot wiring (a dropped coalesce would zero out scores)
    one = [r.bm25 for r in rows if r.n_query_terms == 1]
    three = [r.bm25 for r in rows if r.n_query_terms == 3]
    if one and three:
        assert max(three) > min(one)


def test_event_transitions_conservation(spark):
    """Each user contributes exactly (n_events - 1) transitions, so the
    transition total must equal total events minus active users."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    rows = _entry(spark, "op_event_transitions").collect()
    events = engine_for(spark, SF_SMALL).catalogs.table(
        "elastic.default.events"
    )
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in rows) == n_events - n_users
    for r in rows:
        assert r.n_users <= r.n_transitions


def test_rolling_dau_dominates_daily(spark):
    """The trailing-7-day distinct count on day d must be >= that day's
    own distinct count and <= the corpus-wide distinct user count."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    rows = {r.day: r.dau_7d for r in _entry(spark, "op_rolling_dau").collect()}
    events = engine_for(spark, SF_SMALL).catalogs.table(
        "elastic.default.events"
    )
    daily = {
        r.day: r.n
        for r in events.selectExpr(
            "CAST(date_trunc('day', ts) AS DATE) AS day", "user_id"
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    total_users = events.select("user_id").distinct().count()
    assert daily and set(daily) <= set(rows)
    for day, n in daily.items():
        assert n <= rows[day] <= total_users


def test_weighted_topk_deterministic_and_ordered(spark):
    got = [
        (r.doc_id, r.expkey)
        for r in _entry(spark, "sample_weighted_topk").collect()
    ]
    assert len(got) == 20
    keys = [k for _, k in got]
    assert keys == sorted(keys) and keys[0] > 0
    again = [
        (r.doc_id, r.expkey)
        for r in _entry(spark, "sample_weighted_topk").collect()
    ]
    assert got == again


def test_token_cooccurrence_apriori_bounds(spark):
    """Pair support can never exceed either member's document frequency
    (the apriori property the pruning relies on), pairs are canonically
    ordered, and lift is positive."""
    from dblab_ece_trino_spark.entrypoints import engine_for
    from pyspark.sql import functions as FF

    rows = _entry(spark, "op_token_cooccurrence").collect()
    assert len(rows) > 0
    docs = engine_for(spark, SF_SMALL).catalogs.table("lake.llm.documents")
    df_map = {
        r.tok: r.df
        for r in docs.select(
            "doc_id", FF.explode(FF.split(FF.trim("text"), r"\s+")).alias("tok")
        )
        .distinct()
        .groupBy("tok")
        .agg(FF.count("*").alias("df"))
        .collect()
    }
    for r in rows:
        assert r.tok_a < r.tok_b
        assert 150 <= r.support <= min(df_map[r.tok_a], df_map[r.tok_b])
        assert r.lift > 0


def test_new_vs_returning_conservation(spark):
    """n_new + n_returning == n_active per day; each user is new exactly
    once; total new across days == distinct users."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    rows = _entry(spark, "op_new_vs_returning").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_new + r.n_returning == r.n_active
    events = engine_for(spark, SF_SMALL).catalogs.table(
        "elastic.default.events"
    )
    assert sum(r.n_new for r in rows) == (
        events.select("user_id").distinct().count()
    )


def test_ab_test_counts_and_z(spark):
    """Variant counts partition the customer table; conversions match a
    direct semi-join count; the z statistic's sign matches the rate
    difference and the value matches a numpy recomputation."""
    import math

    r = _entry(spark, "op_ab_test").collect()
    assert len(r) == 1
    row = r[0]
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    assert row.n_a + row.n_b == cust.count()
    conv_total = (
        cust.join(
            orders.filter(
                (F.col("o_orderdate") >= "1995-01-01")
                & (F.col("o_orderdate") < "1996-01-01")
            ).select("o_custkey").distinct(),
            cust.c_custkey == F.col("o_custkey"),
            "semi",
        ).count()
    )
    assert row.conv_a + row.conv_b == conv_total
    assert abs(row.rate_a - row.conv_a / row.n_a) < 1e-12
    p = (row.conv_a + row.conv_b) / (row.n_a + row.n_b)
    want_z = (row.rate_a - row.rate_b) / math.sqrt(
        p * (1 - p) * (1 / row.n_a + 1 / row.n_b)
    )
    assert abs(row.z_score - want_z) < 1e-9
    assert (row.z_score > 0) == (row.rate_a > row.rate_b)


def test_ab_test_assignment_deterministic(spark):
    """Re-running yields identical counts (hash assignment, no RNG)."""
    a = _entry(spark, "op_ab_test").collect()[0]
    b = _entry(spark, "op_ab_test").collect()[0]
    assert a == b
