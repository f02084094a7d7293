"""Focused checks for the analytics pack beyond the parametric oracle
gate in test_correctness.py: determinism preconditions and plan shape.
"""

from __future__ import annotations

import duckdb

from tests.conftest import SF_MED, duck_for


def test_min_max_by_ordering_keys_unique():
    """op_min_max_by is deterministic only if each nation's extreme
    acctbal is unique (DuckDB's arg_max cannot tiebreak on a struct) —
    pin that precondition at the driver's grading SF."""
    con = duck_for(duckdb.connect(), SF_MED)
    dup = con.execute(
        """
        SELECT count(*) FROM (
          SELECT c_nationkey, c_acctbal, count(*) AS c
          FROM customer GROUP BY 1, 2 HAVING count(*) > 1
        ) t
        JOIN (
          SELECT c_nationkey,
                 max(c_acctbal) AS mx, min(c_acctbal) AS mn
          FROM customer GROUP BY 1
        ) e ON t.c_nationkey = e.c_nationkey
           AND (t.c_acctbal = e.mx OR t.c_acctbal = e.mn)
        """
    ).fetchone()[0]
    assert dup == 0


def test_fuzzy_match_is_blocked_join(spark):
    """The ER join must hash-join on the block key — never a cartesian
    product with a levenshtein residual."""
    from dblab_ece_trino_spark.operators.registry import spark_queries

    df = spark_queries()["op_fuzzy_match"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_hierarchy_walk_depths(spark):
    """Binary-tree parent walk: suppkey k has depth floor(log2(k))."""
    from dblab_ece_trino_spark.operators.registry import spark_queries

    rows = spark_queries()["op_hierarchy_walk"](spark, SF_MED).collect()
    by_key = {r["suppkey"]: r for r in rows}
    assert by_key[1]["depth_to_root"] == 0
    assert by_key[2]["depth_to_root"] == 1
    assert by_key[3]["depth_to_root"] == 1
    assert by_key[99]["depth_to_root"] == 6  # floor(log2(99))
    # chain length is depth + 1 (the node itself)
    assert all(
        r["chain_len"] == r["depth_to_root"] + 1 for r in rows
    )


def test_ewma_weights_hand_computed(spark):
    """EWMA renormalized weights on a hand-built series: for rows
    [10, 20, 40] with a=0.6 the third row's ewma is
    (40*1 + 20*0.6 + 10*0.36) / (1 + 0.6 + 0.36)."""
    from dblab_ece_trino_spark.operators.registry import spark_queries
    from tests.conftest import SF_MED
    import duckdb

    # drive the registered oracle SQL on a 3-row frame to pin semantics
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '2024-01-01 00:00:00', 7, 'click', 10.0, ''),"
        "(2, TIMESTAMP '2024-01-01 00:01:00', 7, 'click', 20.0, ''),"
        "(3, TIMESTAMP '2024-01-01 00:02:00', 7, 'click', 40.0, '')"
        ") t(event_id, ts, user_id, event_type, value, props)"
    )
    from dblab_ece_trino_spark.operators.registry import oracle_queries

    rows = con.execute(oracle_queries()["ts_ewma"]).fetchall()
    assert [r[1] for r in rows] == [1, 2, 3]
    expected3 = round((40 * 1 + 20 * 0.6 + 10 * 0.36) / (1 + 0.6 + 0.36), 4)
    assert rows[2][2] == expected3
    assert rows[0][2] == 10.0  # first row: weight renormalizes to itself


def test_bigram_lm_self_scores_zero_for_unique_doc(spark):
    """A doc whose every bigram is corpus-unique has avg_logp = ln(1/1)
    = 0 only if each w1 also appears once; with repeated w1 the score
    goes negative — pin both cases on a 2-doc corpus."""
    from dblab_ece_trino_spark.operators.llmprep import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    # doc 1 bigrams: "alpha beta" (c=2, c_uni(alpha)=2 -> ln 1 = 0),
    #                "beta gamma" (c=1, c_uni(beta)=2 -> ln 0.5)
    import math

    assert out[1]["n_bigrams"] == 2
    assert out[1]["avg_logp"] == round((0.0 + math.log(0.5)) / 2, 4)
    assert out[2]["avg_logp"] == out[1]["avg_logp"]  # symmetric corpus


def test_ohlc_open_close_ordering(spark):
    """open is the earliest event's value, close the latest — pinned on
    a hand-built one-day series."""
    import datetime

    from dblab_ece_trino_spark.operators.registry import spark_queries

    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, 9), 1, "x", 5.0, ""),
            (2, datetime.datetime(2024, 1, 1, 12), 1, "x", 99.0, ""),
            (3, datetime.datetime(2024, 1, 1, 16), 1, "x", 7.0, ""),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.createOrReplaceTempView("__ohlc_probe")
    row = spark.sql(
        """
        SELECT min_by(value, ts) AS open, max_by(value, ts) AS close,
               max(value) AS high, min(value) AS low
        FROM __ohlc_probe
        """
    ).collect()[0]
    assert (row["open"], row["close"], row["high"], row["low"]) == (
        5.0, 7.0, 99.0, 5.0,
    )


def test_width_bucket_hist_partitions_all_orders(spark, duck):
    """Histogram buckets partition the table: counts sum to row count."""
    from dblab_ece_trino_spark.operators.registry import spark_queries
    from tests.conftest import SF_MED

    rows = spark_queries()["op_width_bucket_hist"](spark, SF_MED).collect()
    total = sum(r["n_orders"] for r in rows)
    n = spark.read.parquet(SF_MED + "/orders.parquet").count()
    assert total == n


def test_grouping_marks_totals_consistent(spark):
    """GROUPING SETS hierarchy: the grand-total row equals the sum of
    the per-flag rows, which equals the sum of the leaf rows."""
    from dblab_ece_trino_spark.operators.registry import spark_queries
    from tests.conftest import SF_MED

    rows = spark_queries()["op_grouping_marks"](spark, SF_MED).collect()
    leaf = sum(r["n"] for r in rows if r["gid"] == 0)
    per_flag = sum(r["n"] for r in rows if r["gid"] == 1)
    grand = [r["n"] for r in rows if r["gid"] == 3]
    assert leaf == per_flag == grand[0]


def test_incremental_dedup_corpus_cap_is_filter(spark):
    """max_corpus_df caps by corpus shingle df on BOTH sides — pinned
    against an explicit pre-filtered recomputation."""
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.operators.llmprep import incremental_dedup
    from tests.conftest import SF_SMALL
    import pyspark.sql.functions as F

    docs = engine_for(spark, SF_SMALL).catalogs.table("lake.llm.documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    capped = incremental_dedup(batch, corpus, max_corpus_df=5)
    got = {r["batch_id"]: r["best_jaccard"] for r in capped.collect()}
    exact = incremental_dedup(batch, corpus)
    base = {r["batch_id"]: r["best_jaccard"] for r in exact.collect()}
    assert len(base) > 0
    # exact text twins across the split have jaccard 1.0 under ANY cap
    # (identical capped shingle sets) — they must survive capping
    twins = {b for b, j in base.items() if j == 1.0}
    assert twins <= set(got)
    for b in twins:
        assert got[b] == 1.0


def test_winsorize_clamps_about_five_percent_each_side(spark):
    from dblab_ece_trino_spark.entrypoints import build_queries
    from tests.conftest import SF_MED

    rows = build_queries()["op_winsorize"](spark, SF_MED).collect()
    assert len(rows) == 3
    for r in rows:
        # discrete p05/p95 thresholds: ~5% clamped on each side
        assert 0 < r.n_low_clamped <= 0.06 * r.n
        assert 0 < r.n_high_clamped <= 0.06 * r.n
        assert r.winsorized_cents > 0


def test_expectations_pass_on_clean_orders(spark):
    from dblab_ece_trino_spark.entrypoints import build_queries
    from tests.conftest import SF_MED

    r = build_queries()["wh_expectations"](spark, SF_MED).collect()[0]
    assert r.n_rows > 0
    assert r.all_passed == (
        r.null_custkey == 0
        and r.nonpositive_price == 0
        and r.bad_status == 0
        and r.duplicate_keys == 0
    )


def test_mann_kendall_matches_numpy(spark):
    """S, n, and z per nation match an O(n^2) python recomputation of
    the Mann-Kendall statistic from the exact monthly cent series."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from dblab_ece_trino_spark.entrypoints import build_queries
    from tests.conftest import SF_SMALL

    rows = build_queries()["ts_mann_kendall"](spark, SF_SMALL).collect()
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    nat = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy(
            "n_name",
            F.expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").alias("mix"),
        )
        .agg(
            F.sum(
                F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            ).alias("cents")
        )
        .collect()
    )
    series = defaultdict(list)
    for r in monthly:
        series[r.n_name].append((r.mix, r.cents))
    assert len(rows) == len(series)
    for r in rows:
        xs = [c for _, c in sorted(series[r.nation])]
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        assert r.n_months == n
        assert r.s_stat == s
        assert r.var18_num == n * (n - 1) * (2 * n + 5)
        want_z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(
            n * (n - 1) * (2 * n + 5) / 18
        )
        assert abs(r.z_mk - want_z) < 1e-9


def test_rolling_corr_matches_numpy(spark):
    """The 28-day windowed correlation matches a per-row numpy Pearson
    over the same calendar window, and windows with data use only days
    within 27 days back."""
    from collections import defaultdict

    import numpy as np

    from dblab_ece_trino_spark.entrypoints import build_queries
    from tests.conftest import SF_SMALL

    rows = build_queries()["ts_rolling_corr"](spark, SF_SMALL).collect()
    daily = defaultdict(dict)
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").collect()
    for r in li:
        d = r.l_shipdate.date()
        prev = daily[r.l_returnflag].get(d, (0, 0))
        daily[r.l_returnflag][d] = (
            prev[0] + round(r.l_extendedprice * 100),
            prev[1] + round(r.l_quantity),
        )
    checked = 0
    for r in rows[:: max(1, len(rows) // 200)]:
        flag_days = daily[r.flag]
        win = [
            v
            for d, v in flag_days.items()
            if 0 <= (r.d - d).days <= 27
        ]
        xs = np.array([w[0] for w in win], dtype=float)
        ys = np.array([w[1] for w in win], dtype=float)
        assert r.n_days == len(win)
        assert r.rev_cents_28d == int(xs.sum())
        assert r.qty_28d == int(ys.sum())
        n = len(win)
        vx = n * (xs * xs).sum() - xs.sum() ** 2
        vy = n * (ys * ys).sum() - ys.sum() ** 2
        if vx == 0 or vy == 0:
            assert r.corr_28d is None
        else:
            want = (n * (xs * ys).sum() - xs.sum() * ys.sum()) / (
                np.sqrt(vx) * np.sqrt(vy)
            )
            assert abs(r.corr_28d - want) < 1e-6
            assert -1.000001 <= r.corr_28d <= 1.000001
            checked += 1
    assert checked > 50


def test_mad_outliers_matches_python(spark):
    """Discrete median, discrete MAD and the 3-MAD outlier count match
    a python recomputation (percentile_disc semantics: smallest element
    whose rank reaches ceil(n/2))."""
    from dblab_ece_trino_spark.entrypoints import build_queries
    from tests.conftest import SF_SMALL

    def disc_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    rows = build_queries()["op_mad_outliers"](spark, SF_SMALL).collect()
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").collect()
    groups = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(round(r.l_extendedprice * 100))
    assert len(rows) == len(groups)
    for r in rows:
        xs = groups[r.l_returnflag]
        med = disc_median(xs)
        devs = [abs(x - med) for x in xs]
        mad = disc_median(devs)
        assert r.median_cents == med
        assert r.mad_cents == mad
        assert r.n == len(xs)
        assert r.n_outliers == sum(1 for d in devs if d > 3 * mad)
        # uniform-ish price data: 3*MAD exceeds the max deviation, so the
        # count can legitimately be 0 — the equality check above is the gate
        assert 0 <= r.n_outliers < r.n


def test_runs_test_matches_python(spark):
    """n1/n2/R and z match a direct python runs-test computation."""
    import math
    import statistics
    from collections import defaultdict

    from dblab_ece_trino_spark.entrypoints import build_queries
    from tests.conftest import SF_SMALL

    row = build_queries()["op_runs_test"](spark, SF_SMALL).collect()[0]
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    daily = defaultdict(int)
    for r in orders:
        daily[r.o_orderdate.date() if hasattr(r.o_orderdate, "date") else r.o_orderdate] += round(
            float(r.o_totalprice) * 100
        )
    med = statistics.median(daily.values())
    seq = [1 if c > med else 0 for _, c in sorted(daily.items()) if c != med]
    n1, n2 = sum(seq), len(seq) - sum(seq)
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    assert (row.n1, row.n2, row.r) == (n1, n2, runs)
    mean = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert abs(row.z_runs - (runs - mean) / math.sqrt(var)) < 1e-9
