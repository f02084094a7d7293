"""Independent pure-Python recomputations for the round-6 operators.

The DuckDB oracle gate (tests/test_correctness.py) catches cross-engine
divergence; these tests catch SHARED mistakes — a formula both SQL
dialects would compute identically wrong — by re-deriving each statistic
from raw rows in plain Python/numpy, the same defense the codec entries
get from their closed-form oracles.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from tests.conftest import SF_SMALL


def _lineitem_daily_cents(spark, flags):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_returnflag", "l_shipdate", "l_extendedprice"
    )
    rows = li.collect()
    daily = defaultdict(int)
    for r in rows:
        if r.l_returnflag in flags:
            daily[(r.l_returnflag, r.l_shipdate)] += int(
                round(r.l_extendedprice * 100)
            )
    return daily


def test_mann_whitney_matches_python_recompute(spark):
    from dblab_ece_trino_spark.entrypoints import build_queries

    out = build_queries()["op_mann_whitney"](spark, SF_SMALL).collect()[0]
    daily = _lineitem_daily_cents(spark, {"A", "R"})
    a = sorted(c for (f, _), c in daily.items() if f == "A")
    r = sorted(c for (f, _), c in daily.items() if f == "R")
    pooled = sorted([(c, "A") for c in a] + [(c, "R") for c in r])
    # midranks with ties, doubled units
    by_val = Counter(c for c, _ in pooled)
    start = {}
    pos = 0
    for v in sorted(by_val):
        start[v] = pos
        pos += by_val[v]
    r1_x2 = sum(2 * start[c] + by_val[c] + 1 for c, f in pooled if f == "A")
    n1, n2 = len(a), len(r)
    assert out.n1 == n1 and out.n2 == n2
    assert out.r1_x2 == r1_x2
    assert out.u1_x2 == r1_x2 - n1 * (n1 + 1)
    assert out.tie_cubes == sum(t**3 - t for t in by_val.values())
    n = n1 + n2
    var = n1 * n2 / 12 * ((n + 1) - out.tie_cubes / (n * (n - 1)))
    z = (r1_x2 / 2 - n1 * (n1 + 1) / 2 - n1 * n2 / 2) / math.sqrt(var)
    assert abs(out.z_u - z) < 1e-9


def test_ks_matches_python_recompute(spark):
    from dblab_ece_trino_spark.entrypoints import build_queries

    out = build_queries()["op_ks_test"](spark, SF_SMALL).collect()[0]
    daily = _lineitem_daily_cents(spark, {"A", "R"})
    a = sorted(c for (f, _), c in daily.items() if f == "A")
    r = sorted(c for (f, _), c in daily.items() if f == "R")
    n1, n2 = len(a), len(r)
    vals = sorted(set(a) | set(r))
    d_num = 0
    for v in vals:
        c1 = sum(1 for x in a if x <= v)
        c2 = sum(1 for x in r if x <= v)
        d_num = max(d_num, abs(n2 * c1 - n1 * c2))
    assert (out.n1, out.n2, out.d_num) == (n1, n2, d_num)
    assert abs(out.ks_d - d_num / (n1 * n2)) < 1e-12


def test_theil_sen_is_the_discrete_median_of_pairwise_slopes(spark):
    from dblab_ece_trino_spark.entrypoints import build_queries

    out = build_queries()["ts_theil_sen"](spark, SF_SMALL).collect()[0]
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderdate", "o_totalprice"
    )
    monthly = defaultdict(int)
    for r in o.collect():
        mix = r.o_orderdate.year * 12 + r.o_orderdate.month - 1
        monthly[mix] += int(round(r.o_totalprice * 100))
    ms = sorted(monthly)
    slopes = sorted(
        (monthly[j] - monthly[i]) / (j - i)
        for ai, i in enumerate(ms)
        for j in ms[ai + 1:]
    )
    n = len(slopes)
    assert out.n_pairs == n
    lo = slopes[(n + 1) // 2 - 1]  # rank floor((n+1)/2), 1-based
    hi = slopes[-(-(n + 1) // 2) - 1]  # rank ceil((n+1)/2)
    assert out.slope_lo == lo and out.slope_hi == hi
    assert out.slope_lo <= out.slope_hi


def test_concurrency_sweep_matches_bruteforce_overlap_count(spark):
    """Peak concurrency per day equals a brute-force maximum over every
    session-start instant of the number of clamped intervals covering
    it (the max of the sweep is always attained at some start point or
    a day boundary)."""
    import datetime

    from dblab_ece_trino_spark.entrypoints import build_queries, engine_for
    from dblab_ece_trino_spark.streaming.events import session_window_counts

    out = {
        r.day: (r.n_sessions, r.peak_concurrency)
        for r in build_queries()["op_concurrency_sweep"](
            spark, SF_SMALL
        ).collect()
    }
    cat = engine_for(spark, SF_SMALL).catalogs
    sess = [
        (r.session_start, r.session_end)
        for r in session_window_counts(
            cat.table("elastic.default.events")
        ).collect()
    ]
    days = sorted(out)
    for day in days:
        d0 = datetime.datetime.combine(day, datetime.time())
        d1 = d0 + datetime.timedelta(days=1)
        clamped = [
            (max(s, d0), min(e, d1)) for s, e in sess if s < d1 and e > d0
        ]
        assert out[day][0] == len(clamped)
        # candidate peak instants: each clamped start (end-exclusive)
        peak = 0
        for t, _ in clamped:
            peak = max(peak, sum(1 for s, e in clamped if s <= t < e))
        assert out[day][1] == peak, day


def test_epsilon_ball_matches_numpy_bruteforce(spark):
    import numpy as np

    from dblab_ece_trino_spark.entrypoints import build_queries

    got = {
        (r.qid, r.cid): (r.sab, r.sqq)
        for r in build_queries()["sim_epsilon_ball"](spark, SF_SMALL).collect()
    }
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    allv = np.concatenate(list(vecs.values()))
    mn, mx = allv.min(), allv.max()
    mid, s = (mn + mx) / 2.0, (mx - mn) / 255.0
    codes = {k: np.floor((v - mid) / s + 0.5).astype(np.int64) for k, v in vecs.items()}
    want = {}
    for q in [k for k in codes if k < 8]:
        sqq = int(codes[q] @ codes[q])
        for c in codes:
            if c == q:
                continue
            sab = int(codes[q] @ codes[c])
            if 4 * sab >= sqq:
                want[(q, c)] = (sab, sqq)
    assert got == want and len(got) > 0


def test_benford_counts_sum_and_digit_extraction(spark):
    from dblab_ece_trino_spark.entrypoints import build_queries

    out = build_queries()["op_benford_test"](spark, SF_SMALL).collect()[0]
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select("o_totalprice")
    digs = Counter(
        str(int(round(r.o_totalprice * 100)))[0]
        for r in o.collect()
        if r.o_totalprice > 0
    )
    assert out.n == sum(digs.values())
    for d in range(1, 10):
        assert getattr(out, f"n{d}") == digs.get(str(d), 0)
    assert out.chi2 >= 0
