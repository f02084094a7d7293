"""Hypothesis property tests (SURVEY §5: "pytest unit tests per operator +
hypothesis property tests, e.g. except ≡ set difference, topk ≡
sort-then-head").

One shared SparkSession; generated inputs stay small (Spark round-trip per
example is the cost), with deadline disabled accordingly.
"""

from __future__ import annotations

from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ints = st.lists(st.integers(min_value=-50, max_value=50), max_size=30)


@given(a=ints, b=ints)
@settings(**_SETTINGS)
def test_except_is_set_difference(spark, a, b):
    da = spark.createDataFrame([(x,) for x in a] or [(0,)], "v int").limit(len(a))
    db = spark.createDataFrame([(x,) for x in b] or [(0,)], "v int").limit(len(b))
    got = sorted(r.v for r in da.subtract(db).collect())
    want = sorted(set(a) - set(b))
    assert got == want


@given(xs=st.lists(st.tuples(st.integers(0, 20), st.integers(-100, 100)), max_size=30),
       k=st.integers(1, 10))
@settings(**_SETTINGS)
def test_topk_is_sort_then_head(spark, xs, k):
    df = spark.createDataFrame([(i, v) for i, v in xs] or [(0, 0)], "id int, v int").limit(len(xs))
    got = [(r.v, r.id) for r in df.orderBy(F.col("v").desc(), F.col("id").asc()).limit(k).collect()]
    want = sorted(((v, i) for i, v in xs), key=lambda t: (-t[0], t[1]))[:k]
    assert got == want


@given(xs=st.lists(st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=1, max_size=40),
       n_salts=st.integers(2, 8))
@settings(**_SETTINGS)
def test_salted_agg_equals_direct_generated(spark, xs, n_salts):
    from dblab_ece_trino_spark.operators.aggregates import salted_agg

    df = spark.createDataFrame(xs, "k int, v int")
    direct = {
        r.k: (r.s, r.c)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    salted = {
        r.k: (r.s, r.c)
        for r in salted_agg(df, ["k"], sums={"v": "s"}, count_alias="c", n_salts=n_salts).collect()
    }
    assert direct == salted


@given(texts=st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=8
))
@settings(**_SETTINGS)
def test_exact_dedup_groups_match_python(spark, texts):
    from dblab_ece_trino_spark.operators.dedup import dedup_exact

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.fingerprint: (r.keep_id, r.dup_count) for r in dedup_exact(df).collect()}
    import hashlib
    from collections import defaultdict

    groups = defaultdict(list)
    for i, t in rows:
        groups[hashlib.md5(t.encode()).hexdigest()].append(i)
    want = {fp: (min(ids), len(ids)) for fp, ids in groups.items()}
    assert got == want


@given(key=st.lists(st.integers(0, 1 << 40), min_size=1, max_size=30),
       n=st.integers(2, 16))
@settings(**_SETTINGS)
def test_bucketing_complete_and_in_range(spark, key, n):
    from dblab_ece_trino_spark.functions.hashing import bucket_expr

    df = spark.createDataFrame([(k,) for k in key], "k long")
    out = df.withColumn("b", bucket_expr(F.col("k"), n)).collect()
    assert len(out) == len(key)
    assert all(0 <= r.b < n for r in out)
    # determinism: equal keys get equal buckets
    seen = {}
    for r in out:
        assert seen.setdefault(r.k, r.b) == r.b


_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=1, max_size=40,
)


@given(toks=_words, chunk=st.integers(4, 12), stride=st.integers(2, 8))
@settings(**_SETTINGS)
def test_chunking_reconstructs_document(spark, toks, chunk, stride):
    """Stride-concatenation of chunks ≡ the original token stream: the
    first chunk plus the tail (tokens past the overlap) of each later
    chunk reproduces the document exactly, in order."""
    from dblab_ece_trino_spark.operators.llmprep import chunk_documents

    stride = min(stride, chunk)
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    chunks = chunk_documents(df, chunk_tokens=chunk, stride=stride)
    # rebuild from raw slices (recompute chunk text the same way)
    rows = sorted(
        (r.chunk_idx, r.n_chunk_tokens) for r in chunks.collect()
    )
    rebuilt = 0
    for idx, n in rows:
        start = idx * stride  # 0-based
        assert start < len(toks)
        assert n == min(chunk, len(toks) - start)
        rebuilt = max(rebuilt, start + n)
    assert rebuilt == len(toks)  # full coverage, no token dropped


@given(toks=_words)
@settings(**_SETTINGS)
def test_tf_cosine_self_similarity_is_one(spark, toks):
    """A document duplicated under two ids must score cos² = 1."""
    from dblab_ece_trino_spark.operators.llmprep import tf_cosine_pairs

    text = " ".join(toks)
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    rows = tf_cosine_pairs(df, threshold_sq=0.999999).collect()
    assert len(rows) == 1 and rows[0].cos2 == 1.0


@given(toks=_words)
@settings(**_SETTINGS)
def test_rolling_fingerprint_is_order_sensitive(spark, toks):
    from dblab_ece_trino_spark.operators.text import rolling_fingerprint

    text = " ".join(toks)
    rev = " ".join(reversed(toks))
    df = spark.createDataFrame([(1, text), (2, rev)], "doc_id long, text string")
    fps = {r.doc_id: r.fp for r in df.select(
        "doc_id", rolling_fingerprint(F.col("text")).alias("fp")).collect()}
    if text != rev:
        assert fps[1] != fps[2]
    else:
        assert fps[1] == fps[2]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),          # key
            st.integers(0, 10),         # version ts (duplicates allowed)
            st.integers(0, 3),          # attr
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_latest_by_key_matches_python(spark, rows):
    from dblab_ece_trino_spark.operators.warehouse import latest_by_key

    # uid disambiguates duplicate (key, ts) rows as the tiebreak column
    data = [(k, t, a, i) for i, (k, t, a) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, ts int, attr int, uid int")
    got = {(r.k, r.ts, r.attr, r.uid) for r in
           latest_by_key(df, ["k"], "ts", tiebreak=["uid"]).collect()}
    want = {}
    for k, t, a, i in data:
        if k not in want or (t, i) > (want[k][1], want[k][3]):
            want[k] = (k, t, a, i)
    assert got == set(want.values())


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),  # (key, attr)
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_scd2_matches_run_compression(spark, rows):
    from dblab_ece_trino_spark.operators.warehouse import scd2_intervals

    # strictly increasing ts per key → deterministic without tiebreak
    seen: dict[int, int] = {}
    data = []
    for k, a in rows:
        seen[k] = seen.get(k, 0) + 1
        data.append((k, seen[k], a))
    df = spark.createDataFrame(data, "k int, ts int, attr int")
    got = sorted(
        (r.k, r.attr, r.valid_from, r.valid_to)
        for r in scd2_intervals(df, ["k"], "ts", ["attr"]).collect()
    )
    # python reference: compress runs per key, close with next change ts
    want = []
    by_key: dict[int, list] = {}
    for k, t, a in sorted(data, key=lambda x: (x[0], x[1])):
        by_key.setdefault(k, []).append((t, a))
    for k, seq in by_key.items():
        changes = [
            (t, a) for i, (t, a) in enumerate(seq) if i == 0 or a != seq[i - 1][1]
        ]
        for i, (t, a) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            want.append((k, a, t, nxt))
    assert got == sorted(want)


@given(
    old=st.dictionaries(st.integers(0, 15), st.integers(0, 5), max_size=15),
    new=st.dictionaries(st.integers(0, 15), st.integers(0, 5), max_size=15),
)
@settings(**_SETTINGS)
def test_snapshot_diff_matches_dict_compare(spark, old, new):
    from dblab_ece_trino_spark.operators.warehouse import snapshot_diff

    do = spark.createDataFrame(list(old.items()) or [(-1, 0)], "k int, v int")
    dn = spark.createDataFrame(list(new.items()) or [(-1, 0)], "k int, v int")
    if not old:
        do = do.filter("k >= 0")
    if not new:
        dn = dn.filter("k >= 0")
    got = {(r.k, r.status) for r in snapshot_diff(do, dn, ["k"]).collect()}
    want = (
        {(k, "added") for k in new.keys() - old.keys()}
        | {(k, "removed") for k in old.keys() - new.keys()}
        | {(k, "changed") for k in old.keys() & new.keys() if old[k] != new[k]}
    )
    assert got == want


_event_logs = st.lists(
    st.tuples(
        st.integers(0, 4),                 # user_id
        st.integers(0, 1000),              # ts offset (seconds)
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=40,
)


def _events_view(spark, log, name):
    """Materialize a generated event log as a temp view with unique
    (ts, event_id) order keys."""
    rows = [
        (i, f"2024-01-01 00:{t // 60 % 60:02d}:{t % 60:02d}", u, e)
        for i, (u, t, e) in enumerate(log)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
    )
    df.createOrReplaceTempView(name)
    return df


@given(log=_event_logs)
@settings(**_SETTINGS)
def test_funnel_matches_python_reference(spark, log):
    from dblab_ece_trino_spark.operators.behavior import FUNNEL_TEMPLATE

    _events_view(spark, log, "prop_events_funnel")
    got = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase, r.stage)
        for r in spark.sql(
            FUNNEL_TEMPLATE.format(events="prop_events_funnel")
        ).collect()
    }

    # python reference: strictly ordered first-view -> first-later-click
    # -> first-later-purchase per user
    by_user: dict = {}
    for i, (u, t, e) in enumerate(log):
        by_user.setdefault(u, []).append((t, i, e))
    want = {}
    for u, evs in by_user.items():
        views = [t for t, _, e in evs if e == "view"]
        if not views:
            continue
        t_view = min(views)
        clicks = [t for t, _, e in evs if e == "click" and t > t_view]
        t_click = min(clicks) if clicks else None
        purchases = (
            [t for t, _, e in evs if e == "purchase" and t > t_click]
            if t_click is not None
            else []
        )
        t_purchase = min(purchases) if purchases else None
        want[u] = (
            t_view,
            t_click,
            t_purchase,
            1 + (t_click is not None) + (t_purchase is not None),
        )
    assert set(got) == set(want)
    for u, (tv, tc, tp, stage) in want.items():
        gv, gc, gp, gstage = got[u]
        assert gstage == stage

        def sec(ts):
            return None if ts is None else ts.minute * 60 + ts.second

        assert (sec(gv), sec(gc), sec(gp)) == (tv, tc, tp)


@given(log=_event_logs)
@settings(**_SETTINGS)
def test_transitions_match_python_reference(spark, log):
    from dblab_ece_trino_spark.operators.behavior import TRANSITIONS_TEMPLATE

    _events_view(spark, log, "prop_events_trans")
    got = {
        (r.prev_type, r.next_type): (r.n_transitions, r.n_users)
        for r in spark.sql(
            TRANSITIONS_TEMPLATE.format(events="prop_events_trans")
        ).collect()
    }

    by_user: dict = {}
    for i, (u, t, e) in enumerate(log):
        by_user.setdefault(u, []).append((t, i, e))
    counts: dict = {}
    users: dict = {}
    for u, evs in by_user.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
            users.setdefault((a, b), set()).add(u)
    want = {k: (n, len(users[k])) for k, n in counts.items()}
    assert got == want


def test_seasonal_decompose_reconstructs_series(spark):
    """Additive decomposition identity: v = trend + seasonal + residual
    up to the 1e-6 rounding grid (3 rounded terms -> 2e-6 slack)."""
    from dblab_ece_trino_spark.entrypoints import build_queries
    from tests.conftest import SF_MED

    rows = build_queries()["ts_seasonal_decompose"](spark, SF_MED).collect()
    assert len(rows) >= 28  # one month of daily points at sf0.01
    for r in rows:
        assert abs(r.v - (r.trend + r.seasonal + r.residual)) <= 2.1e-6
    # trend is a 7-day smoother: its variance is below the raw series'
    import statistics

    assert statistics.pvariance([r.trend for r in rows]) < statistics.pvariance(
        [r.v for r in rows]
    )


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    ch=st.sampled_from([3, 4]),
    rle=st.booleans(),
    topdown=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_tga_roundtrip_property(w, h, ch, rle, topdown, seed):
    """encode_tga -> decode_tga is the identity for EVERY image shape,
    channel count, compression mode, and row order (the hypothesis
    upgrade of the fixed-vector roundtrip: random pixel content
    exercises RLE packet boundaries the fixture family cannot)."""
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_tga,
        encode_tga,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    rw, rh, rch, arr = decode_tga(encode_tga(img, rle=rle, topdown=topdown))
    assert (rw, rh, rch) == (w, h, ch)
    assert np.array_equal(arr, img)


@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    ch=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_qoi_roundtrip_property(w, h, ch, seed):
    """encode_qoi -> decode_qoi is the identity for random content —
    random pixels stress the 64-slot hash index and LUMA/DIFF range
    boundaries beyond the band fixtures."""
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_qoi,
        encode_qoi,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    rw, rh, rch, arr = decode_qoi(encode_qoi(img))
    assert (rw, rh, rch) == (w, h, ch)
    assert np.array_equal(arr, img)


@given(
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_pcx_roundtrip_property(w, h, seed):
    """encode_pcx -> decode_pcx is the identity for every shape and
    random content — random bytes >= 0xC0 stress the literal-as-run
    rule, odd widths stress the even bytes-per-line pad."""
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_pcx,
        encode_pcx,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rw, rh, rch, arr = decode_pcx(encode_pcx(img))
    assert (rw, rh, rch) == (w, h, 3)
    assert np.array_equal(arr, img)


@given(
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    rle=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_sunras_roundtrip_property(w, h, rle, seed):
    """encode_sunras -> decode_sunras is the identity for every shape,
    both record types, and random content (random 0x80 bytes stress
    the literal-escape rule; odd widths stress the 16-bit row pad)."""
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_sunras,
        encode_sunras,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rw, rh, rch, arr = decode_sunras(encode_sunras(img, rle=rle))
    assert (rw, rh, rch) == (w, h, 3)
    assert np.array_equal(arr, img)
