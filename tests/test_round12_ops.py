"""Round-12 operator tests: ADVICE regressions + new graded ops.

Every new graded operator gets (a) a hand-input equivalence test
against an independent pure-Python re-derivation and (b) where the op
fixed a numeric seam, an expression-level regression pinning the seam.
"""
import pytest


# ------------------------------------------------------- katz overflow
def test_katz_floor_div_exact_past_long(spark):
    """ADVICE r11 (medium): `kz div 8` routed through IntegralDivide,
    which casts to LONG and silently wraps past ~9.2e18.  The fixed
    per-edge term FLOOR(kz/8) must stay exact in decimal space."""
    df = spark.sql(
        "SELECT CAST('100000000000000000000000000000000' AS "
        "DECIMAL(38,0)) AS kz"
    )
    got = df.selectExpr(
        "CAST(sum(FLOOR(kz / 8)) AS DECIMAL(38,0)) AS term"
    ).collect()[0].term
    assert int(got) == 10**32 // 8


def test_katz_dense_graph_past_bigint(spark):
    """Katz on K_17 with beta=1e18 drives per-node mass to ~3.1e19 —
    past the LONG wrap threshold where the pre-fix `div` form silently
    diverged from the HUGEINT oracle.  Must equal the exact integer
    recursion."""
    from dblab_ece_trino_spark.operators.graph import (
        KATZ_ITERS,
        KATZ_OUT_SCALE,
        katz_centrality,
    )

    n = 17
    beta = 10**18
    edges = [(u, v) for u in range(n) for v in range(u + 1, n)]
    pairs = spark.createDataFrame(edges, "u long, v long")
    got = {
        r.node: r.katz_scaled
        for r in katz_centrality(pairs, beta=beta, top_n=n).collect()
    }

    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    kz = {m: beta for m in adj}
    for _ in range(KATZ_ITERS):
        kz = {m: beta + sum(kz[w] // 8 for w in adj[m]) for m in adj}
    # the recursion must actually be in the past-BIGINT regime,
    # else this test stops guarding the wrap
    assert max(kz.values()) > 2**63 - 1
    tot = sum(kz.values())
    want = {m: kz[m] * KATZ_OUT_SCALE // tot for m in adj}
    assert got == want


# ------------------------------------------- capped-witness RA index
def test_link_prediction_witness_cap(spark):
    """The round-12 capped form: witnesses with deg(z) > cap generate
    no wedges, but the 1/deg(z) term of surviving witnesses keeps the
    TRUE degree.  Re-derived in pure Python on a hand graph where the
    cap actually bites (hub 5 has degree 3 > cap 2)."""
    import itertools

    from dblab_ece_trino_spark.operators.graph import link_prediction_ra

    edges = [(1, 2), (2, 3), (3, 4), (5, 1), (5, 3), (5, 4)]
    pairs = spark.createDataFrame(edges, "u long, v long")
    got = {
        (r.a, r.b): (r.n_common, r.ra_e6)
        for r in link_prediction_ra(
            pairs, top_n=100, max_witness_deg=2
        ).collect()
    }
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {n: len(s) for n, s in adj.items()}
    want = {}
    for a, b in itertools.combinations(sorted(deg), 2):
        if b in adj[a]:
            continue
        witnesses = {z for z in adj[a] & adj[b] if deg[z] <= 2}
        if not witnesses:
            continue
        want[(a, b)] = (
            len(witnesses),
            sum(1_000_000 // deg[z] for z in witnesses),
        )
    assert got == want
    # the cap must actually have bitten on this graph, else the test
    # stops guarding the capped path
    full = {
        (r.a, r.b)
        for r in link_prediction_ra(
            pairs, top_n=100, max_witness_deg=None
        ).collect()
    }
    assert set(got) != full


# ------------------------------------------- cluster keeper selection
def test_cluster_keep_rule_hand_frames(spark):
    """The keep rule in isolation: max quality, doc_id tiebreak —
    pinned on hand frames where both the quality order and the
    tiebreak bite."""
    from dblab_ece_trino_spark.operators.dedup import cluster_keep

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)],
        "sid long, cluster long",
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5), (9, 5)],
        "doc_id long, n_chars long",
    )
    got = [tuple(r) for r in cluster_keep(labels, docs).collect()]
    # cluster 1: 2 and 3 tie at 99 -> lower id 2 wins; cluster 7:
    # 7 and 9 tie at 5 -> 7 wins
    assert got == [(1, 3, 2, 99, 2), (7, 2, 7, 5, 1)]


def test_cluster_keep_end_to_end_pure_python():
    """End-to-end re-derivation WITHOUT Spark or the recursive CTE:
    take the exact-verified Jaccard pairs from the minhash oracle
    (DuckDB), run union-find + the keep rule in pure Python, and the
    ledger must equal the dedup_cluster_keep oracle."""
    import duckdb

    from dblab_ece_trino_spark.operators.dedup import (
        _CLUSTER_KEEP_ORACLE,
        _MINHASH_ORACLE,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    pairs = con.execute(_MINHASH_ORACLE).fetchall()
    chars = dict(
        con.execute("SELECT doc_id, n_chars FROM documents").fetchall()
    )
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _j in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    # cluster label is the component min by construction
    want = sorted(
        (min(ms), len(ms), min(ms, key=lambda m: (-chars[m], m)),
         chars[min(ms, key=lambda m: (-chars[m], m))], len(ms) - 1)
        for ms in (sorted(v) for v in comp.values())
    )
    got = sorted(tuple(r) for r in con.execute(_CLUSTER_KEEP_ORACLE).fetchall())
    assert got == want
    assert len(got) == len(comp)  # keeper count == component count


# ------------------------------------------- train-serve leakage audit
def test_leakage_audit_matches_pure_python():
    """The sample_leakage_audit oracle must equal an independent
    pure-Python evaluator at sf0.001, agree with sample_time_split on
    the cutoff, and satisfy the family invariants."""
    import duckdb

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    got = con.execute(oracle_queries()["sample_leakage_audit"]).fetchall()
    rows = con.execute(
        "SELECT event_type, user_id, datediff('day', DATE '1970-01-01',"
        " CAST(ts AS DATE)) FROM events"
    ).fetchall()
    days = [d for _t, _u, d in rows]
    cutoff = min(days) + (8 * (max(days) - min(days))) // 10
    # sample_time_split must use the same cutoff
    ts_cut = con.execute(
        oracle_queries()["sample_time_split"]
    ).fetchall()[0][0]
    assert ts_cut == cutoff

    from collections import defaultdict

    pre: dict = defaultdict(int)
    post: dict = defaultdict(int)
    for t, u, d in rows:
        (pre if d <= cutoff else post)[(t, u)] += 1
    want = []
    for et in sorted({t for t, _u, _d in rows}):
        keys = {k for k in set(pre) | set(post) if k[0] == et}
        ktr = sum(1 for k in keys if pre[k] > 0)
        kte = sum(1 for k in keys if post[k] > 0)
        kx = sum(1 for k in keys if pre[k] > 0 and post[k] > 0)
        kc = sum(1 for k in keys if pre[k] == 0 and post[k] > 0)
        leaked = sum(post[k] for k in keys if pre[k] > 0)
        want.append(
            (et, ktr, kte, kx, kc, leaked, kx * 1_000_000 // len(keys))
        )
    assert got == want
    for et, ktr, kte, kx, kc, leaked, _ppm in want:
        assert kte == kx + kc          # test keys partition
        assert leaked >= kx            # every crossing key leaks >= 1


# ------------------------------------------------- PCX/TGA dispatch
def test_colormapped_tga_not_misrouted_to_pcx():
    """ADVICE r11 (low): a spec-valid color-mapped TGA (image type 1)
    with a 10-byte ID field starts 0x0A ?? 0x01 — the old PCX
    heuristic (payload[0]==0x0A and payload[2]==1) misrouted it to
    decode_pcx, which failed with a misleading PCX error.  It must
    now reach the TGA path and raise the TGA-specific message."""
    import struct

    from dblab_ece_trino_spark.operators.multimodal import decode_image

    # 18-byte TGA header: idlen=10, cmap_type=1, img_type=1
    # (color-mapped), 64-entry 24-bit colormap (so the payload passes
    # the PCX >=128-byte gate the old heuristic sat behind), 2x2, 8 bpp.
    header = struct.pack(
        "<BBBHHBHHHHBB", 10, 1, 1, 0, 64, 24, 0, 0, 2, 2, 8, 0
    )
    body = b"ID-FIELD!!" + bytes(64 * 3) + bytes(4)
    footer = bytes(8) + b"TRUEVISION-XFILE.\x00"
    payload = header + body + footer
    assert len(payload) >= 128 and payload[0] == 0x0A and payload[2] == 1
    with pytest.raises(ValueError, match="color-mapped TGA"):
        decode_image(payload)


def test_pcx_still_dispatches_after_tighten():
    """The tightened PCX heuristic (version + bits/plane checks) must
    still route a real PCX payload to decode_pcx."""
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_image,
        encode_pcx,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    w, h, arr = decode_image(encode_pcx(img))
    assert (w, h) == (4, 5)
    assert (arr == img).all()


# --------------------------------------------- DDSketch-style quantiles
def test_dd_quantiles_matches_pure_python():
    """Bucket ids, merge, and rank selection re-derived with explicit
    Python loops from the raw cents at sf0.001."""
    import duckdb

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet')"
    )
    got = con.execute(oracle_queries()["op_dd_quantiles"]).fetchall()
    cents = [
        int(c) for (c,) in con.execute(
            "SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT)"
            " FROM orders WHERE o_totalprice > 0"
        ).fetchall()
    ]
    from collections import Counter

    sketch: Counter = Counter()
    for c in cents:
        octv = c.bit_length() - 1
        sub = (c >> (octv - 2)) & 3
        sketch[(octv, sub)] += 1
    total = sum(sketch.values())
    buckets = sorted(sketch)
    want = []
    for q in (50, 90, 95, 99):
        cum = 0
        for octv, sub in buckets:
            prev = cum
            cum += sketch[(octv, sub)]
            if cum * 100 >= q * total and prev * 100 < q * total:
                want.append(
                    (q, octv * 4 + sub,
                     (4 + sub) * (1 << (octv - 2)),
                     (5 + sub) * (1 << (octv - 2)), total)
                )
                break
    assert got == want
    # the bracket must contain the exact discrete percentile
    s = sorted(cents)
    for q, _b, lo, hi, _n in want:
        exact = s[min(len(s) - 1, (q * len(s) + 99) // 100 - 1)]
        assert lo <= exact <= hi


# ------------------------------------------------- rich-club coefficient
def test_rich_club_hand_graph(spark):
    """phi(k) on a hand graph: hub clique {1,2,3} (mutually connected,
    degree >= 3) plus leaves — re-derived explicitly."""
    from dblab_ece_trino_spark.operators.graph import rich_club

    edges = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 5), (3, 6), (1, 7)]
    pairs = spark.createDataFrame(edges, "u long, v long")
    got = {r.k: (r.n_club, r.club_edges, r.phi_ppm)
           for r in rich_club(pairs, ks=(1, 2, 3)).collect()}
    deg: dict = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    want = {}
    for k in (1, 2, 3):
        club = {n for n, d in deg.items() if d > k}
        ek = sum(1 for u, v in edges if u in club and v in club)
        nk = len(club)
        phi = 2_000_000 * ek // (nk * (nk - 1)) if nk >= 2 else 0
        want[k] = (nk, ek, phi)
    assert got == want
    # the hub clique is fully connected: phi(2) == 1e6 exactly
    assert got[2] == (3, 3, 1_000_000)


# ------------------------------------------------ language confusion grid
def test_lang_confusion_consistent_with_language_id():
    """The confusion grid must be exactly the GROUP BY of the graded
    text_language_id entry's per-doc output."""
    import duckdb
    from collections import Counter

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    per_doc = con.execute(oracle_queries()["text_language_id"]).fetchall()
    grid = Counter((lab, pred) for _id, lab, pred in per_doc)
    label_tot = Counter(lab for _id, lab, _p in per_doc)
    want = sorted(
        (lab, pred, n, label_tot[lab], 1_000_000 * n // label_tot[lab])
        for (lab, pred), n in grid.items()
    )
    got = sorted(
        tuple(r) for r in
        con.execute(oracle_queries()["text_lang_confusion"]).fetchall()
    )
    assert got == want
    assert sum(n for _l, _p, n, _t, _ppm in got) == len(per_doc)


# ---------------------------------------------- weekday seasonality index
def test_weekday_profile_matches_pure_python():
    import duckdb
    from collections import defaultdict

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet')"
    )
    got = con.execute(oracle_queries()["ts_weekday_profile"]).fetchall()
    rows = con.execute(
        "SELECT isodow(o_orderdate),"
        " CAST(round(o_totalprice * 100, 0) AS BIGINT) FROM orders"
    ).fetchall()
    n: dict = defaultdict(int)
    rev: dict = defaultdict(int)
    for wd, c in rows:
        n[wd] += 1
        rev[wd] += int(c)
    nt, rt = sum(n.values()), sum(rev.values())
    want = [
        (wd, n[wd], rev[wd],
         7_000_000 * n[wd] // nt, 7_000_000 * rev[wd] // rt)
        for wd in sorted(n)
    ]
    assert got == want
    assert len(got) == 7


# ------------------------------------------------------ k-fold assignment
def test_kfold_matches_pure_python_md5():
    import duckdb
    import hashlib
    from collections import defaultdict

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    got = con.execute(oracle_queries()["sample_kfold"]).fetchall()
    ids = [i for (i,) in con.execute("SELECT doc_id FROM documents").fetchall()]
    folds: dict = defaultdict(list)
    for i in ids:
        h = hashlib.md5(f"kfold-v1{i}".encode()).hexdigest()
        folds[int(h[:4], 16) % 5].append(i)
    total = len(ids)
    want = [
        (f, len(v), 5_000_000 * len(v) // total, total - len(v),
         min(v), max(v))
        for f, v in sorted(folds.items())
    ]
    assert got == want
    assert sum(r[1] for r in got) == total  # folds partition the corpus


# ------------------------------------------- semantic eval contamination
def test_eval_contamination_matches_numpy():
    import duckdb
    import numpy as np

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    got = con.execute(oracle_queries()["sim_eval_contamination"]).fetchall()
    rows = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    evals = sorted(i for i in vecs if i % 97 == 0)
    corpus = sorted(i for i in vecs if i % 97 != 0)
    want = []
    for e in evals:
        best = None
        for c in corpus:
            a, b = vecs[e], vecs[c]
            cos = round(
                float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
            )
            if best is None or cos > best[1] or (cos == best[1] and c < best[0]):
                best = (c, cos)
        want.append((e, best[0], best[1], best[1] >= 0.4))
    assert [(a, b, round(c, 6), d) for a, b, c, d in got] == want


# ------------------------------------------------ partition-spec evolution
def test_partition_evolution_matches_pure_python():
    import duckdb
    import hashlib
    from collections import defaultdict

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf}/lineitem.parquet')"
    )
    got = con.execute(oracle_queries()["wh_partition_evolution"]).fetchall()
    rows = con.execute(
        "SELECT l_orderkey, year(l_shipdate), month(l_shipdate)"
        " FROM lineitem"
    ).fetchall()
    grid: dict = defaultdict(int)
    for key, y, m in rows:
        h = hashlib.md5(f"zonemap-{key}".encode()).hexdigest()
        old = (int(h[:2], 16)) % 64
        grid[(old, (y - 1995) * 12 + m - 1)] += 1
    per_old: dict = defaultdict(list)
    for (old, _new), cnt in grid.items():
        per_old[old].append(cnt)
    want = sorted(
        (old, sum(cs), len(cs), 1_000_000 * max(cs) // sum(cs),
         sum(cs) - max(cs))
        for old, cs in per_old.items()
    )
    assert got == want
    assert sum(r[1] for r in got) == len(rows)  # rows conserved


# ------------------------------------------------------ ICO container codec
def test_ico_roundtrip_and_largest_entry():
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_ico,
        encode_ico,
        parse_ico_dir,
    )

    def fn(x, y):
        return ((x * 2 + y) % 256, (x + 3 * y) % 256, (5 * x) % 256)

    payload = encode_ico([("bmp", 4, 3, fn), ("bmp", 7, 5, fn)])
    entries = parse_ico_dir(payload)
    assert [(w, h) for w, h, *_ in entries] == [(4, 3), (7, 5)]
    w, h, ch, arr, n, png = decode_ico(payload)
    assert (w, h, ch, n, png) == (7, 5, 3, 2, False)
    want = np.array(
        [[fn(x, y) for x in range(7)] for y in range(5)], dtype=np.uint8
    )
    assert (arr == want).all()


def test_ico_png_entry_delegates():
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_ico,
        encode_ico,
    )

    def fn(x, y):
        return ((x * 7) % 256, (y * 11) % 256, (x + y) % 256)

    payload = encode_ico([("bmp", 3, 3, fn), ("png", 6, 4, fn)])
    w, h, _ch, arr, n, png = decode_ico(payload)
    assert (w, h, n, png) == (6, 4, 2, True)
    want = np.array(
        [[fn(x, y) for x in range(6)] for y in range(4)], dtype=np.uint8
    )
    assert (arr == want).all()


def test_ico_error_contracts_and_dispatch():
    import pytest as _pytest

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_ico,
        decode_image,
        encode_ico,
    )

    def fn(x, y):
        return (x % 256, y % 256, 0)

    good = encode_ico([("bmp", 4, 4, fn)])
    # container-level dispatch on the 00 00 01 00 magic
    w, h, arr = decode_image(good)
    assert (w, h) == (4, 4)
    with _pytest.raises(ValueError, match="truncated ICO header"):
        decode_ico(good[:4])
    with _pytest.raises(ValueError, match="not an ICO payload"):
        decode_ico(b"\x00\x00\x02\x00" + good[4:])  # type 2 = cursor
    with _pytest.raises(ValueError, match="overruns the payload"):
        decode_ico(good[:-10])


# -------------------------------------------------------- stereo downmix
def test_downmix_floor_semantics_on_odd_sums():
    """(L + R) >> 1 must FLOOR like Python // — pinned on negative odd
    sums where truncating division would differ."""
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        downmix_stereo,
        encode_stereo_wav,
    )

    left = np.array([-3, -1, 1, 3, 32767, -32768], dtype="<i2")
    right = np.array([0, 0, 0, 0, 32767, -32768], dtype="<i2")
    rate, mono = downmix_stereo(encode_stereo_wav(left, right, 8000))
    want = [(int(l) + int(r)) // 2 for l, r in zip(left, right)]
    assert rate == 8000 and mono.tolist() == want


def test_stereo_wav_error_contracts():
    import numpy as np
    import pytest as _pytest

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_stereo_wav,
        encode_stereo_wav,
        encode_wav,
    )

    good = encode_stereo_wav(
        np.arange(8, dtype="<i2"), np.arange(8, dtype="<i2"), 8000
    )
    with _pytest.raises(ValueError, match="truncated data chunk"):
        decode_stereo_wav(good[:-4])
    mono = encode_wav(np.arange(8, dtype="<i2"), 8000)
    with _pytest.raises(ValueError, match="expected stereo"):
        decode_stereo_wav(mono)


# ------------------------------------------------- dispersion index
def test_dispersion_index_matches_pure_python():
    import duckdb
    from collections import defaultdict

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    got = con.execute(oracle_queries()["ts_dispersion_index"]).fetchall()
    rows = con.execute(
        "SELECT event_type, epoch(date_trunc('minute', ts)) // 60"
        " FROM events"
    ).fetchall()
    counts: dict = defaultdict(lambda: defaultdict(int))
    mns, mxs = [], []
    for et, m in rows:
        counts[et][m] += 1
        mns.append(m)
        mxs.append(m)
    nb = max(mxs) - min(mns) + 1
    want = []
    for et in sorted(counts):
        cs = counts[et].values()
        s, q, ne = sum(cs), sum(c * c for c in cs), len(cs)
        want.append(
            (
                et, s, ne, nb,
                1000 * s // nb,
                1_000_000 * ne // nb,
                1_000_000 * (nb * q - s * s) // (nb * s),
            )
        )
    assert got == want
    # a (near-)Poisson synthetic stream must sit near fano = 1e6; a
    # wildly different value means the grid or the moments are wrong
    for r in got:
        assert 10_000 < r[6] < 10_000_000


# ------------------------------------------------- SFT chat template
def test_sft_format_matches_pure_python():
    import duckdb
    import hashlib
    import re
    from collections import defaultdict

    from dblab_ece_trino_spark.operators.llmprep import (
        SFT_PROMPT_WORDS,
        SFT_RESP_CAP,
    )
    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    got = con.execute(oracle_queries()["llm_sft_format"]).fetchall()
    rows = con.execute("SELECT source, text FROM documents").fetchall()
    agg: dict = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    hexd = "0123456789abcdef"
    for src, text in rows:
        ws = re.findall(r"[a-z]+", text.lower())
        prompt = " ".join(ws[:SFT_PROMPT_WORDS])
        resp = " ".join(
            ws[SFT_PROMPT_WORDS : SFT_PROMPT_WORDS + SFT_RESP_CAP]
        )
        fmt = f"<|user|>\n{prompt}\n<|assistant|>\n{resp}<|end|>"
        h = hashlib.md5(fmt.encode()).hexdigest()
        ck = 0
        for ch in h[:6]:
            ck = ck * 16 + hexd.index(ch)
        a = agg[src]
        a[0] += 1
        a[1] += 1 if len(ws) - SFT_PROMPT_WORDS > SFT_RESP_CAP else 0
        a[2] += min(len(ws), SFT_PROMPT_WORDS)
        a[3] += min(max(len(ws) - SFT_PROMPT_WORDS, 0), SFT_RESP_CAP)
        a[4] += len(fmt)
        a[5] += ck
    want = [
        (s, a[0], a[1], a[2], a[3], a[4], a[5],
         1_000_000 * a[1] // a[0])
        for s, a in sorted(agg.items())
    ]
    assert got == want


# ------------------------------------- near-dup split-leakage audit
def test_dedup_split_audit_matches_union_find():
    import duckdb
    import hashlib
    from collections import defaultdict

    from dblab_ece_trino_spark.operators.dedup import _MINHASH_ORACLE
    from dblab_ece_trino_spark.operators.registry import oracle_queries
    from dblab_ece_trino_spark.operators.sampling import (
        DEDUP_SPLIT_EVAL_LO,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    got = con.execute(
        oracle_queries()["sample_dedup_split_audit"]
    ).fetchone()
    pairs = con.execute(_MINHASH_ORACLE).fetchall()

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, *_ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict = defaultdict(list)
    for x in parent:
        clusters[find(x)].append(x)

    def bucket(i):
        h = hashlib.md5(f"split-v1{i}".encode()).hexdigest()
        return int(h[:2], 16)

    n_span = cross = leaked = 0
    for members in clusters.values():
        tr = sum(1 for m in members if bucket(m) < DEDUP_SPLIT_EVAL_LO)
        ev = len(members) - tr
        if tr > 0 and ev > 0:
            n_span += 1
            leaked += ev
        cross += tr * ev
    want = (
        len(clusters), n_span,
        1_000_000 * n_span // len(clusters) if clusters else 0,
        cross, leaked,
    )
    assert got == want


# ------------------------------------------------- cosine histogram
def test_cosine_histogram_matches_numpy():
    import duckdb
    import hashlib
    from collections import defaultdict

    import numpy as np

    from dblab_ece_trino_spark.operators.registry import oracle_queries
    from dblab_ece_trino_spark.operators.similarity import (
        COSH_BIN,
        COSH_LEVELS,
        COSH_PANEL,
        COSH_SAMPLE_HI,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    got = con.execute(oracle_queries()["sim_cosine_histogram"]).fetchall()
    rows = con.execute(
        "SELECT vec_id, embedding::DOUBLE[] FROM embeddings"
    ).fetchall()
    ids = [i for i, _ in rows]
    vecs = {i: np.array(v, dtype=np.float64) for i, v in rows}
    mn = min(v.min() for v in vecs.values())
    mx = max(v.max() for v in vecs.values())
    mid, s = (mn + mx) / 2, (mx - mn) / COSH_LEVELS
    codes = {
        i: np.floor((v - mid) / s + 0.5).astype(np.int64)
        for i, v in vecs.items()
    }
    panel = sorted(
        ids, key=lambda i: hashlib.md5(f"cospanel{i}".encode()).hexdigest()
    )[:COSH_PANEL]
    sample = [
        i for i in ids
        if int(hashlib.md5(f"cossample{i}".encode()).hexdigest()[:2], 16)
        < COSH_SAMPLE_HI
    ]
    hist: dict = defaultdict(lambda: [0, None, None])
    for q in panel:
        for c in sample:
            if q == c:
                continue
            sab = int(codes[q] @ codes[c])
            sqq = int(codes[q] @ codes[q])
            scc = int(codes[c] @ codes[c])
            m = 10**6 * sab * sab // (sqq * scc)
            signed = -m if sab < 0 else m
            b = -(m // COSH_BIN + 1) if sab < 0 else m // COSH_BIN
            h = hist[b]
            h[0] += 1
            h[1] = signed if h[1] is None else min(h[1], signed)
            h[2] = signed if h[2] is None else max(h[2], signed)
    want = [(b, *hist[b]) for b in sorted(hist)]
    assert got == want


# --------------------------------------------- correlated subqueries
def test_correlated_subquery_matches_pure_python():
    import duckdb
    from collections import defaultdict

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("customer", "orders", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    got = con.execute(oracle_queries()["op_correlated_subquery"]).fetchall()
    cust = dict(
        con.execute("SELECT c_custkey, c_nationkey FROM customer").fetchall()
    )
    nations = dict(
        con.execute("SELECT n_nationkey, n_name FROM nation").fetchall()
    )
    spend: dict = defaultdict(int)
    has_f: set = set()
    for ck, price, status in con.execute(
        "SELECT o_custkey, CAST(round(o_totalprice * 100, 0) AS BIGINT),"
        " o_orderstatus FROM orders"
    ).fetchall():
        spend[ck] += int(price)
        if status == "F":
            has_f.add(ck)
    per_nation: dict = defaultdict(list)
    for ck, cents in spend.items():
        per_nation[cust[ck]].append((ck, cents))
    agg: dict = {}
    for nk, members in per_nation.items():
        tot = sum(c for _, c in members)
        n = len(members)
        above = [
            (ck, c) for ck, c in members
            if c * n > tot and ck in has_f
        ]
        if above:
            agg[nations[nk]] = (
                len(above), sum(c for _, c in above)
            )
    want = sorted(
        (name, n, cents) for name, (n, cents) in agg.items()
    )
    assert got == want
    assert len(got) > 0


# --------------------------------------------------- Sun AU codec
def test_au_roundtrip_all_encodings():
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        AU_PCM8,
        AU_PCM16,
        AU_ULAW,
        decode_au,
        encode_au,
        ulaw_decode_byte,
        ulaw_encode_sample,
    )

    s16 = np.array([0, 1, -1, 32124, -32124, 255, -256], dtype=np.int64)
    rate, codec, out = decode_au(encode_au(s16, 8000, AU_PCM16))
    assert (rate, codec) == (8000, "pcm16be") and (out == s16).all()

    s8 = np.array([0, 1, -1, 127, -128, 55], dtype=np.int64)
    rate, codec, out = decode_au(encode_au(s8, 11025, AU_PCM8))
    assert (rate, codec) == (11025, "pcm8") and (out == s8).all()

    # mu-law is lossy: decode must equal the table image of encode
    rate, codec, out = decode_au(encode_au(s16, 8000, AU_ULAW))
    want = [ulaw_decode_byte(ulaw_encode_sample(int(v))) for v in s16]
    assert (rate, codec) == (8000, "ulaw") and list(out) == want


def test_au_header_offset_honored():
    """A decoder that assumes data at byte 24 reads the annotation as
    samples; the offset field must be honored."""
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        AU_PCM16,
        decode_au,
        encode_au,
    )

    s = np.array([100, -200, 300], dtype=np.int64)
    long_ann = encode_au(s, 8000, AU_PCM16, annotation=b"x" * 23)
    short_ann = encode_au(s, 8000, AU_PCM16, annotation=b"")
    assert len(long_ann) != len(short_ann)
    for payload in (long_ann, short_ann):
        _, _, out = decode_au(payload)
        assert list(out) == [100, -200, 300]


def test_au_hand_built_byte_vector():
    """Hand-assembled AU payload straight from the spec: magic,
    offset 24, size 4, encoding 3 (16-bit BE), rate 8000, mono, then
    0x0102 0xFFFE -> samples [258, -2]."""
    import struct

    from dblab_ece_trino_spark.operators.multimodal import decode_au

    payload = struct.pack(
        ">4sIIIII", b".snd", 24, 4, 3, 8000, 1
    ) + bytes([0x01, 0x02, 0xFF, 0xFE])
    rate, codec, s = decode_au(payload)
    assert (rate, codec, list(s)) == (8000, "pcm16be", [258, -2])


def test_au_error_contracts():
    import struct

    import numpy as np
    import pytest as _pytest

    from dblab_ece_trino_spark.operators.multimodal import (
        AU_PCM16,
        decode_au,
        encode_au,
    )

    s = np.array([1, 2, 3], dtype=np.int64)
    good = encode_au(s, 8000, AU_PCM16)
    with _pytest.raises(ValueError, match="not a Sun AU"):
        decode_au(b"RIFF" + good[4:])
    with _pytest.raises(ValueError, match="truncated AU data"):
        decode_au(good[:-2])
    stereo = struct.pack(">4sIIIII", b".snd", 24, 4, 3, 8000, 2) + b"\0" * 4
    with _pytest.raises(ValueError, match="mono"):
        decode_au(stereo)
    bad_off = struct.pack(">4sIIIII", b".snd", 12, 4, 3, 8000, 1) + b"\0" * 4
    with _pytest.raises(ValueError, match="bad AU data offset"):
        decode_au(bad_off)


def test_au_engine_agrees_with_independent_reference():
    """Engine decoder vs scripts/gen_au_expected.py's table-arithmetic
    reference — sample-exact on every graded fixture (and the pinned
    _AU_EXPECTED literal is exactly what both produce)."""
    from dblab_ece_trino_spark.operators.multimodal import (
        _AU_EXPECTED,
        _AU_PARAMS,
        _au_signal,
        decode_au,
        encode_au,
    )
    from scripts.gen_au_expected import expected_rows, ref_decode

    assert expected_rows() == _AU_EXPECTED
    for i, (n_samp, rate, enc) in enumerate(_AU_PARAMS):
        payload = encode_au(_au_signal(i, n_samp, enc), rate, enc)
        r_e, c_e, s_e = decode_au(payload)
        r_r, c_r, s_r = ref_decode(payload)
        assert (r_e, c_e, list(s_e)) == (r_r, c_r, list(s_r))


def test_au_seam_dispatch():
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        AU_PCM16,
        decode_audio,
        encode_au,
    )

    s = np.array([5, -6, 7], dtype=np.int64)
    rate, out = decode_audio(encode_au(s, 16000, AU_PCM16))
    assert rate == 16000 and list(out) == [5, -6, 7]


# ------------------------------------------------------- XBM codec
def test_xbm_roundtrip_char_and_short():
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_xbm,
        encode_xbm,
    )

    rng_bits = (np.arange(7 * 19).reshape(7, 19) * 3 % 5 < 2).astype(
        np.uint8
    )
    for x10 in (False, True):
        w, h, out = decode_xbm(encode_xbm(rng_bits, "t", x10=x10))
        assert (w, h) == (19, 7)
        assert (out == rng_bits).all()


def test_xbm_lsb_first_and_stride():
    """Byte 0x01 lights pixel x=0 (LSB-first); a 9-px-wide row consumes
    exactly 2 bytes of stride."""
    from dblab_ece_trino_spark.operators.multimodal import decode_xbm

    src = (
        b"#define t_width 9\n#define t_height 2\n"
        b"static unsigned char t_bits[] = { 0x01, 0x01, 0x80, 0x00 };\n"
    )
    w, h, bits = decode_xbm(src)
    assert (w, h) == (9, 2)
    assert bits[0, 0] == 1 and bits[0, 8] == 1 and bits[0, 1:8].sum() == 0
    assert bits[1, 7] == 1 and bits[1].sum() == 1


def test_xbm_tolerates_comments_decimal_and_whitespace():
    from dblab_ece_trino_spark.operators.multimodal import decode_xbm

    src = (
        b"/* a real-world header comment\n   spanning lines */\n"
        b"#define weird_name_width 4\n"
        b"#define weird_name_height 1\n"
        b"static unsigned char weird_name_bits[] = {\n"
        b"   15 };\n"
    )
    w, h, bits = decode_xbm(src)
    assert (w, h) == (4, 1) and bits.sum() == 4


def test_xbm_error_contracts():
    import pytest as _pytest

    from dblab_ece_trino_spark.operators.multimodal import decode_xbm

    with _pytest.raises(ValueError, match="missing width/height"):
        decode_xbm(b"static unsigned char t_bits[] = {0x00};")
    with _pytest.raises(ValueError, match="missing bits array"):
        decode_xbm(b"#define t_width 8\n#define t_height 1\n")
    with _pytest.raises(ValueError, match="need 2 bytes"):
        decode_xbm(
            b"#define t_width 8\n#define t_height 2\n"
            b"static unsigned char t_bits[] = {0x00};"
        )


def test_xbm_seam_dispatch_grayscale():
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_image,
        encode_xbm,
    )

    bits = np.array([[1, 0], [0, 1]], dtype=np.uint8)
    w, h, arr = decode_image(encode_xbm(bits, "s"))
    assert (w, h) == (2, 2)
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 255, 255]
    assert arr[0, 1].tolist() == [0, 0, 0]


# ------------------------------------------------------ AIFF codec
def test_extended80_roundtrip_rates():
    from dblab_ece_trino_spark.operators.multimodal import (
        _decode_extended80,
        _encode_extended80,
    )

    for rate in (1, 8000, 11025, 22050, 44100, 48000, 96000, 192000, 3):
        assert _decode_extended80(_encode_extended80(rate)) == rate


def test_extended80_hand_vector():
    """44100 = 0x  400E  AC44000000000000 — the canonical CD-rate
    vector every AIFF reference prints."""
    from dblab_ece_trino_spark.operators.multimodal import (
        _decode_extended80,
        _encode_extended80,
    )

    enc = _encode_extended80(44100)
    assert enc.hex() == "400eac44000000000000"
    assert _decode_extended80(bytes.fromhex("400eac44000000000000")) == 44100


def test_aiff_roundtrip_offset_and_chunk_order():
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_aiff,
        encode_aiff,
    )

    s = np.array([0, 500, -500, 32767, -32768, 7], dtype=np.int64)
    for off in (0, 4):
        for cf in (True, False):
            rate, out = decode_aiff(
                encode_aiff(s, 22050, ssnd_offset=off, comm_first=cf)
            )
            assert rate == 22050 and (out == s).all()


def test_aiff_error_contracts():
    import numpy as np
    import pytest as _pytest

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_aiff,
        encode_aiff,
    )

    s = np.array([1, 2, 3], dtype=np.int64)
    good = encode_aiff(s, 8000)
    with _pytest.raises(ValueError, match="not a FORM/AIFF"):
        decode_aiff(b"RIFF" + good[4:])
    with _pytest.raises(ValueError, match="truncated AIFF chunk"):
        decode_aiff(good[:-2])
    with _pytest.raises(ValueError, match="missing COMM or SSND"):
        decode_aiff(good[:12])


def test_aiff_seam_dispatch():
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        decode_audio,
        encode_aiff,
    )

    s = np.array([9, -8, 7], dtype=np.int64)
    rate, out = decode_audio(encode_aiff(s, 11025))
    assert rate == 11025 and list(out) == [9, -8, 7]


# ------------------------------------------- source vocabulary overlap
def test_source_jaccard_matches_pure_python():
    import duckdb
    import re
    from collections import defaultdict
    from itertools import combinations

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    got = con.execute(oracle_queries()["text_source_jaccard"]).fetchall()
    vocab: dict = defaultdict(set)
    for src, text in con.execute(
        "SELECT source, text FROM documents"
    ).fetchall():
        vocab[src].update(re.findall(r"[a-z]+", text.lower()))
    want = []
    for a, b in combinations(sorted(vocab), 2):
        inter = len(vocab[a] & vocab[b])
        union = len(vocab[a] | vocab[b])
        want.append((a, b, inter, union, 1_000_000 * inter // union))
    want.sort()
    assert got == want
    # the synthetic corpus shares one global vocabulary — overlap must
    # be high; a tokenization bug collapses it loudly
    assert all(r[4] > 100_000 for r in got)


# --------------------------------------------- matryoshka truncation
def test_matryoshka_recall_matches_numpy():
    import duckdb

    import numpy as np

    from dblab_ece_trino_spark.operators.registry import oracle_queries
    from dblab_ece_trino_spark.operators.similarity import (
        MRL_K,
        MRL_PREFIXES,
        MRL_QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    got = con.execute(oracle_queries()["sim_matryoshka_recall"]).fetchall()
    rows = con.execute(
        "SELECT vec_id, embedding::DOUBLE[] FROM embeddings"
    ).fetchall()
    vecs = {i: np.array(v) for i, v in rows}
    mn = min(v.min() for v in vecs.values())
    mx = max(v.max() for v in vecs.values())
    mid, s = (mn + mx) / 2, (mx - mn) / 255
    codes = {i: np.floor((v - mid) / s + 0.5).astype(np.int64)
             for i, v in vecs.items()}
    topk = {}
    for p in MRL_PREFIXES:
        for q in range(MRL_QUERIES):
            scored = sorted(
                ((int(codes[q][:p] @ codes[c][:p]), c)
                 for c in codes if c != q),
                key=lambda t: (-t[0], t[1]),
            )[:MRL_K]
            topk[(p, q)] = {c for _, c in scored}
    want = []
    for p in MRL_PREFIXES:
        hits = sum(
            len(topk[(p, q)] & topk[(64, q)]) for q in range(MRL_QUERIES)
        )
        retrieved = MRL_K * MRL_QUERIES
        want.append((p, MRL_QUERIES, retrieved, hits,
                     1_000_000 * hits // retrieved))
    assert got == want
    # recall at the full prefix is exactly 1.0 by construction, and
    # recall must not decrease from 32 to 64 dims
    by_p = {r[0]: r[4] for r in got}
    assert by_p[64] == 1_000_000
    assert by_p[32] <= by_p[64]
