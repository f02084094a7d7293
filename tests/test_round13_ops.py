"""Round-13 operator tests: FLAC codec (19th native format) and the
round's new graded entries.  Pure-Python re-derivations — the Spark
fixture queries themselves are covered by tests/test_correctness.py's
registry sweep against the DuckDB oracles."""
from __future__ import annotations

import numpy as np
import pytest

# ------------------------------------------------------ FLAC codec


def test_flac_crc_catalog_vectors():
    """The two standard catalog check values: CRC-8 (poly 0x07) of
    b"123456789" is 0xF4; CRC-16/UMTS (poly 0x8005, init 0) is
    0xFEE8 — the exact polynomials the FLAC spec mandates."""
    from dblab_ece_trino_spark.operators.multimodal import (
        _crc8_flac,
        _crc16_flac,
    )

    assert _crc8_flac(b"123456789") == 0xF4
    assert _crc16_flac(b"123456789") == 0xFEE8
    assert _crc8_flac(b"") == 0
    assert _crc16_flac(b"") == 0


def test_flac_crc_table_vs_bitwise():
    """Engine bitwise CRCs == reference table-driven CRCs byte-for-byte
    (two independent constructions of the same polynomials)."""
    from scripts.gen_flac_expected import crc8, crc16

    from dblab_ece_trino_spark.operators.multimodal import (
        _crc8_flac,
        _crc16_flac,
    )

    rng = np.random.RandomState(3)
    for n in (1, 7, 64, 257):
        data = bytes(rng.randint(0, 256, n).tolist())
        assert _crc8_flac(data) == crc8(data)
        assert _crc16_flac(data) == crc16(data)


def test_flac_coded_number_vectors():
    """FLAC's extended UTF-8 coded number: the 1-byte boundary, the
    canonical 2-byte UTF-8 vector (128 -> C2 80), and the 36-bit
    7-byte ceiling."""
    from dblab_ece_trino_spark.operators.multimodal import (
        _FlacBitReader,
        _flac_coded_number_encode,
        _flac_coded_number_read,
    )

    assert _flac_coded_number_encode(0) == b"\x00"
    assert _flac_coded_number_encode(0x7F) == b"\x7f"
    assert _flac_coded_number_encode(128) == b"\xc2\x80"
    assert _flac_coded_number_encode(0x7FF) == b"\xdf\xbf"
    top = (1 << 36) - 1
    enc = _flac_coded_number_encode(top)
    assert len(enc) == 7 and enc[0] == 0xFE
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, top):
        rd = _FlacBitReader(_flac_coded_number_encode(v))
        assert _flac_coded_number_read(rd) == v
    with pytest.raises(ValueError, match="36 bits"):
        _flac_coded_number_encode(1 << 36)


def test_flac_rice_zigzag():
    from dblab_ece_trino_spark.operators.multimodal import (
        _flac_unzigzag,
        _flac_zigzag,
    )

    # 0,-1,1,-2,2,... is the canonical zigzag order
    assert [_flac_zigzag(v) for v in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]
    for v in range(-40, 40):
        assert _flac_unzigzag(_flac_zigzag(v)) == v


def test_flac_roundtrip_modes_grid():
    """Every subframe family x partition order x rice flavor x escape
    round-trips bit-exactly."""
    from dblab_ece_trino_spark.operators.multimodal import (
        decode_flac,
        encode_flac,
    )

    for mode in ("constant", "verbatim", "fixed0", "fixed1", "fixed2",
                 "fixed3", "fixed4", "lpc2"):
        for po in (0, 2):
            for rice2 in (False, True):
                for esc in (False, True):
                    if mode == "constant":
                        s = np.full(64, -123, dtype=np.int64)
                    else:
                        s = (np.arange(64) * 37 % 2200 - 1100).astype(
                            np.int64
                        )
                    p = encode_flac(
                        s, 44100, block_size=32, mode=mode,
                        partition_order=po, rice2=rice2, escape=esc,
                    )
                    rate, out = decode_flac(p)
                    assert rate == 44100 and (out == s).all()


def test_flac_header_field_variants():
    """Explicit 8-bit block-size field, kHz/Hz/daHz sample-rate fields,
    metadata-block skipping, wasted bits, and the short tail frame."""
    from dblab_ece_trino_spark.operators.multimodal import (
        decode_flac,
        encode_flac,
    )

    s = (np.arange(70) * 41 % 2400 - 1200).astype(np.int64)
    cases = [
        (8000, dict(bs8=True)),
        (16000, dict(rate_in_frame="khz8")),
        (22050, dict(rate_in_frame="hz16")),
        (44100, dict(rate_in_frame="dahz16")),
        (8000, dict(pad_block=True)),
    ]
    for rate, kw in cases:
        r, out = decode_flac(
            encode_flac(s, rate, block_size=32, mode="fixed2", **kw)
        )
        assert r == rate and (out == s).all()
    s4 = s * 4  # every sample has two zero low bits
    r, out = decode_flac(
        encode_flac(
            np.clip(s4, -32768, 32764), 32000, block_size=32,
            mode="fixed3", wasted=2,
        )
    )
    assert (out == np.clip(s4, -32768, 32764)).all()


def test_flac_stereo_decorrelation():
    """All four channel assignments reconstruct L/R exactly, pinning
    the bps+1 side-channel width."""
    from dblab_ece_trino_spark.operators.multimodal import (
        decode_flac_full,
        encode_flac_stereo,
    )

    l = (np.arange(50) * 29 % 1600 - 800).astype(np.int64)
    r = (np.arange(50) * 13 % 900 - 450).astype(np.int64)
    # include odd mid/side rounding: l+r odd at many positions
    for assign in ("independent", "left_side", "right_side", "mid_side"):
        rate, nch, arr = decode_flac_full(
            encode_flac_stereo(l, r, 48000, assign)
        )
        assert rate == 48000 and nch == 2
        assert (arr[:, 0] == l).all() and (arr[:, 1] == r).all()


def test_flac_engine_matches_independent_reference():
    """Engine decoder vs scripts/gen_flac_expected.py's bit-string
    reference decoder on every graded fixture (the gen-script
    re-derivation contract every codec here carries)."""
    from scripts.gen_flac_expected import ref_decode

    from dblab_ece_trino_spark.operators.multimodal import (
        _FLAC_PARAMS,
        decode_flac_full,
        encode_flac,
    )

    for n, rate, bs, mode, po, step, amp, kw in _FLAC_PARAMS:
        k = np.arange(n, dtype="int64")
        s = (k * step) % (2 * amp) - amp
        p = encode_flac(
            s, rate, block_size=bs, mode=mode, partition_order=po, **kw
        )
        r1, chans = ref_decode(p)
        r2, nc, arr = decode_flac_full(p)
        assert r1 == r2 == rate and nc == 1
        assert chans[0] == list(arr[:, 0]) == list(s)


def test_flac_fuzz_roundtrip():
    rng = np.random.RandomState(11)
    from dblab_ece_trino_spark.operators.multimodal import (
        decode_flac,
        encode_flac,
    )

    for t in range(400):
        n = int(rng.randint(1, 150))
        s = rng.randint(-32768, 32768, n).astype(np.int64)
        mode = ("verbatim", "fixed1", "fixed2", "fixed3", "fixed4",
                "lpc2")[t % 6]
        p = encode_flac(
            s, 44100, block_size=(16, 32, 64)[t % 3], mode=mode,
            partition_order=t % 3, rice2=bool(t % 2),
            escape=bool(t % 5 == 0),
        )
        rate, out = decode_flac(p)
        assert (out == s).all()


def test_flac_error_contracts():
    from dblab_ece_trino_spark.operators.multimodal import (
        decode_flac,
        decode_flac_full,
        encode_flac,
        encode_flac_stereo,
    )

    s = (np.arange(40) * 33 % 1000 - 500).astype(np.int64)
    good = encode_flac(s, 8000, block_size=32)
    with pytest.raises(ValueError, match="not a FLAC payload"):
        decode_flac(b"fLaX" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_flac(good[:-4])
    # flip a residual bit -> frame CRC-16 must catch it
    bad = bytearray(good)
    bad[-10] ^= 0x04
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # corrupt the frame header -> CRC-8 (or sync) must catch it
    hdr_pos = 4 + 4 + 34  # magic + STREAMINFO block
    bad2 = bytearray(good)
    bad2[hdr_pos + 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(bad2))
    with pytest.raises(ValueError, match="out of int16 range"):
        encode_flac(np.array([40000], dtype=np.int64), 8000)
    with pytest.raises(ValueError, match="expected mono"):
        decode_flac(encode_flac_stereo(s, s, 8000, "independent"))
    # STREAMINFO total-sample cross-check
    with pytest.raises(ValueError, match="frames carry"):
        tampered = bytearray(good)
        # STREAMINFO body: 2+2+3+3 size bytes, then rate/ch/bps/total
        # pack into body bytes 10..17 — byte 17 is the low byte of the
        # 36-bit total-samples field
        tampered[4 + 4 + 17] ^= 0x01
        decode_flac_full(bytes(tampered))


def test_flac_nonzero_padding_rejected():
    """Frame padding bits are spec-required zero (RFC 9639 §9.1.5);
    a nonzero-padded frame must be rejected even when its CRC-16 is
    valid (CRC is recomputed after the flip, so only the padding
    check can catch it)."""
    from dblab_ece_trino_spark.operators.multimodal import (
        _crc16_flac,
        _FlacBitReader,
        decode_flac,
        encode_flac,
    )

    s = (np.arange(40) * 33 % 1000 - 500).astype(np.int64)
    p = encode_flac(s, 8000, block_size=64, mode="fixed2")
    # single frame at offset 42 (magic 4 + block header 4 + STREAMINFO
    # 34); last 2 bytes are the frame CRC-16.  fixed2 Rice residuals
    # leave this frame bit-unaligned, so the last body byte carries
    # padding bits — flip the lowest one and RE-SIGN the CRC.
    body = bytearray(p[42:-2])
    body[-1] ^= 0x01
    crc = _crc16_flac(bytes(body))
    bad = p[:42] + bytes(body) + bytes([crc >> 8, crc & 0xFF])
    with pytest.raises(ValueError, match="padding"):
        decode_flac(bad)
    # unit level: reader.align() is the enforcement point
    br = _FlacBitReader(bytes([0b10100001]))
    assert br.read(3) == 0b101
    with pytest.raises(ValueError, match="padding"):
        br.align()
    br2 = _FlacBitReader(bytes([0b10100000]))
    assert br2.read(3) == 0b101
    br2.align()  # zero padding accepted


def test_flac_seam_dispatch():
    """decode_audio routes fLaC-magic payloads natively."""
    from dblab_ece_trino_spark.operators.multimodal import (
        decode_audio,
        encode_flac,
    )

    s = (np.arange(30) * 21 % 800 - 400).astype(np.int64)
    rate, out = decode_audio(encode_flac(s, 11025, block_size=16))
    assert rate == 11025 and (np.asarray(out) == s).all()


def test_flac_compression_is_real():
    """Fixed-predictor rice coding actually compresses the sawtooth
    (sanity that the rice path isn't a verbatim disguise)."""
    from dblab_ece_trino_spark.operators.multimodal import encode_flac

    s = (np.arange(4096) * 13 % 2000 - 1000).astype(np.int64)
    fixed = encode_flac(s, 44100, block_size=256, mode="fixed2",
                        partition_order=2)
    verb = encode_flac(s, 44100, block_size=256, mode="verbatim")
    assert len(fixed) < len(verb) / 2


# --------------------------------------- fused fuzzy-dedup pipeline


def test_dedup_corpus_pure_python():
    """pipeline_dedup_corpus oracle re-derived WITHOUT Spark or the
    recursive CTE: union-find over the exact-verified Jaccard pairs,
    the keep rule, then a per-source rollup in plain Python."""
    import duckdb

    from dblab_ece_trino_spark.operators.dedup import (
        _DEDUP_CORPUS_ORACLE,
        _MINHASH_ORACLE,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    pairs = con.execute(_MINHASH_ORACLE).fetchall()
    docs = con.execute(
        "SELECT doc_id, source, n_chars FROM documents"
    ).fetchall()
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
    chars = {d: c for d, _s, c in docs}
    keepers = {
        min(ms, key=lambda m: (-chars[m], m)) for ms in comp.values()
    }
    clustered = set(parent)
    agg: dict = {}
    for doc_id, source, n_chars in docs:
        n, cl, rm, kp, kc = agg.setdefault(source, [0, 0, 0, 0, 0])
        kept = doc_id not in clustered or doc_id in keepers
        agg[source] = [
            n + 1, cl + (doc_id in clustered), rm + (not kept),
            kp + kept, kc + (n_chars if kept else 0),
        ]
    want = sorted((s, *v) for s, v in agg.items())
    got = sorted(
        tuple(r) for r in con.execute(_DEDUP_CORPUS_ORACLE).fetchall()
    )
    assert got == want
    # family reconciliations: per-source counts add up, and removals
    # across sources equal the cluster ledger's removed_docs total
    for _s, n_docs, _cl, n_removed, n_kept, _kc in got:
        assert n_kept + n_removed == n_docs
    total_removed = sum(r[3] for r in got)
    assert total_removed == sum(len(ms) - 1 for ms in comp.values())


def test_dedup_corpus_reconciles_with_cluster_keep():
    """The fused pipeline's removal total equals the sum of the
    dedup_cluster_keep ledger's removed_docs (the two entries must
    tell one story)."""
    import duckdb

    from dblab_ece_trino_spark.operators.dedup import (
        _CLUSTER_KEEP_ORACLE,
        _DEDUP_CORPUS_ORACLE,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    ledger = con.execute(_CLUSTER_KEEP_ORACLE).fetchall()
    summary = con.execute(_DEDUP_CORPUS_ORACLE).fetchall()
    assert sum(r[4] for r in ledger) == sum(r[3] for r in summary)
    assert sum(r[1] for r in ledger) == sum(r[2] for r in summary)


# --------------------------- per-prefix quantization calibration


def test_matryoshka_quant_numpy_rederivation():
    """sim_matryoshka_quant oracle vs an independent numpy evaluator
    at sf0.001, plus the profile's structural invariants."""
    import duckdb
    import numpy as np

    from dblab_ece_trino_spark.operators.similarity import (
        MRL_PREFIXES,
        MRLQ_LEVELS,
        MRLQ_RATIO,
        _matryoshka_quant_oracle,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    vecs = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT embedding FROM embeddings ORDER BY vec_id"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    mn, mx = vecs.min(), vecs.max()
    s = (mx - mn) / MRLQ_LEVELS
    q = np.floor((vecs - mn) / s + 0.5).astype(np.int64)
    qc = np.floor((vecs - mn) / (s * MRLQ_RATIO) + 0.5).astype(np.int64)
    e = q - MRLQ_RATIO * qc
    want = []
    for p in MRL_PREFIXES:
        ep = e[:, :p]
        want.append(
            (p, int(np.abs(ep).sum()), int((ep * ep).sum()),
             int(np.abs(ep).max()))
        )
    got = [tuple(r) for r in con.execute(_matryoshka_quant_oracle()).fetchall()]
    assert got == want
    # structure: sums are non-decreasing in the prefix, max |e| bounded
    # by half the coarse step (+1 for the floor(+0.5) midpoint)
    for (p1, a1, s1, m1), (p2, a2, s2, m2) in zip(got, got[1:]):
        assert p1 < p2 and a1 <= a2 and s1 <= s2 and m1 <= m2
    assert got[-1][3] <= MRLQ_RATIO // 2 + 1


# ------------------------------------------------ round-13 batch 2
SF = "/root/testdata/sf0.001"


def _con(*tables):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _oracle(name):
    from dblab_ece_trino_spark.operators.registry import oracle_queries

    return oracle_queries()[name]


def test_turning_points_pure_python():
    con = _con("events")
    daily = con.execute(
        "SELECT event_type, CAST(ts AS DATE) d, "
        "CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) c "
        "FROM events GROUP BY 1,2 ORDER BY 1,2"
    ).fetchall()
    series: dict = {}
    for et, _d, c in daily:
        series.setdefault(et, []).append(c)
    want = []
    for et in sorted(series):
        v = series[et]
        interior = max(len(v) - 2, 0)
        peaks = sum(
            1 for i in range(1, len(v) - 1) if v[i] > v[i-1] and v[i] > v[i+1]
        )
        troughs = sum(
            1 for i in range(1, len(v) - 1) if v[i] < v[i-1] and v[i] < v[i+1]
        )
        import math
        ppm = (
            math.floor(1e6 * (peaks + troughs) / interior)
            if interior else None
        )
        want.append((et, len(v), peaks, troughs, ppm))
    got = con.execute(_oracle("ts_turning_points")).fetchall()
    assert [tuple(r) for r in got] == want
    for _et, _n, p, t, ppm in got:
        if ppm is not None:
            assert 0 <= ppm <= 1000000 and p + t >= 0


def test_degree_tail_pure_python():
    con = _con("lineitem")
    from dblab_ece_trino_spark.operators.graph import (
        _PAIRS_CTE,
        DEG_TAIL_MAX_J,
    )

    deg: dict = {}
    for u, v in con.execute(
        f"WITH {_PAIRS_CTE} SELECT u, v FROM pairs"
    ).fetchall():
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    want = []
    for j in range(DEG_TAIL_MAX_J + 1):
        thr = 1 << j
        ks = [k for k in deg.values() if k >= thr]
        if ks:
            want.append((j, thr, len(ks), sum(ks), max(ks)))
    got = [tuple(r) for r in con.execute(_oracle("graph_degree_tail")).fetchall()]
    assert got == want
    # survival counts are non-increasing in j
    for (j1, _t1, n1, s1, _m1), (j2, _t2, n2, s2, _m2) in zip(got, got[1:]):
        assert j2 == j1 + 1 and n2 <= n1 and s2 <= s1


def test_reciprocity_pure_python():
    con = _con("events")
    import math

    seq = con.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    w: dict = {}
    prev_u, prev_t = None, None
    for u, t in seq:
        if u == prev_u and prev_t is not None and prev_t != t:
            w[(prev_t, t)] = w.get((prev_t, t), 0) + 1
        prev_u, prev_t = u, t
    agg: dict = {}
    for (a, b), cnt in w.items():
        rev = w.get((b, a), 0)
        n, out, rec = agg.setdefault(a, [0, 0, 0])
        agg[a] = [n + 1, out + cnt, rec + min(cnt, rev)]
    want = [
        (a, n, out, rec, math.floor(1e6 * rec / out))
        for a, (n, out, rec) in sorted(agg.items())
    ]
    got = [tuple(r) for r in con.execute(_oracle("graph_reciprocity")).fetchall()]
    assert got == want
    for _a, _n, out, rec, ppm in got:
        assert 0 <= rec <= out and 0 <= ppm <= 1000000


def test_heaps_law_pure_python():
    import re as _re

    con = _con("documents")
    from dblab_ece_trino_spark.operators.text import HEAPS_CKPTS

    docs = con.execute(
        "SELECT source, doc_id, lower(text) FROM documents ORDER BY doc_id"
    ).fetchall()
    by_src: dict = {}
    for s, d, t in docs:
        by_src.setdefault(s, []).append((d, _re.findall("[a-z]+", t)))
    want = []
    for s in sorted(by_src):
        rows = by_src[s]
        ids = [d for d, _w in rows]
        mn, mx = min(ids), max(ids)
        for k in range(1, HEAPS_CKPTS + 1):
            thr = mn + (mx - mn) * k // HEAPS_CKPTS
            seen = [(d, ws) for d, ws in rows if d <= thr]
            vocab = set()
            for _d, ws in seen:
                vocab.update(ws)
            want.append(
                (s, k, len(seen), sum(len(ws) for ws, in [(ws,) for _d, ws in seen]),
                 len(vocab))
            )
    got = [tuple(r) for r in con.execute(_oracle("text_heaps_law")).fetchall()]
    assert got == want
    # growth curves are monotone in the checkpoint
    for (s1, k1, d1, t1, v1), (s2, k2, d2, t2, v2) in zip(got, got[1:]):
        if s1 == s2:
            assert d2 >= d1 and t2 >= t1 and v2 >= v1 and v2 <= t2


def test_gaps_islands_pure_python():
    con = _con("orders")
    days = con.execute(
        "SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) FROM orders "
        "ORDER BY 1, 2"
    ).fetchall()
    by_c: dict = {}
    for c, d in days:
        by_c.setdefault(c, []).append(d)
    hist: dict = {}
    custs: dict = {}
    for c, ds in by_c.items():
        run = 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                run += 1
            else:
                hist[run] = hist.get(run, 0) + 1
                custs.setdefault(run, set()).add(c)
                run = 1
        hist[run] = hist.get(run, 0) + 1
        custs.setdefault(run, set()).add(c)
    want = sorted((ln, n, len(custs[ln])) for ln, n in hist.items())
    got = [tuple(r) for r in con.execute(_oracle("op_gaps_islands")).fetchall()]
    assert got == want


def test_lateral_subquery_pure_python():
    con = _con("customer", "orders")
    orders = con.execute(
        "SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
        "WHERE o_custkey < 100"
    ).fetchall()
    by_c: dict = {}
    for c, k, p in orders:
        by_c.setdefault(c, []).append((k, p))
    want = []
    custs = {
        r[0] for r in con.execute(
            "SELECT c_custkey FROM customer WHERE c_custkey < 100"
        ).fetchall()
    }
    for c in sorted(custs):
        top = sorted(by_c.get(c, []), key=lambda kp: (-kp[1], kp[0]))[:2]
        for k, p in top:
            want.append((c, k, round(p * 100)))
    want.sort(key=lambda r: (r[0], -r[2], r[1]))
    got = [tuple(r) for r in con.execute(_oracle("op_lateral_subquery")).fetchall()]
    assert got == want


def test_time_decay_pure_python():
    import hashlib
    import math

    con = _con("events")
    from dblab_ece_trino_spark.operators.sampling import DECAY_TIERS

    rows = con.execute(
        "SELECT event_id, CAST(ts AS DATE), "
        "(SELECT CAST(max(ts) AS DATE) FROM events) FROM events"
    ).fetchall()
    agg: dict = {}
    for eid, d, mx in rows:
        age = (mx - d).days
        for i, (ub, lim) in enumerate(DECAY_TIERS):
            if age < ub:
                tier, limit = i, lim
                break
        h = hashlib.md5(f"decay-v1{eid}".encode()).hexdigest()
        bucket = int(h[:2], 16)
        n, kept = agg.setdefault((tier, limit), [0, 0])
        agg[(tier, limit)] = [n + 1, kept + (bucket < limit)]
    want = sorted(
        (t, lim * 1000000 // 256, n, kept, math.floor(1e6 * kept / n))
        for (t, lim), (n, kept) in agg.items()
    )
    got = [tuple(r) for r in con.execute(_oracle("sample_time_decay")).fetchall()]
    assert got == want
    assert len(got) == len(DECAY_TIERS)  # every tier populated


def test_loss_mask_pure_python():
    import math
    import re as _re

    con = _con("documents")
    from dblab_ece_trino_spark.operators.llmprep import (
        SFT_CTRL_TOKENS,
        SFT_CTX,
        SFT_PROMPT_WORDS,
        SFT_RESP_CAP,
    )

    docs = con.execute("SELECT source, lower(text) FROM documents").fetchall()
    agg: dict = {}
    for s, t in docs:
        n = len(_re.findall("[a-z]+", t))
        p = min(n, SFT_PROMPT_WORDS) + SFT_CTRL_TOKENS
        c = min(max(n - SFT_PROMPT_WORDS, 0), SFT_RESP_CAP)
        row = agg.setdefault(s, [0, 0, 0, 0])
        agg[s] = [row[0] + 1, row[1] + p, row[2] + c,
                  row[3] + (SFT_CTX - p - c)]
    want = [
        (s, n, m, tr, pd, math.floor(1e6 * tr / (SFT_CTX * n)))
        for s, (n, m, tr, pd) in sorted(agg.items())
    ]
    got = [tuple(r) for r in con.execute(_oracle("llm_loss_mask_stats")).fetchall()]
    assert got == want
    for _s, n, m, tr, pd, ppm in got:
        assert m + tr + pd == SFT_CTX * n  # the ledger balances
        assert 0 <= ppm <= 1000000


def test_retention_policy_pure_python():
    import datetime

    con = _con("orders")
    days = sorted(
        r[0] for r in con.execute(
            "SELECT DISTINCT CAST(o_orderdate AS DATE) FROM orders"
        ).fetchall()
    )
    mx = max(days)
    anchor = datetime.date(2098, 1, 1)
    desc = {d: i + 1 for i, d in enumerate(sorted(days, reverse=True))}
    by_wk: dict = {}
    by_mo: dict = {}
    for d in days:
        by_wk.setdefault((anchor - d).days // 7, []).append(d)
        by_mo.setdefault(d.year * 100 + d.month, []).append(d)
    wk_keep = {max(v) for v in by_wk.values()}
    mo_keep = {max(v) for v in by_mo.values()}
    agg: dict = {}
    for d in days:
        mo = d.year * 100 + d.month
        kl = desc[d] <= 7
        kw = d in wk_keep and (mx - d).days < 28
        km = d in mo_keep
        row = agg.setdefault(mo, [0, 0, 0, 0, 0, 0])
        agg[mo] = [row[0] + 1, row[1] + (kl or kw or km),
                   row[2] + (not (kl or kw or km)), row[3] + kl,
                   row[4] + kw, row[5] + km]
    want = [(mo, *v) for mo, v in sorted(agg.items())]
    got = [tuple(r) for r in con.execute(_oracle("wh_retention_policy")).fetchall()]
    assert got == want
    # the policy always keeps at least one snapshot per month
    for _mo, n, kept, expired, _kl, _kw, km in got:
        assert kept + expired == n and km >= 1 and kept >= 1


def test_theta_sketch_pure_python():
    """op_theta_sketch oracle vs an independent hashlib evaluator at
    sf0.001, plus the estimator's structural bounds."""
    import hashlib

    con = _con("events")
    from dblab_ece_trino_spark.operators.sketches import (
        THETA_DIGITS,
        THETA_K,
        THETA_SPACE,
    )

    du = con.execute(
        "SELECT DISTINCT event_type, user_id FROM events"
    ).fetchall()
    by_t: dict = {}
    for t, u in du:
        h = int(
            hashlib.md5(f"theta-v1{u}".encode()).hexdigest()[:THETA_DIGITS],
            16,
        )
        by_t.setdefault(t, []).append((h, u))
    samples = {
        t: sorted(v)[:THETA_K] for t, v in by_t.items()
    }
    # exact mode: a sketch that never filled K slots keeps theta at
    # the full hash space (DataSketches convention)
    thetas = {
        t: (max(h for h, _u in s) if len(s) >= THETA_K else THETA_SPACE)
        for t, s in samples.items()
    }
    want = []
    types = sorted(samples)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            theta = min(thetas[a], thetas[b])
            ua = {u for h, u in samples[a] if h < theta}
            ub = {u for h, u in samples[b] if h < theta}
            n = len(ua & ub)
            true = len({u for _h, u in by_t[a]} & {u for _h, u in by_t[b]})
            want.append((a, b, theta, n, n * THETA_SPACE // theta, true))
    got = [tuple(r) for r in con.execute(_oracle("op_theta_sketch")).fetchall()]
    assert got == want
    for _a, _b, theta, n, est, true in got:
        assert 0 < theta <= THETA_SPACE and n <= THETA_K
        # the sketch estimate is within 4 std-errs of truth here
        # (relative error ~ 1/sqrt(k) for theta sketches)
        if true > 20:
            assert abs(est - true) <= true  # coarse sanity at tiny sf


def test_word_burstiness_pure_python():
    import re as _re

    con = _con("documents")
    from dblab_ece_trino_spark.operators.text import BURST_TOPK

    docs = con.execute("SELECT doc_id, lower(text) FROM documents").fetchall()
    nd = len(docs)
    per: dict = {}
    for _d, t in docs:
        seen: dict = {}
        for w in _re.findall("[a-z]+", t):
            seen[w] = seen.get(w, 0) + 1
        for w, c in seen.items():
            n, tot, ss = per.setdefault(w, [0, 0, 0])
            per[w] = [n + 1, tot + c, ss + c * c]
    top = sorted(per.items(), key=lambda kv: (-kv[1][1], kv[0]))[:BURST_TOPK]
    want = [
        (w, n, tot, ss, 1000000 * (nd * ss - tot * tot) // (nd * tot))
        for w, (n, tot, ss) in top
    ]
    got = [tuple(r) for r in con.execute(_oracle("text_word_burstiness")).fetchall()]
    assert got == want
    for _w, n, tot, _ss, vmr in got:
        assert vmr >= 0 and n <= nd and tot >= n


def test_ktruss_pure_python():
    """graph_ktruss oracle vs a pure-Python edge-peeling replay at
    sf0.001, plus truss-subset-of-core structure."""
    con = _con("lineitem")
    from dblab_ece_trino_spark.operators.graph import (
        _PAIRS_CTE,
        KTRUSS_K,
        KTRUSS_ROUNDS,
    )

    edges = {
        (u, v) for u, v in con.execute(
            f"WITH {_PAIRS_CTE} SELECT u, v FROM pairs"
        ).fetchall()
    }
    e = set(edges)
    for _ in range(KTRUSS_ROUNDS):
        sup: dict = {}
        es = e
        adj: dict = {}
        for u, v in es:
            adj.setdefault(u, set()).add(v)
        for a, b in es:
            for c in adj.get(b, set()):
                if (a, c) in es:
                    for ed in ((a, b), (b, c), (a, c)):
                        sup[ed] = sup.get(ed, 0) + 1
        e = {ed for ed in es if sup.get(ed, 0) >= KTRUSS_K - 2}
    deg: dict = {}
    for u, v in e:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    want = sorted(deg.items())
    got = [tuple(r) for r in con.execute(_oracle("graph_ktruss")).fetchall()]
    assert got == want
    # every truss edge endpoint has truss degree >= k-1 after
    # convergence; at fixed rounds we assert the weaker peel-invariant
    # that the surviving edge set only shrank
    assert e <= edges
