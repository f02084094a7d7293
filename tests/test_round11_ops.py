"""Round-11 operator tests: independent pure-Python / spec
re-derivations for every new graded entry, hand-built fixtures for the
edge semantics, and the cross-entry reconciliations the round's
verdict asked for."""
from __future__ import annotations

import pytest


def _dup_span_reference(docs: dict, n: int = 8):
    """Independent pure-Python exact-substring dedup (Lee et al. removal
    semantics): anchors = positions whose word n-gram occurs in >= 2
    distinct docs; merge anchor islands (gap > n breaks); cut the
    covered intervals."""
    import re

    toks = {d: re.split(r"\s+", t.strip()) for d, t in docs.items()}
    occ: dict = {}
    for d, ws in toks.items():
        for i in range(len(ws) - n + 1):
            occ.setdefault(" ".join(ws[i : i + n]), set()).add(d)
    dup_grams = {g for g, ds in occ.items() if len(ds) >= 2}
    out = {}
    for d, ws in toks.items():
        anchors = [
            i
            for i in range(max(len(ws) - n + 1, 0))
            if " ".join(ws[i : i + n]) in dup_grams
        ]
        # gaps-and-islands: a new island starts when the anchor gap
        # exceeds n (same rule as the engine/oracle window pass)
        ivs = []
        prev = None
        for p in anchors:
            if prev is not None and p - prev <= n:
                ivs[-1] = (ivs[-1][0], p + n)
            else:
                ivs.append((p, p + n))
            prev = p
        covered = set()
        for s, e in ivs:
            covered.update(range(s, e))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        out[d] = (
            len(ws),
            len(kept),
            len(ws) - len(kept),
            " ".join(kept),
        )
    return out


def test_dup_span_removal_matches_pure_python(spark):
    """Engine removal must equal the independent evaluator over a
    hand corpus with known shared spans (prefix share, mid-document
    share, full-document clone, and a unique doc)."""
    from dblab_ece_trino_spark.operators.llmprep import dup_span_removal

    shared = "a b c d e f g h i j"          # 10 tokens shared verbatim
    mid = "k l m n o p q r"                 # 8 tokens shared mid-doc
    docs = {
        0: shared + " unique0 tail0 x0 y0 z0",
        1: shared + " unique1 tail1 x1 y1 z1",
        2: "lead2a lead2b " + mid + " trail2a trail2b",
        3: "lead3a lead3b lead3c " + mid + " trail3a",
        4: "solo4 words4 only4 here4 never4 shared4 at4 all4 ok4",
        5: "clone c1 c2 c3 c4 c5 c6 c7 c8 c9",
        6: "clone c1 c2 c3 c4 c5 c6 c7 c8 c9",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.kept_tokens, r.removed_tokens, r.dedup_text)
        for r in dup_span_removal(df).collect()
    }
    want = _dup_span_reference(docs)
    assert got == want
    # the hand-known outcomes: clones vanish entirely, solo survives
    assert got[5][3] == "" and got[6][3] == ""
    assert got[4][2] == 0 and got[4][3] == docs[4]
    assert got[0][3] == "unique0 tail0 x0 y0 z0"
    assert got[2][1] == 4 and got[2][3] == "lead2a lead2b trail2a trail2b"


def test_dup_span_removal_reconciles_with_coverage(spark):
    """removed_tokens must equal dup_span_coverage's dup_tokens per
    document (the retained-char reconciliation the round-10 verdict
    asked for), at sf0.001."""
    from dblab_ece_trino_spark.operators.llmprep import (
        dup_span_coverage,
        dup_span_removal,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cov = {
        r.doc_id: r.dup_tokens for r in dup_span_coverage(docs).collect()
    }
    rem = dup_span_removal(docs).collect()
    assert len(rem) == len(cov) > 0
    for r in rem:
        assert r.removed_tokens == cov[r.doc_id], r.doc_id
        assert r.kept_tokens + r.removed_tokens == r.n_tokens
        # the emitted text really has kept_tokens tokens
        n_words = len(r.dedup_text.split()) if r.dedup_text else 0
        assert n_words == r.kept_tokens


def test_deletion_vectors_matches_pure_python():
    """The wh_deletion_vectors oracle must equal an independent
    pure-Python evaluator (hashlib md5 bucketing, explicit position
    ranks, run-length scan) at sf0.001."""
    import hashlib
    from decimal import Decimal

    import duckdb

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet')"
    )
    got = [
        tuple(r)
        for r in con.execute(oracle_queries()["wh_deletion_vectors"]).fetchall()
    ]

    def bucket(k, seed):
        h = hashlib.md5((seed + str(k)).encode()).hexdigest()
        return int(h[:2], 16)

    rows = con.execute(
        "SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) FROM orders"
    ).fetchall()
    files: dict = {}
    for k, price in rows:
        files.setdefault(bucket(k, "dv-file"), []).append((k, price))
    want = []
    for fid in sorted(files):
        members = sorted(files[fid])
        dels = [
            pos for pos, (k, _p) in enumerate(members)
            if bucket(k, "dv-del") < 32
        ]
        live = [
            p for pos, (k, p) in enumerate(members)
            if bucket(k, "dv-del") >= 32
        ]
        runs = []
        for pos in dels:
            if runs and pos == runs[-1][1]:
                runs[-1] = (runs[-1][0], pos + 1)
            else:
                runs.append((pos, pos + 1))
        cents = int(sum(live, Decimal(0)) * 100)
        want.append(
            (fid, len(members), len(dels), len(live), cents,
             len(runs), max((e - s for s, e in runs), default=0))
        )
    assert got == want
    assert sum(r[2] for r in got) > 0  # deletes actually happened


def test_link_prediction_hand_graph(spark):
    """RA link prediction on a hand graph: path a-b-c-d plus hub h
    connected to a, c, d.  Non-edges get Σ floor(1e6/deg(z)) over
    common neighbors; existing edges are excluded."""
    from dblab_ece_trino_spark.operators.graph import link_prediction_ra

    edges = [(1, 2), (2, 3), (3, 4), (5, 1), (5, 3), (5, 4)]
    pairs = spark.createDataFrame(edges, "u long, v long")
    got = {
        (r.a, r.b): (r.n_common, r.ra_e6)
        for r in link_prediction_ra(pairs, top_n=100).collect()
    }
    # adjacency: 1:{2,5} 2:{1,3} 3:{2,4,5} 4:{3,5} 5:{1,3,4}
    deg = {1: 2, 2: 2, 3: 3, 4: 2, 5: 3}
    import itertools

    adj = {n: set() for n in deg}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want = {}
    for a, b in itertools.combinations(sorted(deg), 2):
        if b in adj[a]:
            continue  # existing edge — excluded
        common = adj[a] & adj[b]
        if not common:
            continue  # no wedge generates the pair
        want[(a, b)] = (
            len(common),
            sum(1_000_000 // deg[z] for z in common),
        )
    assert got == want
    # the excluded-edge property, explicitly
    assert (1, 2) not in got and (3, 5) not in got
