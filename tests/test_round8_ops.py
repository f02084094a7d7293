"""Round-8 operators: independent-recompute checks.

Each test verifies the Spark result against a SEPARATE pure-Python
implementation written directly from the operator's definition (not
from the Spark code), on top of the DuckDB oracle parity that
tests/test_correctness.py already runs for every registered entry.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- BPE
def _apply_merge(syms: list, a: str, b: str) -> list:
    """Reference greedy non-overlapping left-to-right pass (BPE spec)."""
    out: list = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _ref_encode(w: str, merges) -> list:
    syms = list(w)
    for a, b in merges:
        syms = _apply_merge(syms, a, b)
    return syms


def test_bpe_merge_table_is_well_formed():
    """Every multi-char operand of merge i must be the output of a merge
    j < i — the property that makes one in-order greedy pass per merge
    equivalent to the rank-priority fixpoint loop."""
    from dblab_ece_trino_spark.operators.text import BPE_MERGES

    produced: set = set()
    for a, b in BPE_MERGES:
        for operand in (a, b):
            assert len(operand) == 1 or operand in produced, (
                f"operand {operand!r} used before being produced"
            )
        produced.add(a + b)
    # Second half of the precondition: no LATER merge may produce a
    # string equal to an earlier merge's operand (or left symbol) —
    # otherwise pass j could create new occurrences of pair i < j that
    # the single in-order pass for i already missed, breaking the
    # fold ≡ rank-priority-fixpoint equivalence the encoder relies on.
    for j, (aj, bj) in enumerate(BPE_MERGES):
        product = aj + bj
        for i, (ai, bi) in enumerate(BPE_MERGES[:j]):
            assert product not in (ai, bi), (
                f"merge {j} produces {product!r}, an operand of merge {i}"
            )


def test_bpe_merge_table_matches_deterministic_trainer():
    """Re-derive the fixed table: greedy pair-count argmax (ties broken
    lexicographically) over the sf0.01 word-frequency corpus must
    reproduce BPE_MERGES exactly."""
    import duckdb

    from dblab_ece_trino_spark.operators.text import BPE_MERGES

    con = duckdb.connect()
    texts = con.execute(
        "SELECT text FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).df()["text"]
    con.close()
    wf: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                wf[w] += 1
    vocab = {w: list(w) for w in wf}
    learned = []
    for _ in range(len(BPE_MERGES)):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        pair = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        learned.append(pair)
        vocab = {w: _apply_merge(s, *pair) for w, s in vocab.items()}
    assert learned == list(BPE_MERGES)


def test_bpe_fold_expr_matches_reference_encoder(spark):
    """The nested Spark fold expression vs the pure-Python reference on
    adversarial words: a==b runs (odd/even lengths), multi-char-operand
    merges, merge-order interactions, single chars."""
    from pyspark.sql import functions as F

    from dblab_ece_trino_spark.operators.text import BPE_MERGES, bpe_token_expr

    words = [
        "a", "rr", "rrr", "rrrr", "rrrrr",          # (a==b)-style runs
        "erer", "ererer", "merer", "mermer",        # multi-char operands
        "part", "spark", "customer", "window",      # corpus words
        "pat", "par", "parpar", "atat", "stst",
        "xyz", "q", "lulu", "ararar",
    ]
    merges = [("r", "r")] + list(BPE_MERGES)
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: (list(r["toks"]), r["n"])
        for r in df.select(
            "w",
            F.expr(bpe_token_expr("w", merges)).alias("toks"),
            F.expr(f"size({bpe_token_expr('w', merges)})").alias("n"),
        ).collect()
    }
    for w in words:
        ref = _ref_encode(w, merges)
        assert got[w] == (ref, len(ref)), (w, got[w], ref)


def test_bpe_encode_counts_against_reference(spark):
    """Full per-doc token counts at sf0.001 vs encoding every word of
    every document with the reference encoder."""
    import duckdb

    from dblab_ece_trino_spark.entrypoints import build_queries
    from dblab_ece_trino_spark.operators.text import BPE_MERGES

    out = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_bpe_tokens"])
        for r in build_queries()["llm_bpe_encode"](spark, SF).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    con.close()
    assert len(out) == len(docs)
    for did, text in zip(docs["doc_id"], docs["text"]):
        ws = [w for w in re.split(r"\s+", text.strip().lower()) if w]
        want = (
            len(ws),
            sum(len(w) for w in ws),
            sum(len(_ref_encode(w, BPE_MERGES)) for w in ws),
        )
        assert out[int(did)] == want, (did, out[int(did)], want)
        # BPE must actually compress: fewer tokens than chars, at least
        # as many as words
        assert want[0] <= want[2] < want[1]
