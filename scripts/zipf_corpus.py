#!/usr/bin/env python3
"""Synthesize a representative-vocabulary (Zipfian) documents corpus.

The driver's synthetic documents table draws every word from a 31-word
alphabet, which makes char-9-gram prefixes collide with ~2% of the
corpus and turns the exact similarity joins into near-worst-case
fixtures (dedup_prefix_filter measured 18.7s at sf0.1 — 43% of the
round-5 bench headline — purely from fixture shape).  Real web corpora
have Zipf-distributed vocabularies in the tens of thousands of types,
whose rarest-decile shingles are near-unique.  This script generates a
same-shape corpus (5000 docs, ~300 chars, same schema) over a 30k-type
Zipf(s=1.1) vocabulary with a planted 5% near-duplicate rate, so
SCALE.md can report the similarity joins' crossover on a corpus whose
shape matches the production claim.  Deterministic (fixed numpy seed);
writes /tmp/zipf_corpus/documents.parquet.

Usage: python3 scripts/zipf_corpus.py [n_docs=5000] [out_dir=/tmp/zipf_corpus]
"""

from __future__ import annotations

import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/zipf_corpus"
VOCAB = 30_000
ZIPF_S = 1.1
TARGET_CHARS = 300
DUP_RATE = 0.05  # fraction of docs that are a near-copy of an earlier doc


def main() -> None:
    rng = np.random.default_rng(20260814)
    letters = np.array(list(string.ascii_lowercase))
    # vocabulary: 3-9 letter words, unique
    vocab: list[str] = []
    seen = set()
    while len(vocab) < VOCAB:
        k = int(rng.integers(3, 10))
        w = "".join(rng.choice(letters, size=k))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    vocab_arr = np.array(vocab)
    # Zipf rank-frequency: p(r) ~ 1/r^s over the vocab
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = ranks**-ZIPF_S
    probs /= probs.sum()

    texts: list[str] = []
    sources = np.array(["web", "news", "forum", "code"])
    rows_src: list[str] = []
    if N_DOCS > 20_000:
        # Vectorized path for the x100-scale corpus: per-doc word draws
        # via one searchsorted over the Zipf CDF (the scalar path's
        # per-word rng.choice(p=...) is O(V) per draw — infeasible at
        # 500k docs).  Same distribution family, deterministic under
        # the same seed; a different stream than the scalar path, so
        # small-corpus rows measured earlier stay reproducible there.
        cdf = np.cumsum(probs)
        words_per_doc = TARGET_CHARS // 7 + 1  # ~avg word+space
        idx = np.searchsorted(cdf, rng.random((N_DOCS, words_per_doc)))
        word_matrix = vocab_arr[np.clip(idx, 0, VOCAB - 1)]
        texts = [" ".join(row) for row in word_matrix]
        dup_mask = rng.random(N_DOCS) < DUP_RATE
        dup_mask[0] = False
        for i in np.nonzero(dup_mask)[0]:
            base = texts[int(rng.integers(0, i))].split()
            n_mut = max(1, len(base) // 20)
            for _ in range(n_mut):
                # clip like the matrix path: float error can leave
                # cdf[-1] fractionally below 1.0, and an unlucky draw
                # would then index vocab_arr[VOCAB]
                base[int(rng.integers(0, len(base)))] = str(
                    vocab_arr[min(int(np.searchsorted(cdf, rng.random())), VOCAB - 1)]
                )
            texts[i] = " ".join(base)
        rows_src = [str(s) for s in sources[rng.integers(0, len(sources), N_DOCS)]]
        _write(texts, rows_src)
        return
    for i in range(N_DOCS):
        if i > 0 and rng.random() < DUP_RATE:
            # near-dup: clone an earlier doc, mutate ~5% of its words
            base = texts[int(rng.integers(0, i))].split()
            n_mut = max(1, len(base) // 20)
            for _ in range(n_mut):
                base[int(rng.integers(0, len(base)))] = str(
                    vocab_arr[int(rng.choice(VOCAB, p=probs))]
                )
            texts.append(" ".join(base))
        else:
            words = []
            total = 0
            while total < TARGET_CHARS:
                w = str(vocab_arr[int(rng.choice(VOCAB, p=probs))])
                words.append(w)
                total += len(w) + 1
            texts.append(" ".join(words))
        rows_src.append(str(sources[int(rng.integers(0, len(sources)))]))
    _write(texts, rows_src)


def _write(texts: list[str], rows_src: list[str]) -> None:
    os.makedirs(OUT, exist_ok=True)
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(rows_src),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(OUT, "documents.parquet"))
    print(
        f"# wrote {n} docs, vocab={VOCAB} zipf(s={ZIPF_S}), "
        f"dup_rate={DUP_RATE} -> {OUT}/documents.parquet"
    )


if __name__ == "__main__":
    main()
