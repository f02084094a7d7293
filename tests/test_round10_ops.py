"""Round-10 operator tests: independent re-derivations and hand-built
vectors for the new graded entries (the round-6..9 discipline — every
new op gets a pure-Python or hand-vector pin in addition to its DuckDB
oracle)."""

from __future__ import annotations

import pytest


def test_gopher_repetition_matches_pure_python():
    """The Gopher character-coverage oracle must equal an independent
    pure-Python evaluator (dict n-gram counting, explicit coverage
    arithmetic) at sf0.001."""
    import re

    import duckdb

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(oracle_queries()["llm_gopher_repetition"]).fetchall()
    }

    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    assert len(got) == len(docs) > 0
    for doc_id, text in docs:
        words = re.split(r"\s+", text.strip())
        L = len(text)
        vals = {}
        for n in (2, 3, 4, 5, 6):
            counts: dict = {}
            for i in range(max(len(words) - n + 1, 1)):
                gram = " ".join(words[i : i + n])
                counts[gram] = counts.get(gram, 0) + 1
            # top by (count, coverage) lexicographic max
            topcov = max((c, c * len(g)) for g, c in counts.items())[1]
            dupcov = sum(c * len(g) for g, c in counts.items() if c >= 2)
            vals[n] = (topcov * 1_000_000 // L, dupcov * 1_000_000 // L)
        want = (
            L,
            vals[2][0], vals[3][0], vals[4][0],
            vals[5][1], vals[6][1],
            vals[2][0] <= 200000 and vals[3][0] <= 180000
            and vals[4][0] <= 160000 and vals[5][1] <= 150000
            and vals[6][1] <= 140000,
        )
        assert tuple(got[doc_id]) == want, f"doc {doc_id} diverges"


def test_gopher_repetition_flags_degenerate_doc(spark):
    """A doc that is one phrase repeated must be flagged; a diverse doc
    must pass (Gopher Table A1 thresholds)."""
    from dblab_ece_trino_spark.operators.llmprep import gopher_repetition

    rows = [
        (1, "spam ham " * 50),  # top 2-gram covers ~everything
        (2, " ".join(f"w{i}" for i in range(100))),  # all distinct
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_repetition(df).collect()}
    assert not out[1].gopher_clean and out[1].top2_ppm > 800000
    assert out[2].gopher_clean and out[2].dup5_ppm == 0
