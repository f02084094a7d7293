"""The reference's literal query files against the generator source.

Mirrors the reference's own test evidence (SURVEY §5): five captured
queries, each run at two cluster sizes with identical results
(results/<q>/workers-{1,5}/).  Here the literal SQL text executes
through engine.sql() at generator sf=1 and the invariance axis is
shuffle-partitions 1 vs the session default.
"""

from __future__ import annotations

import json
import os

import pytest

from dblab_ece_trino_spark.bench.reference_parity import (
    EXPECTED_ROWS,
    REFERENCE_SQL,
)


def _rowset(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("name", sorted(REFERENCE_SQL))
def test_literal_reference_query_runs_with_pinned_cardinality(name, spark):
    from dblab_ece_trino_spark.entrypoints import build_queries

    df = build_queries()[name](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == EXPECTED_ROWS[name]
    if name in ("ref_q001", "ref_q002"):
        assert rows[0].sales is not None and float(rows[0].sales) > 0
    if name == "ref_q005":
        assert rows[0][0] > 0  # the chained EXCEPT leaves a real remainder


@pytest.mark.parametrize("name", sorted(REFERENCE_SQL))
def test_parallel_1_equals_parallel_default(name, spark):
    """The workers-1 ≡ workers-5 analog, per query, as row multisets."""
    from dblab_ece_trino_spark.entrypoints import build_queries

    fn = build_queries()[name]
    default = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        r1 = _rowset(fn(spark, "/root/testdata/sf0.001"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    rn = _rowset(fn(spark, "/root/testdata/sf0.001"))
    assert r1 == rn


def test_summary_entry_reports_all_green(spark):
    from dblab_ece_trino_spark.entrypoints import build_queries

    out = build_queries()["reference_sql_parity"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [(r.query, r.n_rows, r.modes_agree) for r in out] == [
        (n, EXPECTED_ROWS[n], True) for n in sorted(REFERENCE_SQL)
    ]


def test_artifact_tree_matches_reference_layout(spark, tmp_path):
    """run_benchmark writes the reference's per-query capture set
    (results/explain/time/query.json per mode) for the literal queries,
    and results.txt is byte-identical across modes — the reference's
    strongest invariance claim, which holds here because every literal
    query pins a total order or is a single aggregate row (q003's 8
    group counts are all distinct at sf1)."""
    from dblab_ece_trino_spark.bench.harness import run_benchmark
    from dblab_ece_trino_spark.bench.reference_parity import _ref_engine

    eng = _ref_engine(spark, "/root/testdata/sf0.001")
    # Precondition for the q003 byte-identity claim below: its ORDER BY
    # key (orders DESC) must be tie-free — LIMIT 20 with tied counts
    # would make the cross-mode diff data-dependent flaky instead of
    # failing with a cause.  Assert it so a generator tweak that
    # introduces a tie fails HERE, loudly.
    q3_counts = [
        r.orders
        for r in eng.sql(REFERENCE_SQL["ref_q003"], name="ref_q003").collect()
    ]
    assert len(set(q3_counts)) == len(q3_counts), (
        "ref_q003 ORDER BY key has ties at this sf; the byte-identity "
        f"artifact comparison is no longer well-defined: {q3_counts}"
    )
    names = sorted(REFERENCE_SQL)
    timings = run_benchmark(
        eng,
        "/root/testdata/sf0.001",
        str(tmp_path),
        query_names=names,
        modes={"parallel-1": 1, "parallel-8": 8},
    )
    for name in names:
        captures = {}
        for mode in ("parallel-1", "parallel-8"):
            d = tmp_path / name / mode
            for f in ("results.txt", "explain.txt", "time.txt", "query.json"):
                assert (d / f).exists(), f"{name}/{mode}/{f} missing"
            stats = json.loads((d / "query.json").read_text())
            assert stats["rowCount"] == EXPECTED_ROWS[name]
            captures[mode] = (d / "results.txt").read_text()
            assert timings[name][mode] >= 0
        assert captures["parallel-1"] == captures["parallel-8"]


def test_literal_text_matches_reference_files_when_present():
    """When the reference checkout is available, the embedded SQL must be
    token-identical to its query files (whitespace/semicolon-insensitive)
    so the parity claim is about the reference's actual text."""
    ref_dir = "/root/reference/queries"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout not present")
    for name, text in REFERENCE_SQL.items():
        path = os.path.join(ref_dir, name.replace("ref_", "") + ".sql")
        want = open(path).read().replace(";", " ")
        assert text.split() == want.split(), f"{name} diverges from {path}"
