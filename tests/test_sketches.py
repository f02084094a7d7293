"""Sketch operators: structural invariants beyond the parametric oracle
gate (Count-Min's domination inequality, Bloom's no-false-negative
guarantee) — checked over EVERY key, not just the graded top-10 slice.

DuckDB executes the checks; the oracle-parity gate in
test_correctness.py pins Spark to the identical SQL, so an invariant
holding on the oracle side holds for the engine output too.
"""

from __future__ import annotations

import duckdb

from tests.conftest import SF_MED, duck_for
from dblab_ece_trino_spark.operators.sketches import (
    BLOOM_K,
    BLOOM_M,
    CMS_DEPTH,
    CMS_WIDTH,
    hexint_digits_sql,
    hexint_sql,
)


def test_count_min_estimate_dominates_truth_for_every_key():
    """CM's structural guarantee: est(k) >= true(k) for ALL keys, under
    ANY hash family — a single violated key means the sketch build or
    probe is wrong (not a tuning issue)."""
    cur = duck_for(duckdb.connect(), SF_MED)
    span = " ".join(
        f"WHEN {j} THEN {hexint_digits_sql('__h', 4, 1 + 4 * j)}"
        f" % {CMS_WIDTH}"
        for j in range(CMS_DEPTH)
    )
    rows = ", ".join(f"({j})" for j in range(CMS_DEPTH))
    bad = cur.execute(
        f"""
        WITH hashed AS (
          SELECT user_id, j, CASE j {span} END AS bucket
          FROM (SELECT e.user_id, j,
                       md5(concat('cms:', CAST(e.user_id AS STRING))) AS __h
                FROM events e CROSS JOIN (VALUES {rows}) r(j)) t
        ),
        sketch AS (
          SELECT j, bucket, count(*) AS cnt FROM hashed GROUP BY j, bucket
        ),
        probe AS (
          SELECT h.user_id, min(s.cnt) AS est
          FROM (SELECT DISTINCT user_id, j, bucket FROM hashed) h
          JOIN sketch s ON s.j = h.j AND s.bucket = h.bucket
          GROUP BY h.user_id
        ),
        truth AS (
          SELECT user_id, count(*) AS tc FROM events GROUP BY user_id
        )
        SELECT count(*) FROM probe p JOIN truth t USING (user_id)
        WHERE p.est < t.tc
        """
    ).fetchone()[0]
    assert bad == 0


def test_bloom_no_false_negative_any_threshold():
    """Every build-side key must probe as 'maybe present' (all K bits
    set) — checked under a different threshold than the graded entry so
    the guarantee isn't an artifact of one build set."""
    cur = duck_for(duckdb.connect(), SF_MED)
    seed = "concat('bloom-', CAST(i AS STRING), ':')"
    pos = hexint_sql("b.o_custkey", seed, 4) + f" % {BLOOM_M}"
    rows = ", ".join(f"({i})" for i in range(BLOOM_K))
    missing = cur.execute(
        f"""
        WITH build AS (
          SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 350000
        ),
        bits AS (
          SELECT DISTINCT {pos} AS p
          FROM build b CROSS JOIN (VALUES {rows}) r(i)
        ),
        probe AS (
          SELECT b.o_custkey, count(x.p) AS hits
          FROM build b
          CROSS JOIN (VALUES {rows}) r(i)
          LEFT JOIN bits x ON x.p = {pos}
          GROUP BY b.o_custkey
        )
        SELECT count(*) FROM probe WHERE hits < {BLOOM_K}
        """
    ).fetchone()[0]
    assert missing == 0


def test_sequence_fsm_equals_regex_on_random_strings():
    """The v/c/p FSM used by the streaming pattern matcher is exactly
    the non-overlapping leftmost regex scan the batch entry runs —
    property-checked over random journey strings."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def fsm(seq: str) -> int:
        saw_v, n = False, 0
        for ch in seq:
            if ch == "v":
                saw_v = True
            elif ch == "p":
                if saw_v:
                    n += 1
                saw_v = False
        return n

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="vcp", max_size=40))
    def check(seq):
        assert fsm(seq) == len(re.findall("vc*p", seq))

    check()


def test_kmv_merge_identity_error_bound_and_exact_branch():
    """KMV structural checks over the exact graded SQL text: the
    per-shard-partial merge must reproduce the direct global k-th min
    (identity, not approximation), the estimate must land within 4
    standard errors (4/sqrt(k)) of the true distinct count, and a
    keyspace smaller than k must take the exact branch (est == truth,
    k_got < k)."""
    import math

    import __spark_entry__ as entry
    from dblab_ece_trino_spark.operators.sketches import KMV_K

    sql = entry.oracle_sql()["op_kmv_distinct"]

    cur = duck_for(duckdb.connect(), SF_MED)
    k, k_got, _kth, est, exact, merged_ok = cur.execute(sql).fetchone()
    assert (k, k_got, merged_ok) == (KMV_K, KMV_K, 1)
    assert abs(est - exact) / exact <= 4 / math.sqrt(KMV_K), (est, exact)

    # exact branch: 100 distinct keys < k=256
    tiny = duckdb.connect()
    tiny.execute(
        "CREATE VIEW lineitem AS "
        "SELECT (i % 100) + 1 AS l_orderkey FROM range(1000) t(i)"
    )
    k, k_got, kth, est, exact, merged_ok = tiny.execute(sql).fetchone()
    assert (k_got, exact, merged_ok) == (100, 100, 1)
    assert est == 100.0


def test_kmv_spark_exact_branch_and_parity_with_oracle(spark, tmp_path):
    """Spark-side twin of the DuckDB tiny-keyspace check: point the
    entry at a directory whose lineitem has 100 distinct keys (< k) and
    the DataFrame implementation must take the exact branch with the
    merge identity intact — proving the branch logic lives in BOTH
    implementations, not just the oracle text."""
    import __spark_entry__ as entry
    from dblab_ece_trino_spark.operators.sketches import KMV_K

    spark.range(1000).selectExpr("(id % 100) + 1 AS l_orderkey").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    row = (
        entry.queries()["op_kmv_distinct"](spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    assert row["k"] == KMV_K
    assert (row["k_got"], row["exact_distinct"]) == (100, 100)
    assert row["est_kmv"] == 100.0
    assert row["merged_equals_direct"] == 1
