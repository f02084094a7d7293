"""Focused checks for the analytics pack beyond the parametric oracle
gate in test_correctness.py: determinism preconditions and plan shape.
"""

from __future__ import annotations

import duckdb

from tests.conftest import SF_MED, duck_for


def test_min_max_by_ordering_keys_unique():
    """op_min_max_by is deterministic only if each nation's extreme
    acctbal is unique (DuckDB's arg_max cannot tiebreak on a struct) —
    pin that precondition at the driver's grading SF."""
    con = duck_for(duckdb.connect(), SF_MED)
    dup = con.execute(
        """
        SELECT count(*) FROM (
          SELECT c_nationkey, c_acctbal, count(*) AS c
          FROM customer GROUP BY 1, 2 HAVING count(*) > 1
        ) t
        JOIN (
          SELECT c_nationkey,
                 max(c_acctbal) AS mx, min(c_acctbal) AS mn
          FROM customer GROUP BY 1
        ) e ON t.c_nationkey = e.c_nationkey
           AND (t.c_acctbal = e.mx OR t.c_acctbal = e.mn)
        """
    ).fetchone()[0]
    assert dup == 0


def test_fuzzy_match_is_blocked_join(spark):
    """The ER join must hash-join on the block key — never a cartesian
    product with a levenshtein residual."""
    from dblab_ece_trino_spark.operators.registry import spark_queries

    df = spark_queries()["op_fuzzy_match"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_hierarchy_walk_depths(spark):
    """Binary-tree parent walk: suppkey k has depth floor(log2(k))."""
    from dblab_ece_trino_spark.operators.registry import spark_queries

    rows = spark_queries()["op_hierarchy_walk"](spark, SF_MED).collect()
    by_key = {r["suppkey"]: r for r in rows}
    assert by_key[1]["depth_to_root"] == 0
    assert by_key[2]["depth_to_root"] == 1
    assert by_key[3]["depth_to_root"] == 1
    assert by_key[99]["depth_to_root"] == 6  # floor(log2(99))
    # chain length is depth + 1 (the node itself)
    assert all(
        r["chain_len"] == r["depth_to_root"] + 1 for r in rows
    )
