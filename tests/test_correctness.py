"""Driver-parity correctness gate: every queries() entry vs its oracle.

Runs at sf0.01 (the driver's t2 scale).  Entries without an oracle get a
rows-materialize smoke check here; their semantics are covered by focused
property tests in the per-operator test modules.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_MED, assert_matches_oracle, duck_for


def _entries():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return qs, oracles


QUERIES, ORACLES = _entries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn = QUERIES[name]
    df = fn(spark, SF_MED)
    oracle = ORACLES.get(name)
    if oracle is None:
        rows = df.collect()
        assert rows is not None  # rows-only check (driver's weaker gate)
    else:
        assert_matches_oracle(df, duck_for(duck, SF_MED), oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
