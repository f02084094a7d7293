"""SQL path ≡ DataFrame path for every reference query (SURVEY §7.3)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, normalized_rows


@pytest.mark.parametrize("name", ["q001", "q002", "q003", "q004", "q005", "tpch_q17"])
def test_sql_and_dataframe_paths_agree(name, spark):
    from dblab_ece_trino_spark import queries_df
    from dblab_ece_trino_spark.entrypoints import build_queries

    sql_df = build_queries()[name](spark, SF_SMALL)
    df_df = getattr(queries_df, f"{name}_df")(spark, SF_SMALL)
    assert [c.lower() for c in sql_df.columns] == [
        c.lower() for c in df_df.columns
    ]
    a = normalized_rows(sql_df.columns, [tuple(r) for r in sql_df.collect()])
    b = normalized_rows(df_df.columns, [tuple(r) for r in df_df.collect()])
    assert a == b, f"{name}: SQL and DataFrame paths disagree"
